from fumi_tpu.models import am3, clip, fumi, mlp, text_encoders  # noqa: F401

# Raw-image backbones (the reference's TODO, am3.py:44-46): both expose
# init/apply/backbone/feature_dim with the same contract, so every
# consumer (MAML engine, AM3 encoder, serving) dispatches through here.
RAW_IMAGE_ENCODERS = ("conv4", "resnet12")


def raw_image_net(kind: str):
    if kind == "conv4":
        from fumi_tpu.models import conv4 as net
    elif kind == "resnet12":
        from fumi_tpu.models import resnet12 as net
    else:
        raise NameError(f"{kind} is not a raw-image encoder "
                        f"(one of {RAW_IMAGE_ENCODERS})")
    return net


def headless_backbone_init(kind: str, key, im_size: int, im_channels: int,
                           resnet12_channels=None):
    """Init a raw backbone WITHOUT its classification head.

    The one definition of the kind dispatch (resnet12 width kwarg,
    feature-dim rule, head removal) shared by every consumer that attaches
    its own projection/generated head — AM3, FuMI, ProtoNet.
    Returns ``(backbone_params, feature_dim)``.
    """
    net = raw_image_net(kind)
    if kind == "resnet12" and resnet12_channels is not None:
        params = dict(net.init(key, im_size, im_channels, n_way=1,
                               channels=tuple(resnet12_channels)))
        fdim = net.feature_dim(im_size, tuple(resnet12_channels))
    else:
        params = dict(net.init(key, im_size, im_channels, n_way=1))
        fdim = net.feature_dim(im_size)
    params.pop("head")
    return params, fdim
