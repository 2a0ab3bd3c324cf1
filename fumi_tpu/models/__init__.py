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
