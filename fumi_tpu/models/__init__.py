from fumi_tpu.models import am3, clip, fumi, mlp, text_encoders  # noqa: F401
