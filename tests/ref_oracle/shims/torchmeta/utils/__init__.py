from . import data, gradient_based  # noqa: F401
