"""torchmeta.datasets.helpers shim (imported at data.py:13; only the CUB
path uses it, which the oracle harness does not exercise — CUB needs a
download the reference performs at runtime)."""


def cub(*args, **kwargs):
    raise NotImplementedError("oracle shim: CUB requires a dataset download")


def CUB(*args, **kwargs):
    raise NotImplementedError("oracle shim: CUB requires a dataset download")
