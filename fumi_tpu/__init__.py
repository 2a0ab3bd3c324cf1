"""fumi-tpu: a TPU-native (JAX/XLA/Pallas/pjit) few-shot multimodal framework.

A ground-up rebuild of the capabilities of the FuMI reference framework
("Multi-modal Fusion by Meta-Initialisation", arXiv:2210.04843): episodic
N-way K-shot training and evaluation of multimodal few-shot classifiers
(AM3, MAML, FuMI, CLIP) on iNat-Anim — redesigned for TPU:

- whole meta-batches (episode sampling + inner-loop adaptation + outer step)
  compile to a single XLA program,
- second-order meta-gradients via ``jax.grad`` through ``lax.scan``,
- episode data-parallelism over a ``jax.sharding.Mesh`` with ICI collectives,
- device-resident embedding tables (hosts ship only int32 indices),
- Pallas kernels for the hot episodic math.

Reference behavior citations use ``<file>:<line>`` pointing into the
upstream repo (s-a-malik/fumi).
"""

__version__ = "0.1.0"

from fumi_tpu.core.config import Config  # noqa: F401
from fumi_tpu.core.episode import Episode  # noqa: F401


def __getattr__(name):
    # lazy: serve pulls in the model stack
    if name == "FewShotClassifier":
        from fumi_tpu.serve import FewShotClassifier
        return FewShotClassifier
    raise AttributeError(name)
