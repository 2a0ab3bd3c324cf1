"""Minimal torchmeta shim for running the reference under test.

torchmeta 1.7.0 is not installed in this image; the reference imports it
for (a) functional modules + one differentiable SGD step and (b) the
episodic data machinery. This package reproduces exactly the API subset
the reference uses (grep-verified over /root/reference/fumi):

- ``torchmeta.modules``: MetaModule, MetaLinear, MetaSequential
  (maml.py:8, fumi.py:5)
- ``torchmeta.utils.gradient_based``: gradient_update_parameters
  (maml.py:9, fumi.py:6)
- ``torchmeta.utils.data``: Dataset, ClassDataset, CombinationMetaDataset,
  BatchMetaDataLoader (data.py:17-19)
- ``torchmeta.transforms``: Categorical, ClassSplitter (data.py:16)
- ``torchmeta.datasets.helpers`` (data.py:13; CUB only — stubbed)

Numerics-bearing pieces (modules + gradient_update_parameters) follow
torchmeta's published semantics to the letter. The data machinery is
faithful in DISTRIBUTION (random N-way class combinations, seeded
per-class shuffled support/query splits, class-major episode layout,
Categorical 0..N-1 remapping, fail-loud on classes thinner than K+Q)
but does not replicate torchmeta's exact RNG streams — the oracle
comparison is statistical (final metrics), not per-episode.
"""

from . import modules, transforms, utils, datasets  # noqa: F401
