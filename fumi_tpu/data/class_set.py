"""ClassSet — the device-ready form of a meta-split.

The reference reaches data through a chain of torchmeta objects that slice an
HDF5 file per episode in dataloader workers (ref: fumi/dataset/data.py:
294-581, SURVEY §3.5). The TPU-native design flattens that into three dense
tables per split, loaded once and kept device-resident:

- an image-embedding table shared by all splits (rows keyed by global image
  id, exactly like the reference's h5 ``['images']`` dataset,
  ref: data.py:429-430),
- a padded per-class image-id table ``(C, max_count)`` + counts,
- a per-class text-feature table: precomputed embeddings ``(C, E)`` or
  padded token ids ``(C, T)``.

Episode sampling then becomes pure index math + gathers — either host-side
(numpy) or inside the jitted step (see fumi_tpu/data/sampler.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ClassSet:
    """One meta-split's classes, padded to rectangular tables."""

    categories: np.ndarray  # (C,) global category ids (split order)
    class_image_rows: np.ndarray  # (C, max_count) int32 rows into image table
    class_counts: np.ndarray  # (C,) int32 images per class
    text_features: np.ndarray  # (C, E) float32 or (C, T) int32 tokens
    text_mask: Optional[np.ndarray] = None  # (C, T) for token text
    descriptions: Optional[list] = None  # raw description strings

    @property
    def num_classes(self) -> int:
        return int(self.categories.shape[0])

    @property
    def max_count(self) -> int:
        return int(self.class_image_rows.shape[1])

    @property
    def text_is_tokens(self) -> bool:
        return np.issubdtype(self.text_features.dtype, np.integer)

    def validate_episode(self, num_shots: int, num_query: int) -> None:
        """Fail fast if any class is too small for K support + Q query
        (torchmeta's ClassSplitter would raise; the device sampler would
        silently sample with replacement)."""
        need = num_shots + num_query
        too_small = self.class_counts < need
        if np.any(too_small):
            raise ValueError(
                f"{int(too_small.sum())}/{self.num_classes} classes have "
                f"fewer than {need} images (min "
                f"{int(self.class_counts.min())})")


def build_class_tables(categories: np.ndarray,
                       category_to_image_ids: dict) -> tuple:
    """Pad per-class image-id lists into (C, max_count) + counts."""
    counts = np.array([len(category_to_image_ids[c]) for c in categories],
                      dtype=np.int32)
    max_count = int(counts.max()) if len(counts) else 0
    rows = np.zeros((len(categories), max_count), dtype=np.int32)
    for i, c in enumerate(categories):
        ids = np.asarray(category_to_image_ids[c], dtype=np.int32)
        rows[i, :len(ids)] = ids
        # pad with the first image id; padding slots are never selected by
        # either sampler (masked out / count-bounded)
        if len(ids) and len(ids) < max_count:
            rows[i, len(ids):] = ids[0]
    return rows, counts
