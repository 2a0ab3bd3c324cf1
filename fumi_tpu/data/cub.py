"""CUB dataset support (text-less stub, matching the reference's scope).

The reference wires torchmeta's CUB helper with an empty dictionary and no
text features ("Need to fix to get text as well", ref:
fumi/dataset/data.py:191-217). The TPU-native equivalent consumes a
pre-converted artifact directory:

    <data_dir>/CUB/
      image_embeddings.npy   (num_images, D) float32
      class_image_rows.npz   per-split padded class tables
        {train,val,test}_rows, {train,val,test}_counts,
        {train,val,test}_categories

Conversion from the raw CUB_200_2011 release is a one-off offline step
(images → frozen-encoder embeddings), mirroring how iNat-Anim ships
precomputed resnet embeddings. Text features are zeros (the reference's CUB
path is image-only too).

Documented deviation: the reference's CUB helper sizes val/test query sets
as ``int(100 / num_shots)`` (ref: data.py:204,211) — almost certainly a bug
(every other path uses ``int(100 / num_ways)``, ref: data.py:165,182). This
framework applies the standard ``int(100 / num_ways)`` eval protocol to CUB
as well.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from fumi_tpu.data.class_set import ClassSet


def load_cub(data_dir: str) -> Tuple[Dict[str, ClassSet], np.ndarray,
                                     np.ndarray]:
    """Load converted CUB tables. Returns (splits, image_table, image_ids)."""
    root = os.path.join(data_dir, "CUB")
    emb_path = os.path.join(root, "image_embeddings.npy")
    tab_path = os.path.join(root, "class_image_rows.npz")
    if not (os.path.exists(emb_path) and os.path.exists(tab_path)):
        raise FileNotFoundError(
            f"CUB artifacts not found under {root}. Run the offline "
            "conversion (images -> encoder embeddings -> "
            "image_embeddings.npy + class_image_rows.npz) first.")
    image_table = np.load(emb_path)
    tabs = np.load(tab_path)
    splits = {}
    for split in ("train", "val", "test"):
        rows = tabs[f"{split}_rows"]
        counts = tabs[f"{split}_counts"]
        cats = tabs[f"{split}_categories"]
        splits[split] = ClassSet(
            categories=cats,
            class_image_rows=rows.astype(np.int32),
            class_counts=counts.astype(np.int32),
            # image-only dataset: zero text features (ref CUB has none)
            text_features=np.zeros((len(cats), 1), dtype=np.float32),
            text_mask=None,
            descriptions=["" for _ in cats],
        )
    image_ids = np.arange(image_table.shape[0], dtype=np.int32)
    return splits, image_table, image_ids
