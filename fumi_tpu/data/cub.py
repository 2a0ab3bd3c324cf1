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


# ---------------------------------------------------------------------------
# Offline conversion: raw CUB_200_2011 release -> artifacts for load_cub
# ---------------------------------------------------------------------------

# meta-split fractions over the class list (the reference wires torchmeta's
# CUB helper, which uses the Hilliard-et-al. 100/50/50 class lists, ref:
# fumi/dataset/data.py:191-217; those exact lists are torchmeta data files,
# so this conversion uses the same 100/50/50 PROPORTIONS over classes.txt
# order — a documented deviation)
SPLIT_FRACTIONS = {"train": 0.5, "val": 0.25, "test": 0.25}


def _read_pairs(path: str):
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out.append((int(parts[0]), parts[1]))
    return out


def pixels_embed_fn(images: "np.ndarray") -> "np.ndarray":
    """Trivial 'encoder': flattened resized pixels. Pairs with the conv4
    raw-image backbone (``--im_encoder conv4``, the reference's TODO at
    am3.py:44-46) or plain MLP heads on raw pixels."""
    return images.reshape(images.shape[0], -1).astype(np.float32)


def convert_cub(raw_dir: str, data_dir: str, embed_fn=None,
                image_size: int = 84, batch_size: int = 64) -> str:
    """Convert a raw CUB_200_2011 directory into load_cub's artifacts.

    ``raw_dir`` must contain ``images.txt``, ``image_class_labels.txt``,
    ``classes.txt`` and the ``images/`` tree (the standard CUB release
    layout). ``embed_fn(images: (B, S, S, 3) float32 in [0,1]) -> (B, D)``
    is the frozen encoder — pluggable so tests/custom encoders can inject
    one; default is :func:`pixels_embed_fn` (raw pixels; mirrors how
    iNat-Anim ships precomputed resnet embeddings, which here would be an
    injected torchvision/flax encoder).

    Returns the artifact directory ``<data_dir>/CUB``.
    """
    from PIL import Image

    if embed_fn is None:
        embed_fn = pixels_embed_fn

    images = _read_pairs(os.path.join(raw_dir, "images.txt"))
    labels = {i: int(c) for i, c in
              _read_pairs(os.path.join(raw_dir, "image_class_labels.txt"))}
    classes = _read_pairs(os.path.join(raw_dir, "classes.txt"))
    if not images or not classes:
        raise FileNotFoundError(
            f"{raw_dir} does not look like a CUB_200_2011 release "
            "(need images.txt / image_class_labels.txt / classes.txt)")

    # embed every image, row index = order in images.txt
    rows_per_class: Dict[int, list] = {cid: [] for cid, _ in classes}
    table_chunks = []
    batch = []
    for row, (img_id, rel) in enumerate(images):
        with Image.open(os.path.join(raw_dir, "images", rel)) as im:
            im = im.convert("RGB").resize((image_size, image_size),
                                          Image.BILINEAR)
            batch.append(np.asarray(im, dtype=np.float32) / 255.0)
        rows_per_class[labels[img_id]].append(row)
        if len(batch) == batch_size:
            table_chunks.append(embed_fn(np.stack(batch)))
            batch = []
    if batch:
        table_chunks.append(embed_fn(np.stack(batch)))
    image_table = np.concatenate(table_chunks, axis=0).astype(np.float32)

    # class meta-split: 100/50/50 proportions over classes.txt order
    n_cls = len(classes)
    n_train = int(SPLIT_FRACTIONS["train"] * n_cls)
    n_val = int(SPLIT_FRACTIONS["val"] * n_cls)
    split_classes = {
        "train": classes[:n_train],
        "val": classes[n_train:n_train + n_val],
        "test": classes[n_train + n_val:],
    }

    out_root = os.path.join(data_dir, "CUB")
    os.makedirs(out_root, exist_ok=True)
    arrays = {}
    for split, cls in split_classes.items():
        counts = np.array([len(rows_per_class[cid]) for cid, _ in cls],
                          dtype=np.int32)
        width = max(1, int(counts.max()) if len(counts) else 1)
        rows = np.zeros((len(cls), width), dtype=np.int32)
        for i, (cid, _) in enumerate(cls):
            r = rows_per_class[cid]
            rows[i, :len(r)] = r
        arrays[f"{split}_rows"] = rows
        arrays[f"{split}_counts"] = counts
        arrays[f"{split}_categories"] = np.array([cid for cid, _ in cls],
                                                 dtype=np.int32)
    np.save(os.path.join(out_root, "image_embeddings.npy"), image_table)
    np.savez(os.path.join(out_root, "class_image_rows.npz"), **arrays)
    return out_root
