"""Synthetic-but-faithful iNat-Anim directory shared by the oracle runs.

Writes the exact on-disk layout the reference consumes (data.py:373-430):
``<root>/iNat-Anim/inat_anim.json`` (categories with name/common_name/
description, images, per-image-id annotations) and
``image_embeddings_resnet-34.hdf5`` with the ``images`` table. The
rebuild reads the same directory.

Image embeddings are 512-d Gaussian class clusters (the resnet-34 dim
the reference's arg validation enforces, main.py:41-44), with class-mean
scale vs noise chosen so 5-way few-shot accuracy lands well above chance
but below saturation — differences between frameworks stay visible.
Descriptions carry class-distinctive words so text-conditioned models
(AM3/FuMI with word-vector encoders) have signal, with varying lengths
so the <PAD> path is exercised.

Self-contained (stdlib + numpy + h5py) so both the pytest process and
the reference subprocess can load it by file path.
"""

import json
import os

import h5py
import numpy as np

DIM = 512  # resnet-34 embedding size (reference main.py:41-44)

_ADJS = ["striped", "spotted", "golden", "dusky", "crested", "banded",
         "hooded", "masked", "tufted", "glossy", "pale", "rufous",
         "speckled", "slender", "horned", "bearded", "collared", "plumed",
         "mottled", "ringed", "azure", "crimson", "olive", "silver"]
_HABITATS = ["montane forest", "coastal wetland", "arid scrubland",
             "riparian woodland", "alpine meadow", "mangrove swamp",
             "tallgrass prairie", "cloud forest"]


def build(root, num_classes=30, images_per_class=40, seed=7,
          mean_scale=0.45, noise_scale=1.0, text_means_fn=None,
          raw_image_size=None):
    """Write the dataset under ``<root>/iNat-Anim`` and return that path.

    ``text_means_fn`` (optional): callable ``description str -> (H,)
    vector``. When given, each class's image-cluster mean is a fixed
    seeded linear projection of its TEXT embedding (unit-normalised,
    rescaled to the same ``mean_scale * sqrt(DIM)`` norm the Gaussian
    means have) — a global cross-modal correspondence, so a model that
    learns text→image alignment on train classes can retrieve UNSEEN
    val/test classes. This is the structure the real iNat-Anim has
    (BERT description embeddings correlate with image content) and what
    makes the reference's CLIP evaluation (clip.py:43-74, disjoint
    class splits) non-vacuous on synthetic data. Episodic oracle runs
    keep the default independent Gaussian means."""
    data_dir = os.path.join(root, "iNat-Anim")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    categories = []
    for c in range(num_classes):
        adj = _ADJS[c % len(_ADJS)]
        adj2 = _ADJS[(c * 7 + 3) % len(_ADJS)]
        habitat = _HABITATS[c % len(_HABITATS)]
        extra = " whose call carries far at dusk" if c % 3 == 0 else ""
        categories.append({
            "id": c,
            "name": f"Speciesus {adj}i",
            "common_name": f"{adj} anteater",
            "description": (f"A {adj} animal with {adj2} markings found "
                            f"in {habitat}{extra}."),
        })

    n_images = num_classes * images_per_class
    images = [{"id": i} for i in range(n_images)]
    annotations = [{"category_id": i % num_classes} for i in range(n_images)]
    with open(os.path.join(data_dir, "inat_anim.json"), "w") as f:
        json.dump({"categories": categories, "images": images,
                   "annotations": annotations}, f)

    if text_means_fn is not None:
        t = np.stack([np.asarray(text_means_fn(c["description"]),
                                 dtype=np.float64)
                      for c in categories])  # (C, H)
        proj = rng.randn(DIM, t.shape[1]) / np.sqrt(t.shape[1])
        v = t @ proj.T  # (C, DIM)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        means = v * (mean_scale * np.sqrt(DIM))
    else:
        means = rng.randn(num_classes, DIM) * mean_scale
    emb = np.empty((n_images, DIM), dtype=np.float32)
    for i in range(n_images):
        c = i % num_classes
        emb[i] = means[c] + rng.randn(DIM) * noise_scale
    with h5py.File(os.path.join(data_dir,
                                "image_embeddings_resnet-34.hdf5"), "w") as f:
        f.create_dataset("images", data=emb)

    if raw_image_size is not None:
        # low-res-images.hdf5 (the Zenodo raw-image artifact, uint8 HWC,
        # row index = image id): class-specific smooth blob patterns +
        # pixel noise so conv backbones can learn above chance
        S = raw_image_size
        base = rng.rand(num_classes, S, S, 3)
        k = np.ones(3) / 3.0
        base = np.apply_along_axis(
            lambda v: np.convolve(v, k, "same"), 1, base)
        base = np.apply_along_axis(
            lambda v: np.convolve(v, k, "same"), 2, base)
        raw = np.empty((n_images, S, S, 3), dtype=np.uint8)
        for i in range(n_images):
            c = i % num_classes
            px = base[c] + 0.25 * rng.randn(S, S, 3)
            raw[i] = np.clip(px * 255.0, 0, 255).astype(np.uint8)
        with h5py.File(os.path.join(data_dir, "low-res-images.hdf5"),
                       "w") as f:
            f.create_dataset("images", data=raw)

    return data_dir
