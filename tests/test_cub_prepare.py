"""CUB tables loader + data-prep CLI tests."""

import json
import os

import h5py
import numpy as np
import pytest

from fumi_tpu.data.cub import load_cub
from fumi_tpu.data.prepare import main as prepare_main


def test_load_cub_missing_artifacts(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_cub(str(tmp_path))


def test_load_cub_roundtrip(tmp_path):
    root = tmp_path / "CUB"
    root.mkdir()
    rng = np.random.RandomState(0)
    n_img, D = 60, 16
    np.save(root / "image_embeddings.npy",
            rng.randn(n_img, D).astype(np.float32))
    tabs = {}
    start = 0
    for split, n_cls in (("train", 3), ("val", 1), ("test", 2)):
        rows = np.zeros((n_cls, 10), np.int32)
        for i in range(n_cls):
            rows[i] = np.arange(start, start + 10)
            start += 10
        tabs[f"{split}_rows"] = rows
        tabs[f"{split}_counts"] = np.full(n_cls, 10, np.int32)
        tabs[f"{split}_categories"] = np.arange(n_cls)
    np.savez(root / "class_image_rows.npz", **tabs)

    splits, table, ids = load_cub(str(tmp_path))
    assert table.shape == (60, 16)
    assert splits["train"].num_classes == 3
    assert splits["test"].num_classes == 2
    # image-only: zero text features (ref CUB has none, data.py:191-217)
    assert splits["train"].text_features.shape == (3, 1)
    assert np.all(splits["train"].text_features == 0)


def test_prepare_inspect(tmp_path, capsys):
    rng = np.random.RandomState(0)
    C, per = 10, 5
    cats = [{"id": i, "name": f"s{i}", "common_name": f"c{i}",
             "description": f"d{i}"} for i in range(C)]
    images = [{"id": i} for i in range(C * per)]
    annotations = [{"category_id": i % C} for i in range(C * per)]
    with open(tmp_path / "inat_anim.json", "w") as f:
        json.dump({"categories": cats, "images": images,
                   "annotations": annotations}, f)
    np.save(tmp_path / "text_embeddings_bert_description.npy",
            rng.randn(C, 4).astype(np.float32))
    rc = prepare_main(["inspect", "--data_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "categories: 10, images: 50" in out
    assert "artifact: text_embeddings_bert_description.npy" in out


def test_prepare_inspect_missing(tmp_path, capsys):
    rc = prepare_main(["inspect", "--data_dir", str(tmp_path)])
    assert rc == 1
