"""``prepare verify`` — the artifact contract (VERDICT r4 missing #4):
green on the synthetic reference-format fixture, loud on every
corruption a real-data first contact could present."""

import json
import os
import shutil
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ref_oracle.dataset_gen import build  # noqa: E402

from fumi_tpu.data.prepare import main as prepare_main
from fumi_tpu.data.verify import verify_dataset


@pytest.fixture()
def good_dir(tmp_path):
    data_dir = build(tmp_path, num_classes=20, images_per_class=40,
                     raw_image_size=16)
    rng = np.random.RandomState(0)
    np.save(os.path.join(data_dir, "text_embeddings_bert_description.npy"),
            rng.randn(20, 768).astype(np.float32))
    return data_dir


def _statuses(rep):
    return {n: s for s, n, _ in rep.rows}


def test_verify_passes_on_reference_format_fixture(good_dir, capsys):
    rep = verify_dataset(good_dir)
    assert not rep.failed, rep.render()
    # the CLI surface: exit 0 and a one-page report
    rc = prepare_main(["verify", "--data_dir", good_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "verify: PASS" in out
    assert "fingerprint" in out  # split reproducibility hash line


def test_verify_reports_split_fingerprint_deterministically(good_dir):
    r1, r2 = verify_dataset(good_dir), verify_dataset(good_dir)
    fp = [d for s, n, d in r1.rows if n == "seed-0 split partition"]
    assert fp == [d for s, n, d in r2.rows
                  if n == "seed-0 split partition"]
    assert "fingerprint" in fp[0]


def _corrupt_json(data_dir, mutate):
    path = os.path.join(data_dir, "inat_anim.json")
    with open(path) as f:
        ann = json.load(f)
    mutate(ann)
    with open(path, "w") as f:
        json.dump(ann, f)


def test_verify_fails_on_missing_json(good_dir):
    os.remove(os.path.join(good_dir, "inat_anim.json"))
    rep = verify_dataset(good_dir)
    assert rep.failed
    assert _statuses(rep)["inat_anim.json"] == "FAIL"


def test_verify_fails_on_permuted_image_ids(good_dir):
    def mutate(ann):
        ann["images"][0]["id"], ann["images"][1]["id"] = 1, 0
    _corrupt_json(good_dir, mutate)
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["image ids are row indices"] == "FAIL"


def test_verify_fails_on_nonpositional_category_ids(good_dir):
    _corrupt_json(good_dir, lambda ann: ann["categories"][3].update(id=99))
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["category ids positional"] == "FAIL"


def test_verify_fails_on_missing_text_key(good_dir):
    _corrupt_json(good_dir,
                  lambda ann: ann["categories"][0].pop("common_name"))
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["category text keys"] == "FAIL"


def test_verify_fails_on_out_of_range_category(good_dir):
    _corrupt_json(good_dir,
                  lambda ann: ann["annotations"][5].update(category_id=500))
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["annotation category ids"] == "FAIL"


def test_verify_fails_on_row_count_mismatch(good_dir):
    path = os.path.join(good_dir, "image_embeddings_resnet-34.hdf5")
    with h5py.File(path, "r") as f:
        emb = np.asarray(f["images"])
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=emb[:-3])  # drop rows
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["image_embeddings_resnet-34.hdf5"] == "FAIL"
    assert prepare_main(["verify", "--data_dir", good_dir]) == 1


def test_verify_fails_on_wrong_hdf5_key(good_dir):
    path = os.path.join(good_dir, "image_embeddings_resnet-34.hdf5")
    with h5py.File(path, "r") as f:
        emb = np.asarray(f["images"])
    with h5py.File(path, "w") as f:
        f.create_dataset("embeddings", data=emb)  # wrong key
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["image_embeddings_resnet-34.hdf5"] == "FAIL"


def test_verify_fails_on_wrong_embedding_width(good_dir):
    path = os.path.join(good_dir, "image_embeddings_resnet-34.hdf5")
    with h5py.File(path, "r") as f:
        emb = np.asarray(f["images"])
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=emb[:, :300])
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["image_embeddings_resnet-34.hdf5"] == "FAIL"


def test_verify_fails_on_tiny_raw_geometry(good_dir):
    path = os.path.join(good_dir, "low-res-images.hdf5")
    with h5py.File(path, "r") as f:
        raw = np.asarray(f["images"])
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=raw[:, :8, :8])  # 8x8 < 16
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["raw image geometry"] == "FAIL"


def test_verify_fails_on_text_artifact_category_mismatch(good_dir):
    np.save(os.path.join(good_dir, "text_embeddings_bert_description.npy"),
            np.zeros((7, 768), np.float32))  # 7 != 20 categories
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["text_embeddings_bert_description.npy"] == "FAIL"


def test_verify_fails_on_nonfinite_text_artifact(good_dir):
    emb = np.zeros((20, 768), np.float32)
    emb[3, 5] = np.nan
    np.save(os.path.join(good_dir, "text_embeddings_bert_description.npy"),
            emb)
    rep = verify_dataset(good_dir)
    assert _statuses(rep)["text_embeddings_bert_description.npy"] == "FAIL"


def test_verify_warns_not_fails_on_absent_optional_artifacts(tmp_path):
    """A minimal embeddings-only dir (no raw table, no text artifact)
    verifies PASS with warnings — optional capability, not corruption."""
    data_dir = build(tmp_path, num_classes=20, images_per_class=40)
    rep = verify_dataset(data_dir)
    assert not rep.failed, rep.render()
    st = _statuses(rep)
    assert st["low-res-images.hdf5"] == "WARN"
    assert st["BERT text artifacts"] == "WARN"


def test_verify_warns_on_thin_classes(tmp_path):
    """Classes below K + int(100/N) images: legal json, doomed episodes
    — surfaced as a WARN naming the bound."""
    data_dir = build(tmp_path, num_classes=20, images_per_class=12)
    rep = verify_dataset(data_dir)
    assert not rep.failed
    warn = [d for s, n, d in rep.rows
            if n == "train class occupancy" and s == "WARN"]
    assert warn and "25" in warn[0]  # K=5 + 100//5


def test_verify_survives_malformed_annotations(good_dir):
    """Review regression: a json whose annotation list is shorter than
    the image list must produce a FAIL report, not an IndexError from
    the split walk (which indexes annotations the way the loaders do)."""
    _corrupt_json(good_dir,
                  lambda ann: ann.update(annotations=ann["annotations"][:5]))
    rep = verify_dataset(good_dir)  # must not raise
    assert rep.failed
    assert _statuses(rep)["annotations per image id"] == "FAIL"
    assert _statuses(rep).get("split checks") == "SKIP"


def test_verify_warns_on_too_few_categories_for_flagship_ways(tmp_path):
    """C=20 splits 12/4/4 — every fold non-empty yet val/test cannot
    host a 5-way episode; verify must warn (bound C >= 5N)."""
    data_dir = build(tmp_path, num_classes=20, images_per_class=40)
    rep = verify_dataset(data_dir)
    warn = [d for s, n, d in rep.rows
            if n == "split geometry" and s == "WARN"]
    assert warn and "25" in warn[0]
