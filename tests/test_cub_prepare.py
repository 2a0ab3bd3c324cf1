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


# ---------------------------------------------------------------------------
# Offline conversion: raw CUB_200_2011 layout -> artifacts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def raw_cub_dir(tmp_path_factory):
    """A tiny fake CUB_200_2011 release: 8 classes x 5 images."""
    from PIL import Image

    root = tmp_path_factory.mktemp("CUB_200_2011")
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    images_lines, label_lines, class_lines = [], [], []
    img_id = 1
    for cid in range(1, 9):
        cname = f"{cid:03d}.Bird_{cid}"
        class_lines.append(f"{cid} {cname}")
        cdir = root / "images" / cname
        cdir.mkdir()
        for j in range(5):
            rel = f"{cname}/img_{j}.jpg"
            arr = rng.randint(0, 255, (20, 24, 3), dtype=np.uint8)
            Image.fromarray(arr).save(cdir / f"img_{j}.jpg")
            images_lines.append(f"{img_id} {rel}")
            label_lines.append(f"{img_id} {cid}")
            img_id += 1
    (root / "images.txt").write_text("\n".join(images_lines))
    (root / "image_class_labels.txt").write_text("\n".join(label_lines))
    (root / "classes.txt").write_text("\n".join(class_lines))
    return str(root)


def test_convert_cub_roundtrips_through_load_cub(raw_cub_dir, tmp_path):
    from fumi_tpu.data.cub import convert_cub

    # injectable frozen encoder (mean-pool channels to a 12-dim embedding)
    def embed_fn(imgs):
        B = imgs.shape[0]
        return imgs.reshape(B, -1)[:, :12].astype(np.float32)

    out = convert_cub(raw_cub_dir, str(tmp_path), embed_fn=embed_fn,
                      image_size=8)
    assert out == os.path.join(str(tmp_path), "CUB")

    splits, table, ids = load_cub(str(tmp_path))
    assert table.shape == (40, 12)
    # 100/50/50 proportions over 8 classes -> 4/2/2
    assert splits["train"].num_classes == 4
    assert splits["val"].num_classes == 2
    assert splits["test"].num_classes == 2
    # every class has its 5 images, rows index into the table
    for s in ("train", "val", "test"):
        assert np.all(splits[s].class_counts == 5)
        assert splits[s].class_image_rows.max() < 40
    # splits partition the classes in classes.txt order
    cats = np.concatenate([splits[s].categories
                           for s in ("train", "val", "test")])
    np.testing.assert_array_equal(np.sort(cats), np.arange(1, 9))


def test_prepare_cub_cli(raw_cub_dir, tmp_path):
    rc = prepare_main(["cub", "--raw_dir", raw_cub_dir,
                       "--data_dir", str(tmp_path), "--image_size", "8"])
    assert rc == 0
    splits, table, ids = load_cub(str(tmp_path))
    # default pixels encoder: D = 8*8*3
    assert table.shape == (40, 192)
    assert np.all(table >= 0) and np.all(table <= 1)


def test_convert_cub_rejects_non_cub_dir(tmp_path):
    from fumi_tpu.data.cub import convert_cub
    empty = tmp_path / "nope"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        convert_cub(str(empty), str(tmp_path))


def test_convert_cub_with_split_lists(raw_cub_dir, tmp_path):
    """Exact split identity (VERDICT r3 item 5): a torchmeta-format
    train/val/test.json directory pins class→split assignment VERBATIM
    (membership AND order), overriding the proportional fallback; the
    artifact records the split source."""
    from fumi_tpu.data.cub import convert_cub

    lists = tmp_path / "lists"
    lists.mkdir()
    # scrambled, non-contiguous membership a proportional split can't make
    assign = {"train": ["007.Bird_7", "002.Bird_2", "005.Bird_5"],
              "val": ["001.Bird_1", "008.Bird_8"],
              "test": ["004.Bird_4", "003.Bird_3", "006.Bird_6"]}
    for split, names in assign.items():
        (lists / f"{split}.json").write_text(json.dumps(names))

    out = convert_cub(raw_cub_dir, str(tmp_path), image_size=8,
                      split_lists=str(lists))
    splits, table, ids = load_cub(str(tmp_path))
    # class ids follow the LIST order, not classes.txt order
    np.testing.assert_array_equal(splits["train"].categories, [7, 2, 5])
    np.testing.assert_array_equal(splits["val"].categories, [1, 8])
    np.testing.assert_array_equal(splits["test"].categories, [4, 3, 6])
    tabs = np.load(os.path.join(out, "class_image_rows.npz"))
    assert str(tabs["split_source"]).startswith("lists:")
    # rows still point at the right images: class 7's images are rows 30-34
    np.testing.assert_array_equal(
        np.sort(splits["train"].class_image_rows[0][:5]),
        np.arange(30, 35))


def test_convert_cub_split_list_errors(raw_cub_dir, tmp_path):
    from fumi_tpu.data.cub import convert_cub

    lists = tmp_path / "bad"
    lists.mkdir()
    (lists / "train.json").write_text(json.dumps(["001.Bird_1"]))
    with pytest.raises(FileNotFoundError, match="val.json"):
        convert_cub(raw_cub_dir, str(tmp_path), image_size=8,
                    split_lists=str(lists))
    for s in ("val", "test"):
        (lists / f"{s}.json").write_text(json.dumps(["001.Bird_1"]))
    with pytest.raises(ValueError, match="overlap"):
        convert_cub(raw_cub_dir, str(tmp_path), image_size=8,
                    split_lists=str(lists))
    (lists / "val.json").write_text(json.dumps(["999.Nope"]))
    with pytest.raises(ValueError, match="absent"):
        convert_cub(raw_cub_dir, str(tmp_path), image_size=8,
                    split_lists=str(lists))


def test_incomplete_torchmeta_assets_fall_back(tmp_path, monkeypatch,
                                               capsys):
    """A torchmeta install whose cub assets dir exists but lacks a split
    file counts as "unavailable": _load_split_lists falls back to the
    proportional split loudly instead of aborting prepare (only an
    explicit --splits dir hard-fails on a missing file)."""
    import sys
    import types

    from fumi_tpu.data.cub import _load_split_lists

    fake_root = tmp_path / "torchmeta_pkg"
    assets = fake_root / "datasets" / "assets" / "cub"
    assets.mkdir(parents=True)
    (assets / "train.json").write_text(json.dumps(["001.Bird_1"]))
    # no val.json/test.json — a pruned package
    fake = types.ModuleType("torchmeta")
    fake.__file__ = str(fake_root / "__init__.py")
    monkeypatch.setitem(sys.modules, "torchmeta", fake)

    classes = [(1, "001.Bird_1"), (2, "002.Bird_2"), (3, "003.Bird_3"),
               (4, "004.Bird_4")]
    split_classes, source = _load_split_lists(None, classes)
    assert source == "proportional-classes.txt-order"
    assert sum(len(v) for v in split_classes.values()) == len(classes)
    out = capsys.readouterr().out
    assert "torchmeta assets incomplete" in out
