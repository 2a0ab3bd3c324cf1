"""Pretrained word-vector pipeline: ingest → artifact → encoder weights.

Reference semantics under test (fumi/models/common.py:164-196): known
words take their pretrained vector, OOV words are uniform(−1,1), the PAD
row is zeroed. Plus the actionable-error contract when a glove/w2v run
has no artifact.
"""

import json
import os

import h5py
import numpy as np
import pytest

from fumi_tpu.data import vectors as vec
from fumi_tpu.data.prepare import main as prepare_main
from fumi_tpu.models import text_encoders


@pytest.fixture(scope="module")
def inat_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inat"))
    C, per, D = 6, 20, 8
    cats = [{"id": i, "name": f"species{i}",
             "common_name": f"common{i}",
             "description": f"animal number{i} lives in habitat{i}"}
            for i in range(C)]
    images = [{"id": i} for i in range(C * per)]
    annotations = [{"category_id": i % C} for i in range(C * per)]
    with open(os.path.join(root, "inat_anim.json"), "w") as f:
        json.dump({"categories": cats, "images": images,
                   "annotations": annotations}, f)
    rng = np.random.RandomState(0)
    with h5py.File(os.path.join(root, "image_embeddings_resnet-152.hdf5"),
                   "w") as f:
        f.create_dataset("images",
                         data=rng.randn(C * per, D).astype(np.float32))
    return root


def _write_glove(path, words, dim=4, scale=1.0):
    with open(path, "w") as f:
        for i, w in enumerate(words):
            vals = " ".join(f"{scale * (i + 1 + j / 10):.4f}"
                            for j in range(dim))
            f.write(f"{w} {vals}\n")


def test_parse_glove_format(tmp_path):
    p = tmp_path / "glove.txt"
    _write_glove(p, ["animal", "lives", "habitat0"])
    out = vec.parse_vector_file(str(p))
    assert set(out) == {"animal", "lives", "habitat0"}
    np.testing.assert_allclose(out["animal"],
                               [1.0, 1.1, 1.2, 1.3], atol=1e-6)


def test_parse_word2vec_format(tmp_path):
    p = tmp_path / "w2v.txt"
    with open(p, "w") as f:
        f.write("2 3\n")
        f.write("animal 1 2 3\n")
        f.write("lives 4 5 6\n")
    out = vec.parse_vector_file(str(p))
    assert set(out) == {"animal", "lives"}
    np.testing.assert_allclose(out["lives"], [4, 5, 6])


def test_parse_with_filter(tmp_path):
    p = tmp_path / "glove.txt"
    _write_glove(p, ["animal", "zebra", "lives"])
    out = vec.parse_vector_file(str(p), keep={"animal", "lives"})
    assert set(out) == {"animal", "lives"}


def test_dataset_word_set_covers_all_text_fields(inat_dir):
    words = vec.dataset_word_set(inat_dir)
    # tokens from description, name, and common_name, lowercased;
    # gensim tokenisation is alphabetic-only (digits split tokens)
    assert {"animal", "lives", "habitat", "species", "common"} <= words
    assert "zebra" not in words


def test_prepare_vectors_cli_and_artifact_roundtrip(inat_dir, tmp_path):
    src = tmp_path / "glove.txt"
    _write_glove(src, ["animal", "lives", "zebra"])  # zebra filtered out
    rc = prepare_main(["vectors", "--src", str(src), "--kind", "glove",
                       "--data_dir", inat_dir])
    assert rc == 0
    path = vec.artifact_path(inat_dir, "glove")
    assert os.path.exists(path)
    loaded = vec.load_vectors_artifact(path)
    assert set(loaded) == {"animal", "lives"}
    np.testing.assert_allclose(loaded["animal"], [1.0, 1.1, 1.2, 1.3],
                               atol=1e-6)


def test_vectors_for_encoder_missing_is_actionable(tmp_path):
    with pytest.raises(RuntimeError, match="prepare vectors"):
        vec.vectors_for_encoder("w2v", str(tmp_path))
    # non-word encoders need no vectors
    assert vec.vectors_for_encoder("BERT", str(tmp_path)) is None


def test_encoder_uses_pretrained_vectors(inat_dir, tmp_path):
    """End to end: artifact → Vocabulary → encoder embedding matrix with
    the reference's known/OOV/PAD semantics (common.py:180-194)."""
    import jax

    src = tmp_path / "glove.txt"
    _write_glove(src, ["animal", "lives"])
    prepare_main(["vectors", "--src", str(src), "--kind", "glove",
                  "--data_dir", inat_dir])

    token2id = {"animal": 0, "lives": 1, "oovword": 2,
                text_encoders.PAD_WORD: 3}
    vocab = vec.Vocabulary(token2id,
                           vec.vectors_for_encoder("glove", inat_dir))
    enc = text_encoders.make_text_encoder(
        "glove", jax.random.PRNGKey(0), text_emb_dim=4, dictionary=vocab)
    embed = np.asarray(enc.params["embed"])
    assert embed.shape == (4, 4)  # dim comes from the vectors, not the cfg
    np.testing.assert_allclose(embed[0], [1.0, 1.1, 1.2, 1.3], atol=1e-6)
    np.testing.assert_allclose(embed[1], [2.0, 2.1, 2.2, 2.3], atol=1e-6)
    # OOV: uniform(-1, 1), not a pretrained vector, not zero
    assert np.all(np.abs(embed[2]) < 1.0) and np.any(embed[2] != 0)
    # PAD row zeroed
    np.testing.assert_array_equal(embed[3], 0.0)


def test_cli_load_data_attaches_vectors(inat_dir, tmp_path):
    """_load_data returns a Vocabulary carrying the artifact for word
    encoders, and raises the actionable error when it is absent."""
    from fumi_tpu.cli.main import _load_data
    from fumi_tpu.core.config import Config

    src = tmp_path / "glove.txt"
    _write_glove(src, ["animal", "lives"])
    prepare_main(["vectors", "--src", str(src), "--kind", "glove",
                  "--data_dir", inat_dir])

    cfg = Config(model="am3", dataset="inat-anim", data_dir=inat_dir,
                 text_encoder="glove")
    _, _, _, dictionary = _load_data(cfg)
    assert isinstance(dictionary, vec.Vocabulary)
    assert "animal" in dictionary.vectors

    # w2v has no artifact in this dir -> actionable error
    cfg2 = Config(model="am3", dataset="inat-anim", data_dir=inat_dir,
                  text_encoder="w2v")
    with pytest.raises(RuntimeError, match="prepare vectors"):
        _load_data(cfg2)
