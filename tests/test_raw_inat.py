"""Raw-image iNat-Anim path: the Zenodo ``low-res-images.hdf5`` table
feeding the conv backbones (the data side of the reference's raw-encoder
TODO, ref: fumi/models/am3.py:44-46; artifact layout per the reference's
notebooks/DatasetDemo.ipynb, key ``images`` indexed by image id).

Raw tables stay uint8 in HBM; samplers normalize to fp32 [0,1] at gather
time (``sampler.pixels_to_float``).
"""

import sys

import jax.numpy as jnp
import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ref_oracle.dataset_gen import build  # noqa: E402

from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data.inat_anim import load_inat_anim
from fumi_tpu.data.sampler import (DeviceEpisodeSampler, HostEpisodeSampler,
                                   pixels_to_float, table_storage)

S = 16  # fixture image size (conv4 needs >= 2^4 for its four 2x2 pools)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_inat")
    # 40 images/class: val/test query size is int(100/num_ways)=33/class
    # (ref: data.py:165,182), so classes must hold >= K+33 images
    data_dir = build(root, num_classes=20, images_per_class=40,
                     raw_image_size=S)
    # BERT text artifact so the default text path loads offline
    rng = np.random.RandomState(3)
    np.save(f"{data_dir}/text_embeddings_bert_description.npy",
            rng.randn(20, 32).astype(np.float32))
    return data_dir


def test_load_raw_image_table(raw_dir):
    data = load_inat_anim(raw_dir, raw_images=True)
    assert data.image_table.dtype == np.uint8
    assert data.image_table.shape == (20 * 40, S, S, 3)
    # embeddings mode still works on the same directory
    emb = load_inat_anim(raw_dir, image_embedding_model="resnet-34")
    assert emb.image_table.ndim == 2


def test_missing_raw_artifact_is_actionable(tmp_path):
    build(tmp_path, num_classes=5, images_per_class=6)  # no raw table
    with pytest.raises(FileNotFoundError, match="low-res-images.hdf5"):
        load_inat_anim(str(tmp_path / "iNat-Anim"), raw_images=True)


def test_pixels_to_float_policy():
    u8 = jnp.asarray(np.array([[0, 128, 255]], dtype=np.uint8))
    out = pixels_to_float(u8)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out),
                               [[0.0, 128 / 255.0, 1.0]], rtol=1e-6)
    bf = jnp.ones((2, 2), jnp.bfloat16)
    assert pixels_to_float(bf).dtype == jnp.float32
    f32 = jnp.ones((2, 2), jnp.float32)
    assert pixels_to_float(f32) is f32


def test_table_storage_leaves_integer_tables(raw_dir):
    data = load_inat_anim(raw_dir, raw_images=True)
    t = table_storage(jnp.asarray(data.image_table), "bfloat16")
    assert t.dtype == jnp.uint8  # uint8 already beats bf16 on HBM


def _spec():
    return EpisodeSpec(batch_size=2, num_ways=3, num_shots=2, num_query=2,
                       im_dim=S * S * 3, text_dim=32)


def test_device_sampler_normalizes_raw_pixels(raw_dir):
    data = load_inat_anim(raw_dir, raw_images=True)
    cs = data.splits["train"]
    sampler = DeviceEpisodeSampler(
        table_storage(jnp.asarray(data.image_table), "bfloat16"),
        jnp.asarray(data.image_ids), cs, _spec())
    ep = sampler.sample(jax.random.PRNGKey(0))
    assert ep.support_im.shape == (2, 6, S, S, 3)
    assert ep.support_im.dtype == jnp.float32
    assert float(ep.query_im.min()) >= 0.0
    assert float(ep.query_im.max()) <= 1.0
    assert float(ep.support_im.max()) > 0.1  # actual pixel content
    # gathered rows match the table rows they claim (ids are row indices
    # for iNat-Anim)
    row = int(ep.support_ids[0, 0])
    np.testing.assert_allclose(
        np.asarray(ep.support_im[0, 0]),
        data.image_table[row].astype(np.float32) / 255.0, rtol=1e-6)


def test_host_sampler_normalizes_raw_pixels(raw_dir):
    data = load_inat_anim(raw_dir, raw_images=True)
    cs = data.splits["train"]
    sampler = HostEpisodeSampler(data.image_table, data.image_ids, cs,
                                 _spec(), seed=0, backend="numpy")
    ep = sampler.sample()
    assert ep.support_im.dtype == jnp.float32
    assert ep.query_im.dtype == jnp.float32
    assert float(ep.support_im.max()) <= 1.0
    row = int(ep.query_ids[0, 0])
    np.testing.assert_allclose(
        np.asarray(ep.query_im[0, 0]),
        data.image_table[row].astype(np.float32) / 255.0, rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["maml", "fumi"])
def test_cli_raw_inat_conv4_end_to_end(tmp_path, raw_dir, model):
    """Full CLI: conv4 backbone trained on the raw-image iNat layout.
    The stored 16x16x3 geometry is adopted automatically (the default
    --tpu_im_size 84 must not matter)."""
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config
    cfg = Config(
        model=model, dataset="inat-anim", data_dir=raw_dir,
        im_encoder="conv4", text_encoder="BERT", text_emb_dim=32,
        im_hid_dim=(16, 8), text_hid_dim=8, im_emb_dim=S * S * 3,
        num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=2, epochs=6, eval_freq=3, patience=0,
        num_ep_test=4, lr=1e-2, optim="adam", dropout=0.0,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


@pytest.mark.slow
def test_cli_raw_inat_augment_trains(tmp_path, raw_dir):
    """--augment on the raw path = flip+crop on support pixels."""
    from fumi_tpu.cli.main import main
    from fumi_tpu.core.config import Config
    cfg = Config(
        model="maml", dataset="inat-anim", data_dir=raw_dir,
        im_encoder="conv4", text_encoder="BERT", text_emb_dim=32,
        im_hid_dim=(16, 8), im_emb_dim=S * S * 3, augment=True,
        num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=2, epochs=4, eval_freq=2, patience=0,
        num_ep_test=4, lr=1e-2, optim="adam", dropout=0.0,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
