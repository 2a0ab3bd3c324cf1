"""Gradient accumulation (--tpu_grad_accum): micro-batched meta-gradients
are EXACTLY the full-batch ones (every family's outer loss is a task
mean), so accumulated training reproduces unaccumulated training while
the second-order working set scales with B/accum (the B=64 memory cliff
in docs/PERFORMANCE.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data.sampler import DeviceEpisodeSampler
from fumi_tpu.data.synthetic import synthetic_splits
from fumi_tpu.train.steps import (accum_value_and_grad, build_family,
                                  make_chunked_train, make_opt)


def _cfg(tmp_path, model="fumi", **kw):
    base = dict(
        model=model, dataset="synthetic", im_emb_dim=32, text_emb_dim=16,
        im_hid_dim=(16, 8), prototype_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=8, epochs=6, eval_freq=3, patience=0,
        num_ep_test=8, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32",
    )
    base.update(kw)
    return Config(**base)


def _sampler_family(cfg):
    splits, table, ids = synthetic_splits(
        num_classes=16, images_per_class=32, im_dim=cfg.im_emb_dim,
        text_dim=cfg.text_emb_dim, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, cfg.im_emb_dim,
                       cfg.text_emb_dim)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   splits["train"], spec)
    family = build_family(cfg, jax.random.PRNGKey(cfg.seed))
    return sampler, family


@pytest.mark.parametrize("model", ["fumi", "maml", "am3"])
@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch_training(tmp_path, model, accum):
    """A=2/4 micro-batching reproduces the unaccumulated trajectory:
    same episodes (key stream unchanged), same params after 3 chunked
    steps, same logged loss/acc — to fp-reassociation tolerance. Covers
    the second-order joint dual update (fumi), plain MAML, and AM3's
    summed-confusion metric path."""
    cfg = _cfg(tmp_path, model=model)
    sampler, family = _sampler_family(cfg)
    opt = make_opt(cfg)
    key = jax.random.PRNGKey(3)

    def train(a):
        run = make_chunked_train(family, opt, sampler, chunk=3, accum=a)
        p, s, _, ms = run(family.params, opt.init(family.params), key)
        return p, {k: np.asarray(v) for k, v in ms.items()}

    p1, m1 = train(1)
    pA, mA = train(accum)
    # trajectory tolerance is looser than the single-gradient one: Adam's
    # per-element normalization amplifies fp-reassociation noise on tiny
    # second-order gradient components across steps
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pA)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
    for k in ("loss", "acc"):
        np.testing.assert_allclose(m1[k], mA[k], rtol=2e-5, atol=2e-6,
                                   err_msg=f"metric {k}")
    if model == "am3":
        for k in ("prec", "rec", "f1", "avg_lamda"):
            np.testing.assert_allclose(m1[k], mA[k], rtol=2e-5, atol=2e-6,
                                       err_msg=f"metric {k}")


def test_accum_grad_is_exact_full_batch_grad(tmp_path):
    """The accumulated gradient equals jax.value_and_grad on the full
    batch, per leaf (the mean-of-means identity for equal micro sizes)."""
    cfg = _cfg(tmp_path, model="fumi")
    sampler, family = _sampler_family(cfg)
    episode = sampler.sample(jax.random.PRNGKey(5), sampler.tables)
    rng = jax.random.PRNGKey(0)

    (l1, _), g1 = jax.jit(jax.value_and_grad(
        family.train_loss, has_aux=True))(family.params, episode, rng)
    (l2, _), g2 = jax.jit(accum_value_and_grad(family, 4))(
        family.params, episode, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_accum_aux_combining(tmp_path):
    """conf is SUMMED over micros (count matrix), scalars are averaged,
    per-task leaves (preds) concatenate back to the full batch."""
    cfg = _cfg(tmp_path, model="am3")
    sampler, family = _sampler_family(cfg)
    episode = sampler.sample(jax.random.PRNGKey(5), sampler.tables)
    rng = jax.random.PRNGKey(0)

    (_, aux1), _ = jax.value_and_grad(
        family.train_loss, has_aux=True)(family.params, episode, rng)
    (_, aux2), _ = accum_value_and_grad(family, 2)(
        family.params, episode, rng)
    # counts: the whole batch's queries appear exactly once
    assert aux2["conf"].shape == aux1["conf"].shape
    np.testing.assert_array_equal(np.asarray(aux2["conf"]),
                                  np.asarray(aux1["conf"]))
    assert aux2["preds"].shape == aux1["preds"].shape
    np.testing.assert_array_equal(np.asarray(aux2["preds"]),
                                  np.asarray(aux1["preds"]))
    np.testing.assert_allclose(float(aux2["avg_lamda"]),
                               float(aux1["avg_lamda"]), rtol=1e-6)


def test_accum_validation(tmp_path):
    # must divide the meta-batch
    with pytest.raises(ValueError, match="divide"):
        _cfg(tmp_path, batch_size=4, grad_accum=3).validate()
    with pytest.raises(ValueError, match=">= 1"):
        _cfg(tmp_path, grad_accum=0).validate()
    # host-sampler path has no accumulation wiring: reject, don't ignore
    with pytest.raises(NotImplementedError, match="device sampler"):
        _cfg(tmp_path, grad_accum=2, device_sampler=False).validate()
    # the 2-D (mp) engine rejection is statically known — it must fail
    # at validate(), before dataset load / mesh build / initial eval
    with pytest.raises(NotImplementedError, match="mp"):
        _cfg(tmp_path, grad_accum=2, mesh_mp=2).validate()


def test_accum_rejects_unknown_aux_shape(tmp_path):
    """A registered family whose aux carries an array that is neither
    scalar, 'conf', nor per-task must fail loudly at trace time — the
    shape heuristic must never silently scramble such a leaf across
    micro-batches."""
    cfg = _cfg(tmp_path, model="fumi")
    sampler, family = _sampler_family(cfg)
    episode = sampler.sample(jax.random.PRNGKey(5), sampler.tables)

    def bad_loss(params, ep, rng):
        loss, aux = family.train_loss(params, ep, rng)
        aux = dict(aux)
        aux["per_class"] = jnp.zeros((cfg.num_ways,))  # not per-task
        return loss, aux

    bad = family._replace(train_loss=bad_loss)
    with pytest.raises(ValueError, match="per_class"):
        accum_value_and_grad(bad, 2)(family.params, episode,
                                     jax.random.PRNGKey(0))


@pytest.mark.slow
def test_accum_cli_end_to_end(tmp_path):
    """--tpu_grad_accum through the CLI driver matches the unaccumulated
    run's test metrics exactly (deterministic config), incl. a sweep."""
    from fumi_tpu.cli.main import main
    # mesh_dp=2 pins the dp parallel engine on the 8-device test env:
    # per-shard batch 4, micro-batched 4-ways under accumulation — the
    # dp + accum composition (local micro-means before the pmean)
    base = dict(epochs=6, eval_freq=3, mesh_dp=2)
    out1 = main(_cfg(tmp_path / "a", **base))
    out2 = main(_cfg(tmp_path / "b", grad_accum=4, **base))
    np.testing.assert_allclose(out1["test/loss"], out2["test/loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(out1["test/acc"], out2["test/acc"],
                               rtol=2e-5)

    # lockstep sweep with accumulation: per-seed metrics match the
    # unaccumulated sweep
    s1 = main(_cfg(tmp_path / "s1", seed_sweep=2, **base))
    s2 = main(_cfg(tmp_path / "s2", seed_sweep=2, grad_accum=2, **base))
    for k in ("test/seed0/loss", "test/seed1/loss"):
        np.testing.assert_allclose(s1[k], s2[k], rtol=2e-5)


def test_accum_declared_aux_reduce(tmp_path):
    """Family.train_aux_reduce removes the shape-heuristic blind spot:
    a per-class aux whose length EQUALS the micro-batch size (the case
    the heuristic cannot distinguish from per-task) is combined as
    declared. Also documents the undeclared fallback's wrong answer."""
    cfg = _cfg(tmp_path, model="fumi", num_ways=4, batch_size=8)
    sampler, family = _sampler_family(cfg)
    episode = sampler.sample(jax.random.PRNGKey(5), sampler.tables)

    def loss2(params, ep, rng):
        loss, aux = family.train_loss(params, ep, rng)
        aux = dict(aux)
        aux["per_class"] = jnp.arange(cfg.num_ways,
                                      dtype=jnp.float32) * loss
        return loss, aux

    declared = dict(family.train_aux_reduce or {})
    declared["per_class"] = "mean"
    fam_ok = family._replace(train_loss=loss2, train_aux_reduce=declared)
    (_, aux), _ = accum_value_and_grad(fam_ok, 2)(
        family.params, episode, jax.random.PRNGKey(0))
    assert aux["per_class"].shape == (cfg.num_ways,)  # micro-averaged

    # undeclared: micro_size == num_ways == 4, so the heuristic treats
    # the leaf as per-task and concatenates — the documented blind spot
    fam_bad = family._replace(train_loss=loss2)
    (_, aux2), _ = accum_value_and_grad(fam_bad, 2)(
        family.params, episode, jax.random.PRNGKey(0))
    assert aux2["per_class"].shape == (cfg.batch_size,)
