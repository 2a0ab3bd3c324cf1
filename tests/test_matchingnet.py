"""MatchingNet registered family: sample-level attention classification
(Vinyals et al. 2016) must match a numpy oracle, learn end to end through
the CLI, ride the parallel engine untouched, and serve."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from fumi_tpu.core.config import Config
from fumi_tpu.ops.fewshot import matching_probs

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow


def _cfg(tmp_path, **kw):
    base = dict(
        model="matchingnet", dataset="synthetic", im_emb_dim=32,
        text_emb_dim=16, prototype_dim=16,
        num_ways=3, num_shots=2, num_shots_test=4,
        batch_size=8, epochs=30, eval_freq=15, patience=0, num_ep_test=8,
        lr=1e-2, optim="adam", dropout=0.0, text_encoder="precomputed",
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    base.update(kw)
    return Config(**base)


def test_matching_probs_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, NK, NQ, P, N = 2, 6, 4, 8, 3
    s = rng.randn(B, NK, P).astype(np.float32)
    q = rng.randn(B, NQ, P).astype(np.float32)
    y = np.tile(np.repeat(np.arange(N), 2)[None], (B, 1)).astype(np.int32)

    got = np.asarray(matching_probs(jnp.asarray(s), jnp.asarray(y),
                                    jnp.asarray(q), N))

    # independent numpy restatement of Vinyals et al. (2016) eq. 1-2
    def norm(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    sn, qn = norm(s), norm(q)
    for b in range(B):
        cos = qn[b] @ sn[b].T  # (NQ, NK)
        e = np.exp(cos - cos.max(axis=-1, keepdims=True))
        attn = e / e.sum(axis=-1, keepdims=True)
        onehot = np.eye(N, dtype=np.float32)[y[b]]  # (NK, N)
        want = attn @ onehot
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)
    # rows are probability distributions
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_registry_contains_matchingnet():
    from fumi_tpu.train.steps import FAMILY_REGISTRY
    assert "matchingnet" in FAMILY_REGISTRY
    _cfg("/tmp").validate()


def test_cli_matchingnet_end_to_end(tmp_path):
    from fumi_tpu.cli.main import main
    out = main(_cfg(tmp_path))
    assert np.isfinite(out["test/loss"])
    # linearly separable synthetic classes: attention over support samples
    # should beat chance solidly after training
    assert out["test/acc"] > 1.0 / 3 + 0.1


def test_matchingnet_inherits_parallel_engine():
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.core.mesh import make_mesh, put_episode, put_replicated
    from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
    from fumi_tpu.parallel import make_parallel_steps
    from fumi_tpu.train.steps import make_steps

    cfg = _cfg("/tmp")
    cs, table, ids = synthetic_class_set(
        num_classes=10, images_per_class=20, im_dim=32, text_dim=16, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, 32, 16)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    episode = jax.jit(sampler.sample)(jax.random.PRNGKey(0))

    serial = make_steps(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, mp=1)
    par = make_parallel_steps(cfg, jax.random.PRNGKey(0), mesh)

    rng = jax.random.PRNGKey(1)
    sp, _, sm = serial.train_step(serial.params, serial.opt.init(
        serial.params), episode, rng)
    pp, _, pm = par.train_step(
        put_replicated(par.params, mesh),
        put_replicated(par.opt.init(par.params), mesh),
        put_episode(episode, mesh), rng)
    assert abs(float(sm["loss"]) - float(pm["loss"])) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5), sp, pp)


def test_matchingnet_serving():
    """Adapt-once (= embed support) / classify-many, and the one-dispatch
    episode path, agree with the family's eval math."""
    from fumi_tpu.serve import FewShotClassifier

    cfg = _cfg("/tmp")
    N, K, M, D = cfg.num_ways, cfg.num_shots, 5, cfg.im_emb_dim
    rng = np.random.RandomState(3)
    s_im = rng.randn(N * K, D).astype(np.float32)
    q_im = rng.randn(M, D).astype(np.float32)
    s_y = np.repeat(np.arange(N), K).astype(np.int32)

    clf = FewShotClassifier(cfg, None)
    clf.adapt(s_im, support_y=s_y)
    probs = np.asarray(clf.classify(q_im, return_probs=True))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    # parity with the family embedding math (linear: y = x @ W.T + b)
    from fumi_tpu.models import layers
    s_e = layers.linear(clf.params, jnp.asarray(s_im))
    q_e = layers.linear(clf.params, jnp.asarray(q_im))
    want = np.asarray(matching_probs(
        s_e[None], jnp.asarray(s_y)[None], q_e[None], N))[0]
    np.testing.assert_allclose(probs, want, rtol=1e-5, atol=1e-6)

    # one-dispatch episode path agrees with adapt+classify
    logits = np.asarray(clf.episode_logits(s_im, s_y, q_im))
    np.testing.assert_allclose(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True), probs,
        rtol=1e-4, atol=1e-5)
