"""Edge episode geometries: 1-shot (BASELINE config 'AM3 5-way 1-shot'),
2-way, single-query — through sampling and every episodic engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
from fumi_tpu.train.steps import make_steps

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

IM, TX = 16, 8


@pytest.mark.parametrize("model", ["maml", "fumi", "am3"])
@pytest.mark.parametrize("N,K,Q", [(5, 1, 3), (2, 1, 1), (3, 2, 1)])
def test_edge_geometry(model, N, K, Q):
    cfg = Config(model=model, dataset="synthetic", im_emb_dim=IM,
                 text_emb_dim=TX, im_hid_dim=(8,), prototype_dim=8,
                 text_hid_dim=8, num_ways=N, num_shots=K, num_shots_test=Q,
                 num_train_adapt_steps=1, num_test_adapt_steps=2,
                 batch_size=2, dropout=0.0, text_encoder="precomputed",
                 step_size=0.1, lr=1e-2, optim="adam",
                 prng_impl="threefry2x32")
    cs, table, ids = synthetic_class_set(num_classes=max(N + 2, 6),
                                         images_per_class=K + Q + 2,
                                         im_dim=IM, text_dim=TX, seed=0)
    spec = EpisodeSpec(cfg.batch_size, N, K, Q, IM, TX)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    ep = jax.jit(sampler.sample)(jax.random.PRNGKey(0))
    assert ep.support_im.shape == (2, N * K, IM)
    assert ep.query_im.shape == (2, N * Q, IM)
    # support/query disjoint at minimal sizes
    for b in range(2):
        s = set(np.asarray(ep.support_ids)[b].tolist())
        q = set(np.asarray(ep.query_ids)[b].tolist())
        assert not (s & q)

    steps = make_steps(cfg, jax.random.PRNGKey(0))
    p, s = steps.params, steps.opt.init(steps.params)
    p, s, m = steps.train_step(p, s, ep, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    em = steps.eval_step(p, ep, jax.random.PRNGKey(2))
    assert np.isfinite(float(em["loss"]))
    assert 0.0 <= float(em["acc"]) <= 1.0
