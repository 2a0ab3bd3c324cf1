"""Exact step/eval accounting of the chunked training loop vs a direct
Python simulation of the reference's loop structure (ref: am3.py:237-297,
maml.py:53-103, fumi.py:241-291):

    for batch_idx, batch in enumerate(loader):
        train_step()
        if batch_idx % eval_freq == 0 [and batch_idx != 0]:
            eval(); maybe update best
        if batch_idx > epochs - 1 or (patience > 0 and
                                      batch_idx - best > patience):
            break

The chunked device loop must produce the SAME sequence of train steps and
eval points for arbitrary (epochs, eval_freq, patience) settings.
"""

import numpy as np
import jax
import pytest

import fumi_tpu.train.loop as loop_mod
from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
from fumi_tpu.train.logging import MetricWriter

# long-horizon harness simulations -> slow tier (fast tier = -m "not slow")
pytestmark = pytest.mark.slow
from fumi_tpu.train.steps import make_steps

IM_DIM, TXT_DIM = 16, 8


def reference_simulation(epochs, eval_freq, patience, eval_at_zero,
                         improves_at):
    """Steps processed + eval points per the reference loop. ``improves_at``
    is the set of eval indices whose val loss improves best."""
    best = 0
    steps, evals = [], []
    batch_idx = 0
    while True:
        steps.append(batch_idx)
        if eval_freq > 0 and batch_idx % eval_freq == 0 and \
                (eval_at_zero or batch_idx != 0):
            evals.append(batch_idx)
            if batch_idx in improves_at:
                best = batch_idx
        if (batch_idx > epochs - 1) or (
                patience > 0 and batch_idx - best > patience):
            break
        batch_idx += 1
    return steps, evals


@pytest.mark.parametrize("model,epochs,eval_freq,patience", [
    ("maml", 25, 10, 0),      # epoch-bounded, no batch-0 eval
    ("am3", 25, 10, 0),       # batch-0 eval included
    ("maml", 500, 10, 7),     # patience fires between evals
    ("am3", 500, 25, 30),     # patience fires at/after evals
    ("maml", 7, 100, 0),      # ends before first eval
])
def test_step_accounting_matches_reference(model, epochs, eval_freq,
                                           patience, tmp_path):
    cfg = Config(
        model=model, im_emb_dim=IM_DIM, text_emb_dim=TXT_DIM,
        im_hid_dim=(8,), prototype_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=1, num_test_adapt_steps=1,
        batch_size=2, epochs=epochs, eval_freq=eval_freq,
        patience=patience, num_ep_test=4, lr=1e-3, optim="adam",
        dropout=0.0, text_encoder="precomputed", step_size=0.1,
        prng_impl="threefry2x32")
    # num_query_eval = int(100/3) = 33 with num_shots 2 -> 35 per class
    # minimum (the samplers fail fast on thinner classes)
    cs, table, ids = synthetic_class_set(
        num_classes=8, images_per_class=36, im_dim=IM_DIM,
        text_dim=TXT_DIM, seed=0)
    import jax.numpy as jnp
    mk = lambda q: DeviceEpisodeSampler(
        jnp.asarray(table), jnp.asarray(ids), cs,
        EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots, q,
                    IM_DIM, TXT_DIM))
    train_s, eval_s = mk(cfg.num_query_train), mk(cfg.num_query_eval)
    steps = make_steps(cfg, jax.random.PRNGKey(0))

    # record the actual schedule
    train_log_steps = []
    eval_steps = []

    class RecordingWriter(MetricWriter):
        def log(self, metrics, step=None):
            if any(k.startswith("train/") for k in metrics):
                train_log_steps.append(step)
            if any(k.startswith("val/") for k in metrics):
                eval_steps.append(step)
            super().log(metrics, step=step)

    # record which evals improve best (mirror the real val losses):
    # run the loop, then recompute improves_at from the recorded val losses
    writer = RecordingWriter(str(tmp_path), use_wandb=False)
    val_losses = []
    orig_test_loop = loop_mod.test_loop

    def spy_test_loop(*a, **kw):
        out = orig_test_loop(*a, **kw)
        val_losses.append(out["loss"])
        return out

    loop_mod.test_loop = spy_test_loop
    try:
        loop_mod.training_run(cfg, steps, train_s, eval_s, writer,
                              str(tmp_path / "run"), jax.random.PRNGKey(1))
    finally:
        loop_mod.test_loop = orig_test_loop
    writer.finish()

    # derive improves_at exactly as the harness saw it: val_losses[0] is the
    # initial eval (best seed); subsequent entries align with eval_steps
    best_loss = val_losses[0]
    improves_at = set()
    for step, loss in zip(eval_steps, val_losses[1:]):
        if loss < best_loss:
            best_loss = loss
            improves_at.add(step)

    want_steps, want_evals = reference_simulation(
        epochs, eval_freq, patience, eval_at_zero=(model == "am3"),
        improves_at=improves_at)

    assert train_log_steps == want_steps, (
        len(train_log_steps), len(want_steps),
        train_log_steps[-3:], want_steps[-3:])
    assert eval_steps == want_evals, (eval_steps, want_evals)
