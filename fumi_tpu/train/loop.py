"""Episodic training/eval harness (MAML / FuMI / AM3 families).

Reproduces the reference harness semantics (ref: am3.py:215-367,
maml.py:36-131, fumi.py:220-326) — including the documented quirks:

- an initial validation pass seeds ``best_loss`` (ref: am3.py:222-224).
- validation + checkpoint every ``--eval_freq`` batches; AM3 evaluates at
  batch 0 as well (``batch_idx % eval_freq == 0``, ref: am3.py:260), while
  MAML/FuMI skip batch 0 (``and batch_idx != 0``, ref: maml.py:70,
  fumi.py:257).
- early stop on ``--patience`` val-loss plateau or ``--epochs`` meta-batches
  (ref: am3.py:295-297).
- KeyboardInterrupt is caught so a manual stop still proceeds to
  best-checkpoint reload + test (ref: am3.py:298-299).
- AM3 and FuMI reload the best checkpoint after training; MAML returns the
  LAST model (ref: maml.py:107 — no reload).
- test loops process ``max_num_batches + 1`` batches (the reference breaks
  AFTER processing when ``batch_idx > max-1``, ref: am3.py:364-365) — kept
  for eval-protocol parity.

Performance notes vs the reference: metrics are logged one step late so the
host never blocks the device pipeline on the current step, and with the
device sampler the whole step (sampling included) is one XLA program.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from fumi_tpu.core.config import Config
from fumi_tpu.data.sampler import DeviceEpisodeSampler
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train.logging import AverageMeter, MetricWriter
from fumi_tpu.train.steps import FamilySteps, fuse_sampler

AM3_TRAIN_KEYS = ("loss", "acc", "f1", "prec", "rec", "avg_lamda")


def _episode_fn(sampler) -> Callable:
    """Uniform interface: f(key) -> episode (device or host sampler)."""
    if isinstance(sampler, DeviceEpisodeSampler):
        sample = jax.jit(sampler.sample)
        return lambda key: sample(key)
    return lambda key: sampler.sample()


def test_loop(cfg: Config, steps: FamilySteps, params, sampler,
              max_num_batches: int, rng: jax.Array,
              collect_artifacts: bool = False) -> Dict:
    """Evaluate on val/test episodes (ref: am3.py:308-367, fumi.py:302-326).

    Returns averaged metrics; with ``collect_artifacts``, also gathers
    per-episode predictions/targets/ids/λ for the CSV artifact
    (ref: main.py:128-136).
    """
    meters: Dict[str, AverageMeter] = {}
    preds: List = []
    targets: List = []
    query_idx: List = []
    support_idx: List = []
    support_lamdas: List = []
    episode_of = _episode_fn(sampler)

    batch_idx = 0
    while True:
        key = jax.random.fold_in(rng, batch_idx)
        k_ep, k_step = jax.random.split(key)
        episode = episode_of(k_ep)
        m = steps.eval_step(params, episode, k_step)
        for k, v in m.items():
            if k in ("preds", "targets", "lamda"):
                continue
            meters.setdefault(k, AverageMeter()).update(float(v))
        if collect_artifacts:
            preds += np.asarray(m["preds"]).reshape(-1).tolist()
            targets += np.asarray(m["targets"]).reshape(-1).tolist()
            query_idx += np.asarray(episode.query_ids).reshape(-1).tolist()
            support_idx += np.asarray(episode.support_ids).reshape(-1).tolist()
            if "lamda" in m:
                support_lamdas += np.asarray(m["lamda"]).reshape(-1).tolist()
        # ref breaks AFTER processing when batch_idx > max-1 → max+1 batches
        if batch_idx > max_num_batches - 1:
            break
        batch_idx += 1

    out = {k: meter.avg for k, meter in meters.items()}
    if collect_artifacts:
        out.update(preds=preds, targets=targets, query_idx=query_idx,
                   support_idx=support_idx, support_lamdas=support_lamdas)
    return out


def training_run(cfg: Config, steps: FamilySteps, train_sampler, val_sampler,
                 writer: MetricWriter, run_dir: str,
                 rng: jax.Array) -> any:
    """Train loop for the episodic families. Returns final params."""
    is_am3 = cfg.model == "am3"
    eval_at_zero = is_am3  # ref: am3.py:260 vs maml.py:70 / fumi.py:257
    reload_best = cfg.model in ("am3", "fumi")  # ref: maml.py:107 no reload

    params = steps.params
    opt_state = steps.opt.init(params)
    max_test_batches = cfg.max_test_batches // 2  # ref: main.py:82,85,95

    k_init, k_train, k_val = jax.random.split(rng, 3)
    val_m = test_loop(cfg, steps, params, val_sampler, max_test_batches,
                      k_init)
    best_loss = val_m["loss"]
    best_batch_idx = 0
    print(f"\ninitial loss: {best_loss}, acc: {val_m['acc']}")

    # fused sampling path: episode drawn inside the train-step XLA program
    fused = None
    if isinstance(train_sampler, DeviceEpisodeSampler):
        fused = fuse_sampler(steps.train_step, train_sampler)

    pending = None  # (batch_idx, metrics) logged one step late
    try:
        batch_idx = 0
        while True:
            key = jax.random.fold_in(k_train, batch_idx)
            if fused is not None:
                params, opt_state, m = fused(params, opt_state, key)
            else:
                k_ep, k_step = jax.random.split(key)
                episode = train_sampler.sample()
                params, opt_state, m = steps.train_step(
                    params, opt_state, episode, k_step)

            if pending is not None:
                _log_train(writer, cfg, *pending, is_am3)
            pending = (batch_idx, m)

            if batch_idx % cfg.eval_freq == 0 and \
                    (eval_at_zero or batch_idx != 0):
                _log_train(writer, cfg, *pending, is_am3)
                pending = None
                val_m = test_loop(cfg, steps, params, val_sampler,
                                  max_test_batches,
                                  jax.random.fold_in(k_val, batch_idx))
                is_best = val_m["loss"] < best_loss
                if is_best:
                    best_loss = val_m["loss"]
                    best_batch_idx = batch_idx
                writer.log({f"val/{k}": v for k, v in val_m.items()},
                           step=batch_idx)
                ckpt_lib.save_checkpoint(
                    run_dir, params, opt_state, batch_idx, best_loss,
                    is_best, extra_meta={"model": cfg.model})
                print(f"\nBatch {batch_idx + 1}/{cfg.epochs}: "
                      f"val/loss: {val_m['loss']}, val/acc: {val_m['acc']}")

            # ref: am3.py:295-297 — break on max iters or patience
            if (batch_idx > cfg.epochs - 1) or (
                    cfg.patience > 0 and
                    batch_idx - best_batch_idx > cfg.patience):
                break
            batch_idx += 1
    except KeyboardInterrupt:
        pass
    if pending is not None:
        _log_train(writer, cfg, *pending, is_am3)

    if reload_best and os.path.exists(os.path.join(run_dir, "best")):
        params, opt_state, _ = ckpt_lib.load_checkpoint(
            run_dir, params, opt_state, best=True)
    return params


def _log_train(writer: MetricWriter, cfg: Config, batch_idx: int, m: Dict,
               is_am3: bool) -> None:
    keys = AM3_TRAIN_KEYS if is_am3 else ("loss", "acc")
    rec = {f"train/{k}": float(m[k]) for k in keys if k in m}
    rec["num_episodes"] = (batch_idx + 1) * cfg.batch_size
    writer.log(rec, step=batch_idx)
