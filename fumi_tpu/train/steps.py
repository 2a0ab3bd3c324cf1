"""Per-model-family jitted train/eval steps.

Each family exposes the same contract (the JAX equivalent of the reference's
``model.evaluate(batch, optimizer, task=...)`` episode methods,
ref: am3.py:128-212, maml.py:134-193, fumi.py:115-196):

- ``train_step(params, opt_state, episode, rng) -> (params, opt_state,
  metrics)`` — one meta-batch: episode loss, outer grads, optax update.
  Compiled once; with the device sampler the episode itself is produced
  inside the same XLA program (see :func:`fuse_sampler`).
- ``eval_step(params, episode, rng) -> metrics`` — no grads; MAML/FuMI run
  the long test-time adaptation scan (``--num_test_adapt_steps``,
  ref: utils.py:176-179) without any reverse-mode storage.

Metrics are device scalars (plus per-query predictions for artifacts); the
host only ever sees them when the loop logs.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fumi_tpu.core.config import Config
from fumi_tpu.core.episode import Episode
from fumi_tpu.metalearn.inner_loop import (fumi_episode_loss,
                                           maml_episode_loss)
from fumi_tpu.models import am3 as am3_mod
from fumi_tpu.models import fumi as fumi_mod
from fumi_tpu.models import mlp
from fumi_tpu.models import text_encoders
from fumi_tpu.ops import fewshot, metrics as metrics_ops


class FamilySteps(NamedTuple):
    """Jitted steps + params for one model family."""
    params: any
    opt: optax.GradientTransformation
    train_step: Callable  # (params, opt_state, episode, rng) -> (p, s, m)
    eval_step: Callable  # (params, episode, rng) -> metrics
    model: any = None


def _make_text_encoder(cfg: Config, key, dictionary):
    return text_encoders.make_text_encoder(
        cfg.text_encoder, key, cfg.text_emb_dim, dictionary=dictionary,
        pooling_strat=cfg.pooling_strat, fine_tune=cfg.fine_tune)


# ---------------------------------------------------------------------------
# MAML
# ---------------------------------------------------------------------------

def make_maml_steps(cfg: Config, key: jax.Array,
                    opt: optax.GradientTransformation) -> FamilySteps:
    """PureImageNetwork + MAML engine (ref: maml.py:15-33,134-193)."""
    params = mlp.init(key, cfg.im_emb_dim, cfg.num_ways, cfg.im_hid_dim)

    def loss_for(n_steps):
        def loss_fn(p, episode):
            return maml_episode_loss(
                mlp.apply, p, episode, n_steps=n_steps,
                step_size=cfg.step_size, first_order=cfg.first_order)
        return loss_fn

    train_loss = loss_for(cfg.num_train_adapt_steps)
    eval_loss = loss_for(cfg.num_test_adapt_steps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, opt_state, episode, rng):
        (loss, aux), grads = jax.value_and_grad(
            train_loss, has_aux=True)(p, episode)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, {"loss": loss, "acc": aux["acc"]}

    @jax.jit
    def eval_step(p, episode, rng):
        loss, aux = eval_loss(p, episode)
        return {"loss": loss, "acc": aux["acc"], "preds": aux["preds"],
                "targets": episode.query_y}

    return FamilySteps(params=params, opt=opt, train_step=train_step,
                       eval_step=eval_step)


# ---------------------------------------------------------------------------
# FuMI
# ---------------------------------------------------------------------------

def make_fumi_steps(cfg: Config, key: jax.Array,
                    opt: optax.GradientTransformation,
                    dictionary=None) -> FamilySteps:
    """FUMI hypernet + dual-update engine (ref: fumi.py:18-218)."""
    k_enc, k_par = jax.random.split(key)
    enc = _make_text_encoder(cfg, k_enc, dictionary)
    model = fumi_mod.FUMI(
        n_way=cfg.num_ways, im_emb_dim=cfg.im_emb_dim,
        im_hid_dim=tuple(cfg.im_hid_dim), text_encoder=enc,
        text_emb_dim=enc.out_dim, text_hid_dim=cfg.text_hid_dim,
        dropout_rate=cfg.dropout, norm_hypernet=cfg.norm_hypernet,
        fine_tune=cfg.fine_tune, init_bias=cfg.hypernet_bias_init,
        init_all_layers=cfg.init_all_layers)
    params = model.init_params(k_par)

    def loss_for(n_steps, train):
        def loss_fn(p, episode, rng):
            return fumi_episode_loss(
                model, p, episode, n_steps=n_steps,
                step_size=cfg.step_size, rng=rng, train=train)
        return loss_fn

    train_loss = loss_for(cfg.num_train_adapt_steps, True)
    eval_loss = loss_for(cfg.num_test_adapt_steps, False)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, opt_state, episode, rng):
        (loss, aux), grads = jax.value_and_grad(
            train_loss, has_aux=True)(p, episode, rng)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, {"loss": loss, "acc": aux["acc"]}

    @jax.jit
    def eval_step(p, episode, rng):
        loss, aux = eval_loss(p, episode, rng)
        return {"loss": loss, "acc": aux["acc"], "preds": aux["preds"],
                "targets": episode.query_y}

    return FamilySteps(params=params, opt=opt, train_step=train_step,
                       eval_step=eval_step, model=model)


# ---------------------------------------------------------------------------
# AM3
# ---------------------------------------------------------------------------

def make_am3_steps(cfg: Config, key: jax.Array,
                   opt: optax.GradientTransformation,
                   dictionary=None) -> FamilySteps:
    """AM3 prototypical step (ref: am3.py:16-212).

    The reference's per-step flow — support fwd, query fwd, λ override,
    prototypes, prototypical CE, sklearn metrics — is one fused XLA program,
    including the metrics (confusion-matrix form, device-side).
    """
    k_enc, k_par = jax.random.split(key)
    enc = _make_text_encoder(cfg, k_enc, dictionary)
    model = am3_mod.AM3(
        im_emb_dim=cfg.im_emb_dim, prototype_dim=cfg.prototype_dim,
        text_encoder=enc, text_emb_dim=enc.out_dim,
        text_hid_dim=cfg.text_hid_dim, dropout=cfg.dropout,
        fine_tune=cfg.fine_tune, lamda_fixed=cfg.lamda_fixed)
    params = model.init_params(k_par)

    def episode_eval(p, episode, rng, train):
        loss, aux = model.episode_loss(p, episode, cfg.num_ways,
                                       rng=rng, train=train)
        preds = fewshot.predict_classes(aux["prototypes"], aux["query_emb"])
        m = metrics_ops.episode_metrics(episode.query_y, preds,
                                        cfg.num_ways)
        m.update(loss=loss, avg_lamda=aux["avg_lamda"], preds=preds,
                 targets=episode.query_y, lamda=aux["lamda"][..., 0])
        return loss, m

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, opt_state, episode, rng):
        def loss_fn(p_):
            loss, m = episode_eval(p_, episode, rng, True)
            return loss, m
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, m

    @jax.jit
    def eval_step(p, episode, rng):
        _, m = episode_eval(p, episode, rng, False)
        return m

    return FamilySteps(params=params, opt=opt, train_step=train_step,
                       eval_step=eval_step, model=model)


# ---------------------------------------------------------------------------
# Sampler fusion
# ---------------------------------------------------------------------------

def fuse_sampler(step_fn: Callable, sampler) -> Callable:
    """Fuse device-side episode sampling into a step function.

    ``fused(params, ..., key)`` draws the episode from ``sampler.sample``
    INSIDE the same jit — sampling, gathers, adaptation, and the optimizer
    update compile to one XLA program with zero per-step host transfers
    (the reference pays a host→device copy of every episode leaf per step,
    ref: fumi.py:130-140).
    """
    @jax.jit
    def fused(*args):
        *head, key = args
        k_sample, k_step = jax.random.split(key)
        episode = sampler.sample(k_sample)
        return step_fn(*head, episode, k_step)
    return fused


def make_steps(cfg: Config, key: jax.Array, dictionary=None) -> FamilySteps:
    """Model factory dispatch (ref: utils.py:232-274 init_model)."""
    # scheduler quirk: only AM3 steps the lr schedule (ref: am3.py:195-196;
    # fumi.py:230-235 unpacks but never steps it)
    from fumi_tpu.train.optim import init_optim
    opt = init_optim(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum,
                     cfg.num_warmup_steps, cfg.epochs,
                     schedule_active=(cfg.model == "am3"))
    if cfg.model == "maml":
        return make_maml_steps(cfg, key, opt)
    if cfg.model == "fumi":
        return make_fumi_steps(cfg, key, opt, dictionary)
    if cfg.model == "am3":
        return make_am3_steps(cfg, key, opt, dictionary)
    raise NotImplementedError(
        f"model {cfg.model!r} (CLIP uses fumi_tpu.train.clip_loop)")
