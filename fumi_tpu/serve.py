"""Few-shot serving: adapt once, classify many.

The reference is a research harness with no inference story — after
training you get wandb metrics and a CSV. Production serving of a few-shot
model is a different shape: **adapt once on a support set, then classify a
stream of queries** against the frozen adapted state. This module provides
that surface for every family:

- MAML / FuMI: run the test-time adaptation once (the expensive 100-step
  scan), keep the adapted parameters, serve queries with a single forward.
- AM3: compute the λ-fused class prototypes once, serve queries with one
  distance matmul.

Usage::

    clf = FewShotClassifier.from_checkpoint(run_dir, cfg, dictionary)
    clf.adapt(support_images, support_text, support_labels)
    labels = clf.classify(query_images)        # (M,) int labels
    probs = clf.classify(query_images, return_probs=True)

``classify`` is a cached jit; per-call cost is one small forward pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.core.config import Config
from fumi_tpu.metalearn.inner_loop import sgd_inner_update
from fumi_tpu.ops import fewshot
from fumi_tpu.train.steps import build_family


class FewShotClassifier:
    """Adapt-once / classify-many wrapper over a trained model."""

    def __init__(self, cfg: Config, params, dictionary=None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.family = build_family(cfg, jax.random.PRNGKey(cfg.seed),
                                   dictionary)
        self.params = params if params is not None else self.family.params
        self._state = None  # adapted params / prototypes
        self._classify_fn = None

    @classmethod
    def from_checkpoint(cls, run_dir: str, cfg: Config, dictionary=None,
                        best: bool = True) -> "FewShotClassifier":
        from fumi_tpu.train import checkpoint as ckpt_lib
        from fumi_tpu.train.steps import make_opt
        self = cls(cfg, None, dictionary)
        opt = make_opt(cfg)
        params, _, _ = ckpt_lib.load_checkpoint(
            run_dir, self.params, opt.init(self.params), best=best)
        self.params = params
        return self

    # ------------------------------------------------------------------
    def adapt(self, support_im, support_text=None, support_y=None,
              rng: Optional[jax.Array] = None) -> None:
        """Run the one-time adaptation for this support set.

        support_im: (N*K, D) or (N*K, H, W, C); support_y: (N*K,) int in
        [0, num_ways); support_text: (N*K, E) / (N*K, T) for text models.
        """
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        support_im = jnp.asarray(support_im)
        support_y = jnp.asarray(support_y, dtype=jnp.int32)
        if support_text is not None:
            support_text = jnp.asarray(support_text)
        n_steps = cfg.num_test_adapt_steps
        step = cfg.step_size

        if cfg.model == "maml":
            if cfg.im_encoder == "conv4":
                from fumi_tpu.models import conv4 as net
            else:
                from fumi_tpu.models import mlp as net
            apply_fn = net.apply

            def adapt_fn(p):
                def inner(p_, _):
                    g = jax.grad(lambda q: fewshot.cross_entropy(
                        apply_fn(q, support_im), support_y))(p_)
                    return sgd_inner_update(p_, g, step), None
                p_T, _ = jax.lax.scan(inner, p, None, length=n_steps)
                return p_T

            adapted = jax.jit(adapt_fn)(self.params)
            self._state = ("maml", adapted)
            self._classify_fn = jax.jit(lambda q: apply_fn(adapted, q))

        elif cfg.model == "fumi":
            model = self.family.model

            def adapt_fn(p):
                hyper0 = model.get_hyper_params(p, support_text, support_y,
                                                rng=rng)
                im0 = p["im_net"]

                def inner(carry, _):
                    im_p, hyp = carry
                    g_im, g_h = jax.grad(
                        lambda a, b: fewshot.cross_entropy(
                            model.im_forward(a, b, support_im, rng=rng,
                                             train=False), support_y),
                        argnums=(0, 1))(im_p, hyp)
                    return (sgd_inner_update(im_p, g_im, step),
                            hyp - step * g_h), None

                (im_T, hyp_T), _ = jax.lax.scan(inner, (im0, hyper0), None,
                                                length=n_steps)
                return im_T, hyp_T

            im_T, hyp_T = jax.jit(adapt_fn)(self.params)
            self._state = ("fumi", (im_T, hyp_T))
            self._classify_fn = jax.jit(
                lambda q: model.im_forward(im_T, hyp_T, q, rng=rng,
                                           train=False))

        elif cfg.model == "am3":
            model = self.family.model

            def protos_fn(p):
                im_e, tx_e, lam = model.forward(
                    p, support_text[None], support_im[None], rng=rng,
                    train=False)
                if model.lamda_fixed == 0:
                    lam = jnp.zeros_like(lam)
                elif model.lamda_fixed == 1:
                    lam = jnp.ones_like(lam)
                return fewshot.get_prototypes(
                    im_e, tx_e, lam, support_y[None], cfg.num_ways)[0]

            protos = jax.jit(protos_fn)(self.params)
            self._state = ("am3", protos)
            params = self.params

            def classify(q):
                emb = model.encode_image(params, q[None])[0]
                return fewshot.prototype_logits(protos[None], emb[None])[0]
            self._classify_fn = jax.jit(classify)

        else:
            raise NotImplementedError(
                f"serving for model {cfg.model!r} (CLIP retrieval uses "
                "fumi_tpu.models.clip.CLIP.retrieval_scores)")

    # ------------------------------------------------------------------
    def logits(self, query_im) -> jnp.ndarray:
        if self._classify_fn is None:
            raise RuntimeError("call adapt(...) before classify/logits")
        return self._classify_fn(jnp.asarray(query_im))

    def classify(self, query_im, return_probs: bool = False):
        """(M, ...) query images → (M,) int labels (or (M, N) probs)."""
        logits = self.logits(query_im)
        if return_probs:
            return jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
