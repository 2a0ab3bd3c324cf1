"""Export a trained run as a reference-format torch checkpoint.

Usage::

    python -m fumi_tpu.cli.export_torch <run_dir> <out.pth.tar> [--ckpt]

``<run_dir>`` is a run directory written by the trainer (holding
``config.json`` plus orbax ``best/`` / ``ckpt/``). The output is the
reference's checkpoint pickle ``{batch_idx, state_dict, best_loss,
optimizer, args}`` (ref fumi/utils/utils.py:406-419), restorable by the
reference's ``load_checkpoint`` — the reverse of importing a
``best.pth.tar`` via ``--checkpoint``. ``--ckpt`` exports the most recent
checkpoint instead of the best one.

Optimizer moments transfer too: the optax Adam ``mu``/``nu``/``count``
(or SGD trace) are written as per-param torch ``exp_avg``/``exp_avg_sq``/
``step`` entries, so a run moved BACK to the reference keeps its
optimizer state.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main(argv=None) -> str:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("run_dir", help="run directory (with config.json)")
    p.add_argument("out", help="output .pth.tar path")
    p.add_argument("--ckpt", action="store_true",
                   help="export ckpt/ (latest) instead of best/")
    args = p.parse_args(argv)

    from fumi_tpu import interop
    from fumi_tpu.core.config import config_from_json
    from fumi_tpu.train import checkpoint as ckpt_lib
    from fumi_tpu.train.steps import build_family, make_opt

    cfg_path = os.path.join(args.run_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(f"{args.run_dir} has no config.json — not a run "
                         "directory written by this framework's trainer")
    cfg = config_from_json(cfg_path)
    if cfg.model not in interop.FAMILIES:
        raise SystemExit(
            f"--model {cfg.model} has no reference checkpoint format "
            f"(exportable: {interop.FAMILIES})")

    import jax
    if cfg.model == "clip":
        # CLIP is not a Family (it has its own supervised loop); its
        # params template comes from clip_loop
        from fumi_tpu.train import clip_loop
        _, params_like = clip_loop.make_clip(cfg, jax.random.PRNGKey(0))
    else:
        from fumi_tpu.serve import serving_dictionary
        # vocab.json shipped with token-encoder runs, else the
        # --data_dir pipeline (same resolution serving uses)
        dictionary = serving_dictionary(cfg, args.run_dir)
        params_like = build_family(cfg, jax.random.PRNGKey(cfg.seed),
                                   dictionary).params
    opt = make_opt(cfg)
    params, opt_state, meta = ckpt_lib.load_checkpoint(
        args.run_dir, params_like, opt.init(params_like),
        best=not args.ckpt)
    # --tpu_ema runs are validated/selected/served on the SMOOTHED weights
    # (train/loop.py:eval_view) — export those, so the reference user's
    # eval of the file reproduces the embedded best_loss. The optimizer
    # moments still describe the raw-weight trajectory; a reference-side
    # resume restarts smoothing from the exported point.
    from fumi_tpu.train.loop import eval_view
    export_params = eval_view(cfg, params, opt_state)

    batch_idx = meta.get("batch_idx")
    best_loss = meta.get("best_loss")
    interop.export_torch_checkpoint(
        args.out, export_params, cfg.model, opt_state=opt_state,
        args=dataclasses.asdict(cfg),
        batch_idx=int(batch_idx) if batch_idx is not None else 0,
        best_loss=(float(best_loss) if best_loss is not None
                   else float("inf")),
        lr=cfg.lr, weight_decay=cfg.weight_decay, momentum=cfg.momentum,
        optim=cfg.optim)
    print(f"exported {cfg.model} run {args.run_dir} -> {args.out}")
    return args.out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
