"""Checkpoint / resume over orbax.

Reference mechanism (ref: fumi/utils/utils.py:406-441): a dict
``{batch_idx, state_dict, best_loss, optimizer, args}`` saved as
``ckpt.pth.tar`` every ``--eval_freq`` batches, copied to ``best.pth.tar``
when validation improves, restored on ``--checkpoint``.

Here the same semantics ride on orbax PyTree checkpoints: ``ckpt/`` (most
recent) and ``best/`` directories under the run dir, each holding the param
and optimizer pytrees plus a metadata JSON (batch_idx, best_loss, config).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(run_dir: str, params, opt_state, batch_idx: int,
                    best_loss: float, is_best: bool,
                    extra_meta: Optional[dict] = None) -> None:
    """Save ckpt/, copy to best/ when improved (ref: utils.py:406-419)."""
    run_dir = os.path.abspath(run_dir)
    os.makedirs(run_dir, exist_ok=True)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    cp = _checkpointer()
    tree = {"params": params, "opt_state": opt_state}
    if os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    cp.save(ckpt_dir, tree)
    meta = {"batch_idx": int(batch_idx), "best_loss": float(best_loss)}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(run_dir, "ckpt.meta.json"), "w") as f:
        json.dump(meta, f)

    if is_best:
        best_dir = os.path.join(run_dir, "best")
        if os.path.exists(best_dir):
            shutil.rmtree(best_dir)
        shutil.copytree(ckpt_dir, best_dir)
        shutil.copyfile(os.path.join(run_dir, "ckpt.meta.json"),
                        os.path.join(run_dir, "best.meta.json"))


def load_checkpoint(run_dir: str, params_like, opt_state_like,
                    best: bool = True) -> Tuple[Any, Any, Dict]:
    """Restore params + opt state (ref: utils.py:422-441).

    ``params_like``/``opt_state_like`` provide the pytree structure/shapes.
    """
    run_dir = os.path.abspath(run_dir)
    name = "best" if best else "ckpt"
    path = os.path.join(run_dir, name)
    cp = _checkpointer()
    restored = cp.restore(
        path, item={"params": params_like, "opt_state": opt_state_like})
    meta_path = os.path.join(run_dir, f"{name}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    print(f"Loaded {path}, trained to batch {meta.get('batch_idx')} "
          f"with best loss {meta.get('best_loss')}")
    return restored["params"], restored["opt_state"], meta
