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


# ---------------------------------------------------------------------------
# Multi-host checkpoint format: one self-describing .npz per host.
#
# The artifact policy is "every process saves its own COMPLETE copy into
# its own run dir" (trees are host-local numpy by then — _host_local).
# Orbax cannot express that: its multi-process save treats the save as a
# POD-WIDE collective over one shared directory and distributes the
# array writes across processes (under OCDBT, routes them through a
# coordinator into process 0's database) — so every host except one got
# a metadata-only "checkpoint" that failed with NOT_FOUND on first
# read. This went unnoticed while multi-host checkpoints were only ever
# WRITTEN; the pod kill/resume test (tests/test_distributed.py:
# test_four_process_kill_then_auto_resume) is the first reader.
# Multi-host runs therefore serialize the host-local tree directly:
# leaves keyed by flatten order + key-path string (validated against
# the restore template), no cross-process coordination at all.
# load_checkpoint sniffs the format, so single-process tools (serve,
# interop export, --checkpoint) read pod-written checkpoints unchanged.
# ---------------------------------------------------------------------------

_NP_TREE_FILE = "np_tree.npz"


def _leaf_key(i: int, path) -> str:
    import jax
    return f"{i:05d}|" + jax.tree_util.keystr(path)


def _save_np_tree(dirpath: str, tree) -> None:
    import jax
    import numpy as np
    os.makedirs(dirpath, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_leaf_key(i, p): np.asarray(leaf)
              for i, (p, leaf) in enumerate(flat)}
    np.savez_compressed(os.path.join(dirpath, _NP_TREE_FILE), **arrays)


def np_tree_path(dirpath: str) -> str:
    return os.path.join(dirpath, _NP_TREE_FILE)


def _restore_np_tree(dirpath: str, template):
    import jax
    import numpy as np
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    with np.load(np_tree_path(dirpath)) as data:
        leaves = []
        for i, (path, like) in enumerate(flat):
            key = _leaf_key(i, path)
            if key not in data:
                raise ValueError(
                    f"checkpoint {dirpath} has no leaf {key!r} — the "
                    "saved tree structure does not match the restore "
                    f"template (template leaf count {len(flat)}, saved "
                    f"{len(data.files)})")
            arr = data[key]
            if hasattr(like, "shape") and tuple(arr.shape) != \
                    tuple(np.shape(like)):
                raise ValueError(
                    f"checkpoint {dirpath} leaf {key!r}: saved shape "
                    f"{arr.shape} != template {np.shape(like)}")
            leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _host_local(tree):
    """Fetch a pytree to host numpy before serializing.

    Fetching first means a multi-host run saves plain local arrays per host
    instead of relying on orbax's distributed-write path (each host keeps a
    complete, identical checkpoint; see core/distributed.py artifact
    policy). Most leaves are replicated (addressable from every process);
    mp-sharded weights from the pjit engine span non-addressable devices in
    a multi-host run — ``host_fetch`` re-places those replicated first."""
    import jax
    from fumi_tpu.core.mesh import host_fetch
    return jax.tree.map(host_fetch, tree)


def save_checkpoint(run_dir: str, params, opt_state, batch_idx: int,
                    best_loss: float, is_best: bool,
                    extra_meta: Optional[dict] = None) -> None:
    """Save ckpt/, copy to best/ when improved (ref: utils.py:406-419).

    CRASH-ATOMIC: the new state is written to a ``.new`` staging dir,
    the previous dir is renamed ASIDE (never rmtree'd in place — a kill
    mid-rmtree leaves a partially-deleted tensorstore under a stale
    meta, exactly what the pod kill/resume test caught), the staging dir
    is renamed in (rename is atomic on POSIX), the meta file is replaced
    last, and only then is the old state deleted. A SIGKILL at ANY point
    leaves either a complete (ckpt, meta) pair — possibly one save old —
    or no ckpt dir at all (resumable discovery requires the dir, so a
    mid-swap run is skipped, never half-restored). Before this,
    --tpu_auto_resume could hit the gutted dir and silently start FRESH
    on every host — losing the run's progress exactly when recovery
    mattered (tests/test_distributed.py:
    test_four_process_kill_then_auto_resume)."""
    import jax
    run_dir = os.path.abspath(run_dir)
    os.makedirs(run_dir, exist_ok=True)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    tree = _host_local({"params": params, "opt_state": opt_state})
    if jax.process_count() > 1:
        # per-host self-contained format — see the block comment above
        write = lambda staging: _save_np_tree(staging, tree)
    else:
        cp = _checkpointer()
        write = lambda staging: cp.save(staging, tree)
    _atomic_swap_in(ckpt_dir, write)
    meta = {"batch_idx": int(batch_idx), "best_loss": float(best_loss)}
    if extra_meta:
        meta.update(extra_meta)
    meta_tmp = os.path.join(run_dir, "ckpt.meta.json.new")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, os.path.join(run_dir, "ckpt.meta.json"))

    if is_best:
        best_dir = os.path.join(run_dir, "best")
        _atomic_swap_in(best_dir,
                        lambda staging: shutil.copytree(ckpt_dir, staging))
        # copy-to-tmp + atomic replace, like ckpt.meta.json: a kill mid
        # plain copyfile would leave a truncated best.meta.json that
        # crashes a later best-restore's json.load
        best_meta_tmp = os.path.join(run_dir, "best.meta.json.new")
        shutil.copyfile(os.path.join(run_dir, "ckpt.meta.json"),
                        best_meta_tmp)
        os.replace(best_meta_tmp, os.path.join(run_dir, "best.meta.json"))

    _wandb_save(run_dir, is_best)


def _atomic_swap_in(final_dir: str, write_to) -> None:
    """Populate ``final_dir`` crash-atomically: ``write_to(staging)``
    builds the content in ``<final>.new``, the old dir is renamed aside
    to ``<final>.old``, the staging dir renamed in, and the old content
    deleted last. Every transition of ``final_dir`` itself is a rename;
    stale ``.new``/``.old`` leftovers from a previous crash are cleared
    first (and are never matched by resumable discovery, which looks for
    the exact ``ckpt``/``best`` names)."""
    staging, old = final_dir + ".new", final_dir + ".old"
    if os.path.exists(old) and not os.path.exists(final_dir):
        # crash landed between the two renames of a previous save: the
        # aside-renamed dir IS the last good state — restore it rather
        # than deleting it as a stale leftover (it would otherwise be
        # the only intact copy)
        os.rename(old, final_dir)
    for leftover in (staging, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    write_to(staging)
    if os.path.exists(final_dir):
        os.rename(final_dir, old)
    os.rename(staging, final_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def _wandb_save(run_dir: str, is_best: bool) -> None:
    """Best-effort checkpoint upload to a live wandb run (the reference
    wandb.saves both checkpoint files, ref: utils.py:406-419) — this is
    what makes ``--checkpoint <run_path>`` restore round-trip."""
    try:
        import wandb
        if getattr(wandb, "run", None) is None:
            return
        names = ["ckpt", "ckpt.meta.json"] + \
            (["best", "best.meta.json"] if is_best else [])
        for n in names:
            p = os.path.join(run_dir, n)
            if os.path.isdir(p):
                # orbax payloads are NESTED (d/<hash>, ocdbt.process_0/...);
                # a single-level glob would skip them and the later
                # run-path restore would download an unrestorable subset
                for root, _dirs, files in os.walk(p):
                    for fname in files:
                        wandb.save(os.path.join(root, fname),
                                   base_path=run_dir, policy="now")
            elif os.path.exists(p):
                wandb.save(p, base_path=run_dir, policy="now")
    except Exception:
        pass  # logging-side failure must never kill a training step


def find_latest_resumable(log_dir: str,
                          model: Optional[str] = None,
                          sweep_seeds: Optional[list] = None
                          ) -> Optional[str]:
    """Newest run dir under ``log_dir/runs`` holding a ckpt/ checkpoint.

    The crash-recovery discovery step for ``--tpu_auto_resume``: ranked by
    the checkpoint metadata's mtime (the moment of the last save), so the
    most recently *progressing* run wins, not the most recently created.
    ``model`` filters to runs of that family — log_dir defaults to a
    shared ./results, and restoring another family's pytree would die on a
    structure mismatch at startup. ``sweep_seeds`` (a seed list) filters
    to SWEEP checkpoints of exactly that seed set; None (default) filters
    sweep checkpoints OUT (their pytrees carry a leading seed axis)."""
    runs_dir = os.path.join(log_dir, "runs")
    if not os.path.isdir(runs_dir):
        return None
    best_path, best_t = None, -1.0
    for name in os.listdir(runs_dir):
        run = os.path.join(runs_dir, name)
        meta = os.path.join(run, "ckpt.meta.json")
        if os.path.exists(meta) and os.path.isdir(os.path.join(run, "ckpt")):
            try:
                with open(meta) as f:
                    md = json.load(f)
            except (OSError, ValueError):
                continue  # unreadable metadata: not resumable
            if model is not None and md.get("model") not in (None, model):
                continue
            if sweep_seeds is None:
                if md.get("sweep_seeds"):
                    # sweep checkpoints hold SEED-STACKED pytrees — a
                    # single-run auto-resume can't restore them
                    continue
            elif list(md.get("sweep_seeds") or []) != list(sweep_seeds):
                # a sweep resumes only its own seed set (anything else
                # is a different experiment or a single run)
                continue
            t = os.path.getmtime(meta)
            if t > best_t:
                best_t, best_path = t, run
    return best_path


def resolve_checkpoint(checkpoint: str, model: str,
                       entity: str = "multimodal-image-cls",
                       project: Optional[str] = None,
                       dest_root: str = "./checkpoints") -> str:
    """Resolve ``--checkpoint`` to a local run dir.

    The reference pulls ``best.pth.tar`` from a wandb run path into
    ``./checkpoints/{model}/{checkpoint}`` (ref: fumi/main.py:61-76). Note
    the reference composes bare run ids as
    ``multimodal-image-cls/{model}/{run_id}`` even though its own runs log
    under ``args.wandb_entity/args.wandb_project`` — here bare ids compose
    with the CONFIG's entity/project (``cfg.wandb_entity`` /
    ``cfg.wandb_project``), so checkpoints this framework logged are
    actually findable (documented deviation). Resolution:

    - an existing local directory is used as-is;
    - an existing local FILE (a reference ``best.pth.tar``) is passed
      through to the torch importer;
    - otherwise the value is a wandb run path — full
      ``entity/project/run_id`` or a bare run id — and the run's
      checkpoint files are downloaded into
      ``dest_root/{entity}/{project}/{run_id}`` (full path in the key so
      same-id runs under different projects cannot collide). Both this
      framework's runs (orbax ``best/``/``ckpt/``) and REFERENCE wandb
      runs (torch ``best.pth.tar``/``ckpt.pth.tar``) resolve — the
      latter return the downloaded file path, which ``load_checkpoint``
      routes through :mod:`fumi_tpu.interop`.
    """
    if os.path.isdir(checkpoint):
        return checkpoint
    if os.path.isfile(checkpoint):
        # a reference torch checkpoint file (best.pth.tar) — passed
        # through; load_checkpoint routes files to the torch importer
        return checkpoint

    def _payload(d: str) -> Optional[str]:
        """What a downloaded run dir holds: this framework's orbax dirs,
        or the REFERENCE's torch files (best/ckpt.pth.tar — what its
        save_checkpoint wandb-uploads, ref utils.py:406-419)."""
        if os.path.isdir(os.path.join(d, "best")) or \
                os.path.isdir(os.path.join(d, "ckpt")):
            return d
        for name in ("best.pth.tar", "ckpt.pth.tar"):  # prefer best,
            #  matching the reference's restore (ref main.py:61-76)
            if os.path.isfile(os.path.join(d, name)):
                return os.path.join(d, name)
        return None

    run_path = (checkpoint if checkpoint.count("/") == 2
                else f"{entity}/{project or model}/{checkpoint}")
    dest = os.path.join(dest_root, *run_path.split("/"))
    cached = _payload(dest)
    if cached is not None:
        return cached  # already downloaded (only complete downloads land
        #                here — see the atomic rename below)
    # download into a scratch dir and publish with one atomic rename, so a
    # failure partway through can never leave a half-download at `dest`
    # that this cache check would then trust forever
    tmp = dest + ".partial"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        import wandb
        api = wandb.Api()
        run = api.run(run_path)
        os.makedirs(tmp, exist_ok=True)
        for f in run.files():
            # checkpoint payloads + metadata only
            if f.name.startswith(("best", "ckpt")):
                f.download(root=tmp, replace=True)
    except FileNotFoundError:
        raise
    except Exception as e:
        shutil.rmtree(tmp, ignore_errors=True)
        raise FileNotFoundError(
            f"--checkpoint {checkpoint!r} is neither a local run dir nor a "
            f"retrievable wandb run path ({type(e).__name__}: {e})") from e
    if _payload(tmp) is None:
        shutil.rmtree(tmp, ignore_errors=True)
        raise FileNotFoundError(
            f"wandb run {run_path} had no checkpoint payload (orbax "
            "best//ckpt/ dirs or reference best/ckpt.pth.tar files)")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.rename(tmp, dest)
    return _payload(dest)


def load_checkpoint(run_dir: str, params_like, opt_state_like,
                    best: bool = True) -> Tuple[Any, Any, Dict]:
    """Restore params + opt state (ref: utils.py:422-441).

    ``params_like``/``opt_state_like`` provide the pytree structure/shapes.

    ``run_dir`` may also be a reference torch checkpoint FILE
    (``best.pth.tar``, ref utils.py:406-419) — those route to
    :mod:`fumi_tpu.interop`, which maps the state_dict into the params
    pytree and carries torch Adam/SGD moments into the optax state, so
    reference users bring their trained models (and keep training them)
    without retraining.
    """
    run_dir = os.path.abspath(run_dir)
    if os.path.isfile(run_dir):
        from fumi_tpu import interop
        return interop.load_torch_checkpoint(run_dir, params_like,
                                             opt_state_like)
    name = "best" if best else "ckpt"
    if best and not os.path.isdir(os.path.join(run_dir, "best")) and \
            os.path.isdir(os.path.join(run_dir, "ckpt")):
        # a run checkpointed before any val improvement (or a wandb run
        # that only uploaded ckpt/) has no best/ — fall back explicitly
        print(f"no best/ under {run_dir}; loading ckpt/ instead")
        name = "ckpt"
    path = os.path.join(run_dir, name)
    meta_path = os.path.join(run_dir, f"{name}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    try:
        template = _host_local({"params": params_like,
                                "opt_state": opt_state_like})
        if os.path.exists(np_tree_path(path)):
            # pod-written per-host format (multi-host runs) — readable
            # from any process count
            restored = _restore_np_tree(path, template)
        else:
            restored = _checkpointer().restore(path, item=template)
    except Exception as e:
        # a structure mismatch is usually a config mismatch between the
        # saving and restoring runs — surface the saved flags alongside
        # orbax's error. Phrased conditionally: the same exception also
        # covers genuinely corrupt/truncated checkpoints, where the flags
        # DO match and the hint must not send the operator flag-chasing.
        saved_args = meta.get("args") or {}
        hints = []
        for flag in ("ema", "optim", "skip_nonfinite", "model"):
            if flag in saved_args:
                hints.append(f"{flag}={saved_args[flag]!r}")
        hint = (f" The checkpoint was written with {', '.join(hints)} — "
                "if your current config differs (e.g. --tpu_ema/--optim), "
                "restore with a matching one; otherwise the checkpoint "
                "files themselves may be incomplete or corrupt."
                if hints else "")
        raise ValueError(
            f"cannot restore {path}: {type(e).__name__}: {e}.{hint}"
        ) from e
    print(f"Loaded {path}, trained to batch {meta.get('batch_idx')} "
          f"with best loss {meta.get('best_loss')}")
    return restored["params"], restored["opt_state"], meta
