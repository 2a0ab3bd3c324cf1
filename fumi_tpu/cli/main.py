"""Experiment driver — the ``fumi/main.py`` equivalent.

Preserves the reference driver's flow (ref: fumi/main.py:19-156): run/log
setup, argument validation, dataset+model+optimizer construction, optional
checkpoint restore, dispatch to the model family's training loop, final test
metrics, and the prediction CSV artifact — which here is written for EVERY
model family, not just AM3 (the reference computes FuMI's test predictions
but discards them, ref: main.py:103-105; BASELINE.md asks for saved
test-task predictions).

TPU-native deltas: device selection becomes mesh construction (all local
devices on the ``dp`` axis by default); episodic data lives in device tables
with sampling fused into the train step; `--dataset synthetic` provides a
self-contained smoke config.

Usage:  python -m fumi_tpu.cli.main --model fumi --num_shots 5 ...
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fumi_tpu.core.config import (Config, TOKEN_TEXT_ENCODERS,
                                  config_from_args)
from fumi_tpu.core.episode import EpisodeSpec
from fumi_tpu.core import mesh as mesh_lib
from fumi_tpu.data.sampler import DeviceEpisodeSampler, HostEpisodeSampler
from fumi_tpu.data.supervised import supervised_from_class_set
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train import clip_loop
from fumi_tpu.train.logging import MetricWriter
from fumi_tpu.train.loop import test_loop, training_run
from fumi_tpu.train.steps import make_steps
from fumi_tpu.train.optim import init_optim


def _load_data(cfg: Config):
    """Dataset dispatch (ref: data.py:25-86). Returns
    (splits dict, image_table, image_ids, dictionary)."""
    if cfg.dataset in ("inat-anim", "supervised-inat-anim"):
        from fumi_tpu.data.inat_anim import load_inat_anim
        data = load_inat_anim(
            cfg.data_dir, text_encoder=cfg.text_encoder,
            text_type=cfg.text_type,
            remove_stop_words=cfg.remove_stop_words,
            image_embedding_model=cfg.image_embedding_model,
            # conv backbones consume the Zenodo low-res-images.hdf5
            # raw-pixel table instead of precomputed embeddings (the
            # reference's raw-encoder TODO, ref: am3.py:44-46)
            raw_images=(cfg.im_encoder in ("conv4", "resnet12")
                        and cfg.dataset == "inat-anim"))
        dictionary = (data.dictionary.token2id
                      if data.dictionary is not None else {})
        if cfg.dataset == "inat-anim" and \
                cfg.text_encoder in TOKEN_TEXT_ENCODERS:
            # attach the pretrained-vector artifact (actionable error if
            # missing — the reference trains these encoders on real gensim
            # vectors, never random init; ref: common.py:164-196)
            from fumi_tpu.data.vectors import (Vocabulary,
                                               vectors_for_encoder)
            dictionary = Vocabulary(
                dictionary,
                vectors_for_encoder(cfg.text_encoder, cfg.data_dir))
        return data.splits, data.image_table, data.image_ids, dictionary
    if cfg.dataset == "synthetic":
        from fumi_tpu.data.synthetic import (synthetic_dictionary,
                                             synthetic_splits)
        tokens = cfg.text_encoder in TOKEN_TEXT_ENCODERS
        kw = dict(text_tokens=True, vocab_size=128, text_len=12) \
            if tokens else {}
        splits, table, ids = synthetic_splits(
            num_classes=32, images_per_class=64,
            im_dim=cfg.im_emb_dim, text_dim=cfg.text_emb_dim,
            seed=cfg.seed,
            raw_images=(cfg.im_encoder in ("conv4", "resnet12")),
            im_size=cfg.im_size, channels=cfg.im_channels, **kw)
        dictionary = synthetic_dictionary(128) if tokens else {}
        return splits, table, ids, dictionary

    if cfg.dataset == "cub":
        from fumi_tpu.data.cub import load_cub
        splits, table, ids = load_cub(cfg.data_dir)
        return splits, table, ids, {}
    raise NotImplementedError(f"dataset {cfg.dataset!r}")


def _specs(cfg: Config, text_dim: int, tokens: bool):
    train = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                        cfg.num_query_train, cfg.im_emb_dim, text_dim,
                        text_is_tokens=tokens)
    evals = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                        cfg.num_query_eval, cfg.im_emb_dim, text_dim,
                        text_is_tokens=tokens)
    return train, evals


def _samplers(cfg: Config, splits, image_table, image_ids):
    cs = splits["train"]
    text_dim = cs.text_features.shape[-1]
    tokens = cs.text_is_tokens
    train_spec, eval_spec = _specs(cfg, text_dim, tokens)
    if cfg.device_sampler:
        from fumi_tpu.data.sampler import table_storage
        table = table_storage(jnp.asarray(image_table), cfg.compute_dtype)
        ids = jnp.asarray(image_ids)
        # --augment: embedding-space jitter on the TRAIN support set only
        aug = 0.1 if cfg.augment else 0.0
        pg = cfg.pallas_gather
        ar = cfg.allow_replacement
        return (DeviceEpisodeSampler(table, ids, splits["train"], train_spec,
                                     augment_scale=aug,
                                     use_pallas_gather=pg,
                                     allow_replacement=ar),
                DeviceEpisodeSampler(table, ids, splits["val"], eval_spec,
                                     use_pallas_gather=pg,
                                     allow_replacement=ar),
                DeviceEpisodeSampler(table, ids, splits["test"], eval_spec,
                                     use_pallas_gather=pg,
                                     allow_replacement=ar))
    ar = cfg.allow_replacement
    be = cfg.sampler_backend
    train_host = HostEpisodeSampler(image_table, image_ids, splits["train"],
                                    train_spec, seed=cfg.seed,
                                    allow_replacement=ar, backend=be,
                                    augment_scale=0.1 if cfg.augment else 0.0)
    # name the resolved backend at startup: "auto" picks per-box (native
    # when libepisodic.so builds, numpy otherwise) and the two backends'
    # episode STREAMS differ for the same seed — a cross-machine
    # reproducibility trap unless the flag is pinned
    print(f"host sampler backend: {train_host.backend_name} "
          f"(--tpu_sampler_backend {be}; streams are backend-specific "
          "per seed)")
    if cfg.evaluate:
        # --evaluate never reads the train sampler: don't spawn loader
        # processes / a prefetch thread (with raw-image tables each
        # forked worker would pickle-copy hundreds of MB for nothing)
        pass
    elif cfg.num_workers > 1 and train_host.backend_name == "native" \
            and train_host.augment_scale == 0.0:
        # --num_workers N: N loader PROCESSES (the reference's torch
        # DataLoader workers, ref: utils.py:95-98) — counter-addressed
        # native draws let workers compute disjoint episode counters, so
        # the stream is exactly the single-process one (pinned by test)
        from fumi_tpu.data.sampler import MultiprocessSampler
        train_host = MultiprocessSampler(
            train_host, num_workers=cfg.num_workers,
            mp_context=cfg.loader_mp_context)
        print(f"loader: {cfg.num_workers} worker processes "
              f"({cfg.loader_mp_context})")
    elif cfg.num_workers > 0:
        # single worker, numpy backend, or host augmentation: background
        # prefetch thread (same overlap, sequential stream preserved)
        from fumi_tpu.data.sampler import PrefetchingSampler
        train_host = PrefetchingSampler(train_host,
                                        depth=2 * cfg.num_workers)
        print("loader: prefetch thread")
    return (train_host,
            HostEpisodeSampler(image_table, image_ids, splits["val"],
                               eval_spec, seed=cfg.seed + 1,
                               allow_replacement=ar, backend=be),
            HostEpisodeSampler(image_table, image_ids, splits["test"],
                               eval_spec, seed=cfg.seed + 2,
                               allow_replacement=ar, backend=be))


def _save_predictions_csv(cfg: Config, writer: MetricWriter,
                          results_path: str, test_m: dict) -> Optional[str]:
    """Prediction artifact: ONE ``run_*.csv`` in the reference's exact
    shape (ref: main.py:128-136) — one row per evaluated TASK, columns
    ``support_idx, support_lamda, query_idx, query_preds, query_targets``,
    each cell the task's per-sample list (support cells hold N*K values,
    query cells N*Q; row counts align because both are per-task). Written
    for every family; ``support_lamda`` only where the model computes λ
    (AM3 — the reference writes the CSV only there)."""
    if "preds" not in test_m:
        return None
    import pandas as pd
    nk = cfg.num_ways * cfg.num_shots
    nq = cfg.num_ways * cfg.num_query_eval

    def rows(flat, width):
        if flat is None or len(flat) == 0:
            return None
        return np.asarray(flat).reshape(-1, width).tolist()

    cols = {
        "support_idx": rows(test_m.get("support_idx"), nk),
        "support_lamda": rows(test_m.get("support_lamdas"), nk),
        "query_idx": rows(test_m.get("query_idx"), nq),
        "query_preds": rows(test_m.get("preds"), nq),
        "query_targets": rows(test_m.get("targets"), nq),
    }
    df = pd.DataFrame({k: v for k, v in cols.items() if v is not None})
    stem = (writer.run_name if writer.run_name.startswith("run_")
            else f"run_{writer.run_name}")
    path = os.path.join(results_path, f"{stem}.csv")
    df.to_csv(path)
    return path


def main(cfg: Config) -> dict:
    cfg = cfg.validate()
    results_path = os.path.join(cfg.log_dir, "results")
    os.makedirs(results_path, exist_ok=True)

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    from fumi_tpu.core.runtime import setup_cache
    setup_cache()

    # multi-host: wandb on process 0 only; run dirs/JSONL/CSV carry a
    # per-process suffix so hosts on a shared filesystem cannot collide
    from fumi_tpu.core import distributed as dist
    writer = MetricWriter(
        results_path, use_wandb=not cfg.wandb_offline and dist.is_primary(),
        offline=cfg.wandb_offline, run_suffix=dist.process_tag(),
        wandb_kwargs=dict(entity=cfg.wandb_entity, project=cfg.wandb_project,
                          group=cfg.wandb_experiment,
                          job_type="eval" if cfg.evaluate else "train"))

    splits, image_table, image_ids, dictionary = _load_data(cfg)
    if cfg.im_encoder in ("conv4", "resnet12") and image_table.ndim == 4:
        # adopt the raw table's stored geometry: a real dataset's image
        # size is a property of the artifact, not a flag the user should
        # have to know (--tpu_im_size still sizes synthetic tables)
        _, h, w, c = image_table.shape
        if h != w:
            raise ValueError(
                f"raw image table is {h}x{w}; conv backbones assume "
                "square images")
        if (h, c) != (cfg.im_size, cfg.im_channels):
            import dataclasses as _dc0
            cfg = _dc0.replace(cfg, im_size=h, im_channels=c)
            print(f"raw images: adopting stored geometry {h}x{w}x{c}")
    run_dir = os.path.join(cfg.log_dir, "runs", writer.run_name)
    os.makedirs(run_dir, exist_ok=True)
    # record the full config with the run (the reference uploads it to
    # wandb, main.py:32, and pickles args into checkpoints)
    import dataclasses as _dc
    import json as _json
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        _json.dump(_dc.asdict(cfg), f, indent=1, default=str)
    if cfg.text_encoder in TOKEN_TEXT_ENCODERS and dictionary:
        # ship the token vocabulary with the run so serving can rebuild
        # the encoder without re-loading the dataset (the trained
        # embedding matrix itself lives in the checkpoint params)
        with open(os.path.join(run_dir, "vocab.json"), "w") as f:
            _json.dump(dict(dictionary), f)

    key = jax.random.PRNGKey(cfg.seed)
    k_model, k_train, k_test = jax.random.split(key, 3)

    # ---- CLIP: supervised path (ref: main.py:86-92,109-111) ----
    if cfg.model == "clip":
        if cfg.dataset not in ("supervised-inat-anim", "synthetic"):
            raise NotImplementedError(
                "CLIP requires --dataset supervised-inat-anim")
        if cfg.dataset == "supervised-inat-anim" and \
                cfg.text_encoder != "BERT":
            # ref: data.py:61-62 — the supervised path is BERT-only
            raise NotImplementedError(
                "supervised-inat-anim supports only --text_encoder BERT")
        model, params = clip_loop.make_clip(cfg, k_model)
        opt = init_optim(cfg.optim, cfg.lr, cfg.weight_decay, cfg.momentum)
        data = {s: (supervised_from_class_set(splits[s]), image_table)
                for s in ("train", "val", "test")}
        if cfg.checkpoint:
            ckpt_dir = ckpt_lib.resolve_checkpoint(
                cfg.checkpoint, cfg.model, entity=cfg.wandb_entity,
                project=cfg.wandb_project)
            params, _, _ = ckpt_lib.load_checkpoint(
                ckpt_dir, params, opt.init(params), best=True)
        clip_mesh = None
        if len(jax.devices()) > 1:
            dp = mesh_lib.auto_dp(cfg.batch_size)
            if dp > 1:
                clip_mesh = mesh_lib.make_mesh(dp, 1)
        if not cfg.evaluate:
            params = clip_loop.training_run(
                cfg, model, params, opt, data["train"], data["val"],
                writer, run_dir, np.random.RandomState(cfg.seed),
                mesh=clip_mesh)
        test_acc = clip_loop.evaluate(cfg, model, params, data["test"])
        print(f"\n TEST: test acc: {test_acc}")
        writer.log({"test/acc": test_acc})
        writer.finish()
        return {"test/acc": test_acc}

    # ---- episodic families ----
    if cfg.seed_sweep > 1:
        # lockstep multi-seed sweep: S replicas in one vmapped program
        # (fumi_tpu/train/sweep.py); per-seed trajectories match
        # standalone --seed runs
        from fumi_tpu.train.sweep import sweep_main
        samplers = _samplers(cfg, splits, image_table, image_ids)
        try:
            return sweep_main(cfg, dictionary, samplers, writer, run_dir,
                              results_path)
        finally:
            # reap loader workers/threads like the non-sweep path does
            # (otherwise --num_workers processes idle until interpreter
            # exit)
            for s in samplers:
                close = getattr(s, "close", None)
                if close is not None:
                    close()

    # decide the mesh BEFORE building steps (each engine constructs its own
    # family; building the serial one first would just be discarded work)
    n_dev = len(jax.devices())
    mesh = None
    dp, mp = cfg.mesh_dp, cfg.mesh_mp
    if dp == 0 and n_dev > 1:
        # auto: the largest dp that divides the meta-batch and fits the
        # devices left over by the model axis
        dp = mesh_lib.auto_dp(cfg.batch_size, max(1, n_dev // mp))
    if mp > 1:
        # 2-D declarative engine: wide weights sharded over mp, episodes
        # over dp (fumi_tpu/parallel/pjit_engine.py)
        from fumi_tpu.parallel.pjit_engine import make_pjit_steps
        mesh = mesh_lib.make_mesh(max(dp, 1), mp)
        steps = make_pjit_steps(cfg, k_model, mesh, dictionary)
    elif dp > 1:
        from fumi_tpu.parallel import make_parallel_steps
        mesh = mesh_lib.make_mesh(dp, 1)
        steps = make_parallel_steps(cfg, k_model, mesh, dictionary)
    else:
        steps = make_steps(cfg, k_model, dictionary)

    train_s, val_s, test_s = _samplers(cfg, splits, image_table, image_ids)

    params = steps.params
    restored_opt_state = None
    resume_meta = {}
    if cfg.checkpoint:
        ckpt_dir = ckpt_lib.resolve_checkpoint(
            cfg.checkpoint, cfg.model, entity=cfg.wandb_entity,
            project=cfg.wandb_project)
        params, restored_opt_state, _ = ckpt_lib.load_checkpoint(
            ckpt_dir, params, steps.opt.init(params), best=True)
        steps = steps._replace(params=params)
    elif cfg.auto_resume and not cfg.evaluate:
        # crash recovery: continue the newest checkpointed run OF THIS
        # MODEL FAMILY in this log_dir — LATEST state (ckpt/, not best/)
        # plus the batch counter and best-loss bookkeeping, so eval
        # cadence/patience/epochs pick up where the interrupted run stopped
        prev = ckpt_lib.find_latest_resumable(cfg.log_dir, model=cfg.model)
        if prev is not None:
            try:
                params, restored_opt_state, resume_meta = \
                    ckpt_lib.load_checkpoint(
                        prev, params, steps.opt.init(params), best=False)
            except Exception as e:
                # recovery must not be worse than no recovery: an
                # incompatible checkpoint (e.g. different dims of the same
                # family) starts fresh instead of dying at startup
                print(f"auto-resume: cannot restore {prev} "
                      f"({type(e).__name__}: {e}); starting fresh")
                restored_opt_state, resume_meta = None, {}
                prev = None
        if prev is not None:
            steps = steps._replace(params=params)
            # carry the interrupted run's best/ forward so the end-of-
            # training best reload still works if this segment never
            # improves on it
            import shutil
            for n in ("best", "best.meta.json"):
                src, dst = os.path.join(prev, n), os.path.join(run_dir, n)
                if os.path.isdir(src):
                    shutil.copytree(src, dst, dirs_exist_ok=True)
                elif os.path.exists(src):
                    shutil.copyfile(src, dst)
            print(f"auto-resume: {prev} "
                  f"(batch {resume_meta.get('batch_idx')})")

    try:
        if not cfg.evaluate:
            from fumi_tpu.utils.profiling import profile_trace
            with profile_trace(cfg.profile_dir):
                params = training_run(
                    cfg, steps, train_s, val_s, writer, run_dir, k_train,
                    opt_state=restored_opt_state,
                    start_batch=int(resume_meta.get("batch_idx", -1)) + 1,
                    initial_best=resume_meta.get("best_loss"))
    finally:
        # stop the --num_workers prefetch thread (otherwise it keeps
        # drawing episodes until interpreter exit)
        close = getattr(train_s, "close", None)
        if close is not None:
            close()

    if cfg.evaluate and restored_opt_state is not None:
        # --evaluate from a checkpoint: with --tpu_ema the smoothed
        # weights live in the restored optimizer state
        from fumi_tpu.train.loop import eval_view
        params = eval_view(cfg, params, restored_opt_state)
    test_m = test_loop(cfg, steps, params, test_s, cfg.max_test_batches,
                       k_test, collect_artifacts=True)
    scalars = {k: v for k, v in test_m.items()
               if isinstance(v, (int, float))}
    print(f"\n TEST: {scalars}")
    writer.log({f"test/{k}": v for k, v in scalars.items()})
    _save_predictions_csv(cfg, writer, results_path, test_m)
    writer.finish()
    return {f"test/{k}": v for k, v in scalars.items()}


def cli(argv=None):
    cfg = config_from_args(argv)
    # multi-host coordination must come up before any other backend use
    from fumi_tpu.core import distributed as dist
    dist.initialize_from_config(cfg)
    print(f"running on {jax.default_backend()} "
          f"({len(jax.devices())} devices, "
          f"process {jax.process_index()}/{jax.process_count()})")
    return main(cfg)


if __name__ == "__main__":
    cli(sys.argv[1:])
