"""Lockstep multi-seed sweep (--tpu_seed_sweep): per-seed faithfulness to
standalone runs, live-mask freezing, validation, artifacts."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fumi_tpu.cli.main import main
from fumi_tpu.core.config import Config


def sweep_cfg(tmp_path, model="maml", **kw):
    base = dict(
        model=model, dataset="synthetic", im_emb_dim=32, text_emb_dim=16,
        im_hid_dim=(16, 8), prototype_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, epochs=12, eval_freq=6, patience=0,
        num_ep_test=8, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32",
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_sweep_matches_standalone_run(tmp_path):
    """Main-driver wiring: the sweep's seed-0 replica matches a standalone
    --seed 0 run (same synthetic data); aggregates and per-seed CSV
    artifacts come out right."""
    sweep_out = main(sweep_cfg(tmp_path / "sweep", seed_sweep=2))
    assert "test/acc_seed_ci95" in sweep_out  # aggregate over 2 seeds

    # mesh_dp=1 pins the solo run to the serial single-chip path (the
    # 8-device test env would otherwise auto-pick the dp engine, whose
    # per-shard key fold-in is a different — equally valid — stream).
    # Only seed 0 compares at this level: a solo --seed 1 run would also
    # REGENERATE the synthetic dataset under seed 1, while the sweep's
    # replica 1 shares the seed-0 data (real datasets are seed-invariant;
    # the shared-data contract is pinned by the lower-level test below).
    solo = main(sweep_cfg(tmp_path / "solo0", seed=0, mesh_dp=1))
    for k in ("acc", "loss"):
        np.testing.assert_allclose(
            sweep_out[f"test/seed0/{k}"], solo[f"test/{k}"],
            rtol=1e-4, atol=1e-5,
            err_msg=f"seed 0 {k}: sweep != standalone")

    # aggregate = mean of per-seed
    np.testing.assert_allclose(
        sweep_out["test/acc"],
        np.mean([sweep_out["test/seed0/acc"], sweep_out["test/seed1/acc"]]),
        rtol=1e-6)

    # one prediction CSV per seed
    csvs = sorted(glob.glob(os.path.join(
        str(tmp_path / "sweep"), "results", "run_*_seed*.csv")))
    assert len(csvs) == 2, csvs

    # per-seed exported run dirs are FIRST-CLASS: --evaluate --checkpoint
    # on seed0's export reproduces the sweep's seed-0 test metrics
    run_dirs = glob.glob(os.path.join(str(tmp_path / "sweep"), "runs",
                                      "run_*"))
    assert len(run_dirs) == 1
    seed_dir = os.path.join(run_dirs[0], "seed0")
    assert os.path.isdir(os.path.join(seed_dir, "best"))
    assert os.path.exists(os.path.join(seed_dir, "config.json"))
    ev = main(sweep_cfg(tmp_path / "ev", seed=0, mesh_dp=1,
                        evaluate=True, checkpoint=seed_dir))
    for k in ("acc", "loss"):
        np.testing.assert_allclose(
            ev[f"test/{k}"], sweep_out[f"test/seed0/{k}"],
            rtol=1e-4, atol=1e-5,
            err_msg=f"seed0 export --evaluate {k} != sweep report")


@pytest.mark.slow
def test_sweep_every_replica_matches_serial(tmp_path):
    """The core contract, on SHARED data: every replica of the sweep
    follows the serial trajectory of a standalone run with its seed —
    init, episode stream, training, eval, and test all match (up to
    vmap/XLA fp reassociation)."""
    from fumi_tpu.cli.main import _samplers
    from fumi_tpu.train.logging import MetricWriter
    from fumi_tpu.train.loop import test_loop, training_run
    from fumi_tpu.train.steps import make_steps
    from fumi_tpu.train.sweep import (build_sweep_family, make_opt,
                                      sweep_seeds, sweep_test,
                                      sweep_training_run)
    from fumi_tpu.data.synthetic import synthetic_splits

    cfg = sweep_cfg(tmp_path, seed_sweep=2)
    splits, table, ids = synthetic_splits(
        num_classes=32, images_per_class=64, im_dim=cfg.im_emb_dim,
        text_dim=cfg.text_emb_dim, seed=cfg.seed)
    samplers = _samplers(cfg, splits, table, ids)

    def writer(tag):
        d = str(tmp_path / tag)
        os.makedirs(d, exist_ok=True)
        return MetricWriter(d, use_wandb=False)

    family = build_sweep_family(cfg, None)
    params, _, _ = sweep_training_run(cfg, family, make_opt(cfg),
                                      samplers[0], samplers[1],
                                      writer("sweep"),
                                      str(tmp_path / "sweep_run"))
    k_tests = jnp.stack([jax.random.split(jax.random.PRNGKey(s), 3)[2]
                         for s in sweep_seeds(cfg)])
    per_seed = sweep_test(cfg, family, params, samplers[2], k_tests,
                          cfg.max_test_batches)

    for i, s in enumerate(sweep_seeds(cfg)):
        solo_cfg = cfg.replace(seed=s, seed_sweep=0)
        k_model, k_train, k_test = jax.random.split(
            jax.random.PRNGKey(s), 3)
        steps = make_steps(solo_cfg, k_model)
        solo_params = training_run(
            solo_cfg, steps, samplers[0], samplers[1],
            writer(f"solo{s}"), str(tmp_path / f"solo_run{s}"), k_train)
        solo_m = test_loop(solo_cfg, steps, solo_params, samplers[2],
                           solo_cfg.max_test_batches, k_test)
        for k in ("acc", "loss"):
            np.testing.assert_allclose(
                per_seed[i][k], solo_m[k], rtol=1e-4, atol=1e-5,
                err_msg=f"replica {i} (seed {s}) {k} != serial run")


def test_sweep_live_mask_freezes_dead_seed(tmp_path):
    """A seed whose live flag is False holds params/opt-state bitwise
    while live seeds keep training (the per-seed early-stop mechanism)."""
    from fumi_tpu.data.synthetic import synthetic_splits
    from fumi_tpu.data.sampler import DeviceEpisodeSampler
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.train.sweep import (build_sweep_family,
                                      make_sweep_chunked_train)
    from fumi_tpu.train.steps import make_opt

    cfg = sweep_cfg(tmp_path, seed_sweep=2)
    splits, table, ids = synthetic_splits(
        num_classes=8, images_per_class=16, im_dim=cfg.im_emb_dim,
        text_dim=cfg.text_emb_dim, seed=0)
    spec = EpisodeSpec(cfg.batch_size, cfg.num_ways, cfg.num_shots,
                       cfg.num_query_train, cfg.im_emb_dim,
                       cfg.text_emb_dim)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   splits["train"], spec)
    family = build_sweep_family(cfg, None)
    opt = make_opt(cfg)
    params = family.params
    opt_state = jax.vmap(opt.init)(params)
    keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])
    live = jnp.asarray([True, False])

    run = make_sweep_chunked_train(family, opt, sampler, chunk=3)
    p2, s2, keys2, ms = run(params, opt_state, keys, live)

    for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[1], p2)),
                    jax.tree.leaves(jax.tree.map(lambda x: x[1], params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the live seed DID move
    moved = any(
        not np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
    assert moved
    # both key chains advance (a dead seed stays stream-aligned)
    assert not np.array_equal(np.asarray(keys2), np.asarray(keys))
    # metric leaves carry the (chunk, S) shape (scan stacks steps first)
    assert np.asarray(ms["loss"]).shape == (3, 2)


@pytest.mark.parametrize("kw,err", [
    (dict(model="clip", text_encoder="BERT"), NotImplementedError),
    (dict(device_sampler=False), NotImplementedError),
    (dict(mesh_mp=2), NotImplementedError),
    (dict(evaluate=True), NotImplementedError),
    (dict(checkpoint="x"), NotImplementedError),
    (dict(seed_accum=3), ValueError),           # must divide S=2
    (dict(seed_accum=2, mesh_dp=2), NotImplementedError),  # dp-sharded
    (dict(seed_accum=0), ValueError),
])
def test_sweep_validation_rejections(tmp_path, kw, err):
    with pytest.raises(err):
        sweep_cfg(tmp_path, seed_sweep=2, **kw).validate()


def test_seed_accum_needs_a_sweep(tmp_path):
    with pytest.raises(ValueError):
        sweep_cfg(tmp_path, seed_accum=2).validate()


def test_seed_accum_trajectories_bitwise_equal():
    """--tpu_seed_accum is a SCHEDULING change only: G sequential groups
    of S/G per step produce the same per-seed trajectories as the
    unaccumulated vmap over all S — identical to the last ulp of XLA's
    batch-shape-dependent codegen (keys/episodes ARE bitwise equal;
    float params agree to ~1e-7 relative, measured max 1 differing
    element in 512 at 7e-9 absolute on CPU). The contract that makes
    the working-set lever safe to flip on any sweep."""
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data import DeviceEpisodeSampler, synthetic_class_set
    from fumi_tpu.train.steps import make_opt
    from fumi_tpu.train.sweep import (build_sweep_family,
                                      make_sweep_chunked_train)

    S = 4
    cfg = Config(model="maml", dataset="synthetic", im_emb_dim=16,
                 text_emb_dim=8, im_hid_dim=(8,), num_ways=3, num_shots=1,
                 num_shots_test=4, num_train_adapt_steps=1, batch_size=2,
                 dropout=0.0, text_encoder="precomputed", step_size=0.1,
                 lr=1e-2, optim="adam", seed=0, seed_sweep=S)
    cs, table, ids = synthetic_class_set(
        num_classes=6, images_per_class=10, im_dim=16, text_dim=8, seed=0)
    spec = EpisodeSpec(2, 3, 1, cfg.num_query_train, 16, 8)
    sampler = DeviceEpisodeSampler(jnp.asarray(table), jnp.asarray(ids),
                                   cs, spec)
    family = build_sweep_family(cfg)
    opt = make_opt(cfg)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(S)])
    # a mixed live mask: the hold path must group identically too
    live = jnp.array([True, True, False, True])

    outs = {}
    for g in (1, 2, 4):
        run = make_sweep_chunked_train(family, opt, sampler, chunk=3,
                                       seed_accum=g)
        outs[g] = run(family.params, jax.vmap(opt.init)(family.params),
                      keys, live)
    p1, s1, k1, m1 = outs[1]
    for g in (2, 4):
        pg, sg, kg, mg = outs[g]
        # the PRNG key chains are bitwise equal (integer math)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(kg))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-7, atol=1e-8),
            (p1, s1), (pg, sg))
        for k in m1:
            np.testing.assert_allclose(np.asarray(m1[k]),
                                       np.asarray(mg[k]),
                                       rtol=2e-7, atol=1e-8,
                                       err_msg=f"metric {k} G={g}")


@pytest.mark.slow
def test_sweep_sharded_matches_single_device(tmp_path):
    """Seed-axis sharding over the dp mesh is placement-only (replicas
    never communicate): the sharded sweep's per-seed test metrics equal
    the single-device sweep's."""
    from fumi_tpu.cli.main import _samplers
    from fumi_tpu.core import mesh as mesh_lib
    from fumi_tpu.train.logging import MetricWriter
    from fumi_tpu.train.sweep import (build_sweep_family, make_opt,
                                      sweep_seeds, sweep_test,
                                      sweep_training_run)
    from fumi_tpu.data.synthetic import synthetic_splits

    cfg = sweep_cfg(tmp_path, seed_sweep=4, epochs=8, eval_freq=4)
    splits, table, ids = synthetic_splits(
        num_classes=32, images_per_class=64, im_dim=cfg.im_emb_dim,
        text_dim=cfg.text_emb_dim, seed=cfg.seed)

    def writer(tag):
        d = str(tmp_path / tag)
        os.makedirs(d, exist_ok=True)
        return MetricWriter(d, use_wandb=False)

    k_tests = jnp.stack([jax.random.split(jax.random.PRNGKey(s), 3)[2]
                         for s in sweep_seeds(cfg)])
    results = {}
    for tag, mesh in (("single", None),
                      ("sharded", mesh_lib.make_mesh(4, 1))):
        samplers = _samplers(cfg, splits, table, ids)
        family = build_sweep_family(cfg, None)
        params, _, _ = sweep_training_run(
            cfg, family, make_opt(cfg), samplers[0], samplers[1],
            writer(tag), str(tmp_path / f"{tag}_run"), mesh=mesh)
        results[tag] = sweep_test(cfg, family, params, samplers[2],
                                  k_tests, cfg.max_test_batches, mesh=mesh)

    for i in range(4):
        for k in ("acc", "loss"):
            np.testing.assert_allclose(
                results["sharded"][i][k], results["single"][i][k],
                rtol=1e-5, atol=1e-6,
                err_msg=f"replica {i} {k}: sharded != single-device")


def test_sweep_mesh_dp_pins_layout():
    """--tpu_mesh_dp 1 pins the single-device layout (standalone
    convention); 0 auto-shards; an explicit dp must divide S."""
    from fumi_tpu.train.sweep import sweep_mesh
    cfg = Config(model="maml", dataset="synthetic", seed_sweep=4)
    assert sweep_mesh(cfg.replace(mesh_dp=1)) is None
    auto = sweep_mesh(cfg.replace(mesh_dp=0))
    assert auto is not None and auto.shape["dp"] == 4  # 8-device env
    pinned = sweep_mesh(cfg.replace(mesh_dp=2))
    assert pinned.shape["dp"] == 2
    with pytest.raises(NotImplementedError):
        cfg.replace(mesh_dp=2, dist_coordinator="h:1",
                    dist_num_processes=2, dist_process_id=0).validate()


@pytest.mark.slow
def test_sweep_no_improvement_returns_trained_params(tmp_path):
    """A reload-best family whose seeds never hit an eval boundary (or
    never beat the initial validation) must fall back to the FINAL
    trained params — standalone loop.py reloads best/ only when it
    exists; returning the init-time snapshot would silently export an
    untrained model."""
    from fumi_tpu.cli.main import _samplers
    from fumi_tpu.train.logging import MetricWriter
    from fumi_tpu.train.sweep import (build_sweep_family, make_opt,
                                      sweep_training_run)
    from fumi_tpu.data.synthetic import synthetic_splits

    # eval_freq > epochs: no eval boundary is ever reached
    cfg = sweep_cfg(tmp_path, model="fumi", seed_sweep=2, epochs=5,
                    eval_freq=50)
    splits, table, ids = synthetic_splits(
        num_classes=32, images_per_class=64, im_dim=cfg.im_emb_dim,
        text_dim=cfg.text_emb_dim, seed=cfg.seed)
    samplers = _samplers(cfg, splits, table, ids)
    family = build_sweep_family(cfg, None)
    init_leaves = [np.asarray(x) for x in jax.tree.leaves(family.params)]
    d = str(tmp_path / "w")
    os.makedirs(d, exist_ok=True)
    run_dir = str(tmp_path / "run")
    params, opt_state, info = sweep_training_run(
        cfg, family, make_opt(cfg), samplers[0], samplers[1],
        MetricWriter(d, use_wandb=False), run_dir)
    assert info["selection"] == "best"
    moved = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(params), init_leaves))
    assert moved, "returned params are the untrained init snapshot"

    # the per-seed export must stamp HONEST provenance for the fallback:
    # the stored weights are the final trained state, so the meta says
    # selection=last at the final step (stamping the init-time best step
    # would claim the weights are the untrained batch-0 snapshot)
    import json
    from fumi_tpu.train.sweep import export_seed_runs, sweep_seeds
    export_seed_runs(cfg, run_dir, sweep_seeds(cfg), params, opt_state,
                     info)
    for s in sweep_seeds(cfg):
        with open(os.path.join(run_dir, f"seed{s}",
                               "best.meta.json")) as f:
            meta = json.load(f)
        assert meta["selection"] == "last"
        assert meta["no_improvement"] is True
        assert meta["batch_idx"] == int(info["batch_idx"])


def test_sweep_train_logs_mask_frozen_seeds(tmp_path):
    """Per-step sweep train logs average over LIVE replicas only and
    count only their episodes: a patience-frozen replica's held-constant
    metrics must not dilute the monitored curves (S sequential runs log
    nothing for a stopped run)."""
    from fumi_tpu.train.sweep import _log_sweep_train

    class Rec:
        def __init__(self):
            self.recs = []

        def log(self, rec, step=None):
            self.recs.append((step, dict(rec)))

    cfg = sweep_cfg(tmp_path, batch_size=4)
    # (chunk=2 steps, S=3 seeds); seed 1 frozen with sentinel metrics
    ms = {"loss": jnp.array([[1.0, 99.0, 3.0], [2.0, 99.0, 4.0]]),
          "acc": jnp.array([[0.5, 0.0, 0.7], [0.6, 0.0, 0.8]]),
          "grad_norm": jnp.array([[1.0, 0.0, 1.0], [1.0, 0.0, 1.0]])}
    live = np.array([True, False, True])
    w = Rec()
    end = _log_sweep_train(w, cfg, start_idx=10, ms=ms, is_am3=False,
                           live=live, episodes_done=100)
    assert [s for s, _ in w.recs] == [10, 11]
    np.testing.assert_allclose(w.recs[0][1]["train/loss"], 2.0)  # (1+3)/2
    np.testing.assert_allclose(w.recs[1][1]["train/loss"], 3.0)  # (2+4)/2
    # 2 live seeds x batch 4 per step, cumulative from 100
    assert w.recs[0][1]["num_episodes"] == 108
    assert w.recs[1][1]["num_episodes"] == 116
    assert end == 116


@pytest.mark.slow
def test_sweep_auto_resume_equals_uninterrupted_run(tmp_path):
    """A crashed-and-resumed sweep reproduces the uninterrupted run
    exactly: the checkpoint carries the stacked live+best states AND the
    in-flight train keys, so the resumed segment continues the same
    episode stream."""
    full = main(sweep_cfg(tmp_path / "full", seed_sweep=2,
                          epochs=12, eval_freq=4))
    # "crash": a run truncated at epochs=6 (last checkpoint at batch 4)
    main(sweep_cfg(tmp_path / "crash", seed_sweep=2,
                   epochs=6, eval_freq=4))
    resumed = main(sweep_cfg(tmp_path / "crash", seed_sweep=2,
                             epochs=12, eval_freq=4, auto_resume=True))
    for s in (0, 1):
        for k in ("acc", "loss"):
            np.testing.assert_allclose(
                resumed[f"test/seed{s}/{k}"], full[f"test/seed{s}/{k}"],
                rtol=1e-5, atol=1e-6,
                err_msg=f"seed {s} {k}: resumed != uninterrupted")


@pytest.mark.slow
def test_sweep_resume_at_end_exports_trained_step(tmp_path):
    """Resuming an already-FINISHED sweep trains nothing and stamps the
    per-seed export's at_step with the checkpointed batch (the last one
    actually trained), not the batch it was about to run."""
    import json
    cfg = sweep_cfg(tmp_path, seed_sweep=2, epochs=6, eval_freq=6)
    main(cfg)
    main(cfg.replace(auto_resume=True))
    runs = sorted(glob.glob(os.path.join(str(tmp_path), "runs", "run_*")),
                  key=os.path.getmtime)
    metas = []
    for r in runs:
        p = os.path.join(r, "seed0", "best.meta.json")
        if os.path.exists(p):
            with open(p) as f:
                metas.append(json.load(f))
    assert len(metas) == 2, f"expected 2 exporting runs, got {len(metas)}"
    assert metas[0]["batch_idx"] == metas[1]["batch_idx"] == 6


def test_auto_resume_skips_sweep_checkpoints(tmp_path):
    """A sweep's stacked checkpoint must not be picked up by a later
    single-run --tpu_auto_resume (its pytrees carry a leading seed
    axis)."""
    import json
    from fumi_tpu.train.checkpoint import find_latest_resumable

    run = tmp_path / "runs" / "run_sweep"
    (run / "ckpt").mkdir(parents=True)
    (run / "ckpt.meta.json").write_text(json.dumps(
        {"batch_idx": 5, "best_loss": 1.0, "model": "maml",
         "sweep_seeds": [0, 1]}))
    assert find_latest_resumable(str(tmp_path), model="maml") is None

    solo = tmp_path / "runs" / "run_solo"
    (solo / "ckpt").mkdir(parents=True)
    (solo / "ckpt.meta.json").write_text(json.dumps(
        {"batch_idx": 5, "best_loss": 1.0, "model": "maml"}))
    assert find_latest_resumable(str(tmp_path), model="maml") == str(solo)


@pytest.mark.slow
def test_sweep_per_seed_patience(tmp_path):
    """patience > 0 applies per seed; the run completes and returns
    per-seed metrics (AM3 exercises eval-at-batch-0 + best-view reload)."""
    out = main(sweep_cfg(tmp_path, model="am3", seed_sweep=2,
                         epochs=12, eval_freq=4, patience=3))
    for s in (0, 1):
        assert np.isfinite(out[f"test/seed{s}/loss"])
        assert 0.0 <= out[f"test/seed{s}/acc"] <= 1.0
    assert "test/avg_lamda" in out
