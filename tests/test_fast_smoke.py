"""Fast-tier smoke: ONE tiny end-to-end CLI run so `pytest -m "not slow"`
still drives the whole stack (config → data → sampler → family → chunked
harness → checkpoint → CSV artifact) and not just units. The per-family /
per-engine / per-backend coverage lives in the slow tier
(tests/test_cli.py, test_train_loop.py, ...)."""

import glob
import os

import numpy as np

from fumi_tpu.cli.main import main
from fumi_tpu.core.config import Config


def test_cli_smoke_maml(tmp_path):
    cfg = Config(
        model="maml", dataset="synthetic", im_emb_dim=16, text_emb_dim=8,
        im_hid_dim=(8,), prototype_dim=8, text_hid_dim=8,
        num_ways=3, num_shots=2, num_shots_test=3,
        num_train_adapt_steps=1, num_test_adapt_steps=1,
        batch_size=2, epochs=6, eval_freq=3, patience=0,
        num_ep_test=4, lr=1e-2, optim="adam", dropout=0.0,
        text_encoder="precomputed", step_size=0.1,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    out = main(cfg)
    assert np.isfinite(out["test/loss"])
    assert 0.0 <= out["test/acc"] <= 1.0
    assert glob.glob(os.path.join(str(tmp_path), "results", "run_*.csv"))
    assert glob.glob(os.path.join(str(tmp_path), "runs", "*", "ckpt"))
