#!/usr/bin/env bash
# One-command proof-of-life: tests (8-device virtual CPU mesh), multi-chip
# dry run, TPU benchmark, and an end-to-end CLI training run.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== fast-tier tests (~75 s on 1 CPU; full suite: pytest tests/ -q) =="
python -m pytest tests/ -m "not slow" -x -q

echo "== multi-chip dry run (8 virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g
fn, args = g.entry(); print('entry:', [float(x) for x in jax.jit(fn)(*args)])
g.dryrun_multichip(8)"

echo "== TPU benchmark (one JSON line) =="
python bench.py

echo "== end-to-end CLI training (synthetic, real device) =="
python -m fumi_tpu.cli.main --model fumi --dataset synthetic \
  --im_emb_dim 64 --text_emb_dim 32 --im_hid_dim 32 16 --text_hid_dim 16 \
  --num_ways 3 --epochs 20 --eval_freq 10 --num_ep_test 8 \
  --num_train_adapt_steps 2 --num_test_adapt_steps 2 --lr 0.01 \
  --log_dir /tmp/fumi_smoke --wandb_offline
echo "== smoke OK =="
