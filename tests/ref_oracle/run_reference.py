"""Run the ACTUAL reference implementation as an oracle subprocess.

Usage (spawned by tests/test_e2e_reference_parity.py):

    python tests/ref_oracle/run_reference.py --json-out out.json -- \
        --model fumi --dataset inat-anim --data_dir <root> ...

Everything after ``--`` is forwarded verbatim to the reference's own
argparse parser (utils.py:19-229). sys.path gets (1) the shim directory
(torchmeta/gensim/wandb stand-ins, see shims/*/docstrings) and (2)
/root/reference/fumi, so ``import main`` executes the reference's own
driver byte-identical from disk. Final metrics are whatever the
reference logged to wandb (main.py:108-126), captured by the wandb shim
and dumped as JSON.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", required=True)
    ap.add_argument("--ref-root", default="/root/reference/fumi")
    ap.add_argument("ref_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    ref_args = args.ref_args
    if ref_args and ref_args[0] == "--":
        ref_args = ref_args[1:]

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(here, "shims"))
    sys.path.insert(0, args.ref_root)

    # Keep the reference's torch run single-threaded-ish and quiet; the
    # parity test may run on a 1-CPU box.
    os.environ.setdefault("OMP_NUM_THREADS", "2")

    import torch
    # honor the caller's thread pin: set_num_threads OVERRIDES the OMP
    # env var, so defaulting to cpu_count here would silently re-enable
    # the load-dependent multi-threaded reductions the parity harness
    # pins away (it exports OMP_NUM_THREADS=1 for determinism)
    torch.set_num_threads(
        int(os.environ.get("OMP_NUM_THREADS", max(1, os.cpu_count() or 1))))

    # torch-1.8-compatibility accommodation (recorded in docs/PARITY.md):
    # FuMI's inner loop updates the hypernet output IN-PLACE
    # (``hyper_params -= step_size * grads[0]``, fumi.py:168). Under
    # torch 1.8.1 this ran because matmul's backward saved a contiguous
    # COPY of the sliced operand; modern torch saves the view and the
    # in-place write trips the version counter. Python's augmented
    # assignment rebinds the name to ``__isub__``'s return value, so
    # returning the out-of-place result for non-leaf grad tensors is
    # numerically identical (same value, same gradient graph) and leaves
    # optimizer in-place updates (leaves, under no_grad) untouched.
    _orig_isub = torch.Tensor.__isub__

    def _compat_isub(self, other):
        if (self.requires_grad and not self.is_leaf
                and torch.is_grad_enabled()):
            return self - other
        return _orig_isub(self, other)

    torch.Tensor.__isub__ = _compat_isub

    # torch 2.6 flipped torch.load's default to weights_only=True, which
    # rejects the reference's checkpoint dicts (they pickle numpy scalars
    # and argparse state, utils.py:406-419). The checkpoints here are
    # written by this same process — restore the 1.8-era default.
    _orig_load = torch.load

    def _compat_load(*a, **kw):
        kw.setdefault("weights_only", False)
        return _orig_load(*a, **kw)

    torch.load = _compat_load

    sys.argv = ["main.py"] + ref_args + ["--disable_cuda", "--wandb_offline"]
    import main as ref_main  # /root/reference/fumi/main.py

    ref_main.main(ref_main.parse_args())

    import wandb  # the shim; summary_capture holds the last value per key
    payload = {k: float(v) for k, v in wandb.summary_capture.items()
               if isinstance(v, (int, float)) or hasattr(v, "item")}
    payload["history"] = [
        {k: float(v) for k, v in row.items()
         if isinstance(v, (int, float)) or hasattr(v, "item")}
        for row in wandb.history_capture]
    with open(args.json_out, "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
