"""wandb shim for the oracle harness: offline, in-process metric capture.

The reference treats wandb as its logging + checkpoint-store spine
(main.py:27-32, utils.py:406-419). This stub satisfies that surface:
``init`` creates a run with a real ``dir`` (under WANDB_ORACLE_DIR or a
tempdir) so ``save_checkpoint``'s torch.save lands somewhere writable;
``log`` merges every dict into ``wandb.summary_capture`` which the
runner reads back after main() returns."""

import os
import tempfile

run = None
summary_capture = {}
history_capture = []


class _Config(object):
    def update(self, *args, **kwargs):
        pass


config = _Config()


class _Run(object):
    def __init__(self, base_dir):
        self.dir = base_dir
        self.name = "oracle"


def init(*args, **kwargs):
    global run
    base = os.environ.get("WANDB_ORACLE_DIR") or tempfile.mkdtemp(
        prefix="wandb_oracle_")
    os.makedirs(base, exist_ok=True)
    run = _Run(base)
    return run


def log(metrics, step=None, **kwargs):
    history_capture.append(dict(metrics))
    summary_capture.update(metrics)


def watch(*args, **kwargs):
    pass


def save(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass


def restore(name, run_path=None, root=None, **kwargs):
    """Faithful subset of wandb.restore (the reference's checkpoint
    fetch, main.py:70-74): place ``name`` under ``root`` and return an
    open file whose ``.name`` is the local path. The "run" to fetch from
    is a local directory given via WANDB_ORACLE_RESTORE_DIR (real wandb
    downloads from the run named by ``run_path``)."""
    src_dir = os.environ.get("WANDB_ORACLE_RESTORE_DIR")
    if not src_dir:
        raise NotImplementedError(
            "oracle shim: set WANDB_ORACLE_RESTORE_DIR to a directory "
            f"holding {name} to use wandb.restore")
    import shutil
    root = root or (run.dir if run is not None else tempfile.mkdtemp())
    os.makedirs(root, exist_ok=True)
    dst = os.path.join(root, name)
    shutil.copyfile(os.path.join(src_dir, name), dst)
    return open(dst, "r")
