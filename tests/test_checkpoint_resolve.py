"""--checkpoint resolution: local run dirs pass through; wandb run paths
(full ``entity/project/run_id`` or bare run id) download checkpoint files
into ``./checkpoints/{model}/{run_id}`` (ref: fumi/main.py:61-76). wandb is
mocked — no network."""

import os
import sys
import types

import pytest

from fumi_tpu.train.checkpoint import resolve_checkpoint


class _FakeFile:
    def __init__(self, name, payload=b"x"):
        self.name = name
        self._payload = payload

    def download(self, root, replace=False):
        path = os.path.join(root, self.name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(self._payload)


class _FakeRun:
    def __init__(self, files):
        self._files = files

    def files(self):
        return self._files


def _install_fake_wandb(monkeypatch, runs):
    mod = types.ModuleType("wandb")
    seen = {}

    class Api:
        def run(self, run_path):
            seen["run_path"] = run_path
            if run_path not in runs:
                raise KeyError(run_path)
            return runs[run_path]

    mod.Api = Api
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return seen


def test_local_dir_passthrough(tmp_path):
    d = tmp_path / "run_x"
    d.mkdir()
    assert resolve_checkpoint(str(d), "fumi") == str(d)


def test_full_run_path_downloads(tmp_path, monkeypatch):
    files = [_FakeFile("best/checkpoint"), _FakeFile("best.meta.json"),
             _FakeFile("other.txt")]
    seen = _install_fake_wandb(
        monkeypatch, {"me/proj/abc123": _FakeRun(files)})
    dest = resolve_checkpoint("me/proj/abc123", "fumi",
                              dest_root=str(tmp_path / "ckpts"))
    assert seen["run_path"] == "me/proj/abc123"
    assert os.path.isdir(os.path.join(dest, "best"))
    assert os.path.exists(os.path.join(dest, "best.meta.json"))
    # non-checkpoint files are not downloaded
    assert not os.path.exists(os.path.join(dest, "other.txt"))


def test_bare_run_id_composes_reference_path(tmp_path, monkeypatch):
    """Bare run ids compose entity/model/run_id like the reference
    (main.py:63: multimodal-image-cls/{model}/{checkpoint})."""
    files = [_FakeFile("ckpt/checkpoint")]
    seen = _install_fake_wandb(
        monkeypatch, {"multimodal-image-cls/am3/run9": _FakeRun(files)})
    dest = resolve_checkpoint("run9", "am3",
                              dest_root=str(tmp_path / "ckpts"))
    assert seen["run_path"] == "multimodal-image-cls/am3/run9"
    assert dest.endswith(os.path.join("am3", "run9"))
    assert os.path.isdir(os.path.join(dest, "ckpt"))


def test_already_downloaded_skips_wandb(tmp_path, monkeypatch):
    # dest is keyed by the FULL run path so same-id runs under different
    # entities/projects cannot collide
    dest = tmp_path / "ckpts" / "multimodal-image-cls" / "fumi" / "zzz"
    (dest / "best").mkdir(parents=True)
    # no fake wandb installed: resolution must not touch it
    out = resolve_checkpoint("zzz", "fumi",
                             dest_root=str(tmp_path / "ckpts"))
    assert out == str(dest)


def test_bare_id_composes_with_config_entity_project(tmp_path, monkeypatch):
    """Bare run ids compose with the CONFIG's entity/project (where this
    framework's own runs actually log) — documented deviation from the
    reference's hardcoded multimodal-image-cls/{model} (main.py:63)."""
    files = [_FakeFile("best/checkpoint")]
    seen = _install_fake_wandb(
        monkeypatch, {"me/myproj/r1": _FakeRun(files)})
    dest = resolve_checkpoint("r1", "fumi", entity="me", project="myproj",
                              dest_root=str(tmp_path / "ckpts"))
    assert seen["run_path"] == "me/myproj/r1"
    assert dest.endswith(os.path.join("me", "myproj", "r1"))


def test_unretrievable_is_actionable(tmp_path, monkeypatch):
    _install_fake_wandb(monkeypatch, {})
    with pytest.raises(FileNotFoundError, match="neither a local run dir"):
        resolve_checkpoint("nope", "fumi",
                           dest_root=str(tmp_path / "ckpts"))


def test_failed_download_is_not_cached(tmp_path, monkeypatch):
    """A download that dies partway must not leave a partial dir that the
    'already downloaded' check would trust forever — downloads land at the
    destination only via the final atomic rename."""
    class _BoomFile(_FakeFile):
        def download(self, root, replace=False):
            raise RuntimeError("network died")

    files = [_FakeFile("best/checkpoint"), _BoomFile("best/d/payload")]
    _install_fake_wandb(monkeypatch, {"me/p/r1": _FakeRun(files)})
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("me/p/r1", "fumi",
                           dest_root=str(tmp_path / "ckpts"))
    dest = tmp_path / "ckpts" / "me" / "p" / "r1"
    assert not (dest / "best").exists()

    # a retry against a now-healthy run succeeds (nothing poisoned)
    _install_fake_wandb(
        monkeypatch, {"me/p/r1": _FakeRun([_FakeFile("best/checkpoint")])})
    out = resolve_checkpoint("me/p/r1", "fumi",
                             dest_root=str(tmp_path / "ckpts"))
    assert os.path.isdir(os.path.join(out, "best"))


def test_run_without_checkpoints_is_actionable(tmp_path, monkeypatch):
    _install_fake_wandb(
        monkeypatch,
        {"multimodal-image-cls/fumi/empty": _FakeRun([_FakeFile("log.txt")])})
    with pytest.raises(FileNotFoundError, match="no checkpoint payload"):
        resolve_checkpoint("empty", "fumi",
                           dest_root=str(tmp_path / "ckpts"))


def test_load_checkpoint_falls_back_to_ckpt(tmp_path):
    """A run dir with only ckpt/ (no val improvement yet, or a wandb run
    that only uploaded ckpt/) loads explicitly instead of crashing."""
    import jax
    import numpy as np

    from fumi_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": np.ones((2, 2), np.float32)}
    opt_state = {"m": np.zeros((2, 2), np.float32)}
    save_checkpoint(str(tmp_path), params, opt_state, 3, 9.9, is_best=False)
    assert not (tmp_path / "best").exists()
    p, s, meta = load_checkpoint(str(tmp_path), params, opt_state, best=True)
    np.testing.assert_array_equal(np.asarray(p["w"]), params["w"])
    assert meta["batch_idx"] == 3


def test_save_checkpoint_uploads_to_live_wandb(tmp_path, monkeypatch):
    """A live wandb run gets checkpoint files wandb.save'd (the
    reference's utils.py:406-419), enabling run-path restore later."""
    import sys
    import types

    import numpy as np

    from fumi_tpu.train.checkpoint import save_checkpoint

    saved = []
    mod = types.ModuleType("wandb")
    mod.run = object()  # a live run
    mod.save = lambda glob, base_path=None, policy=None: saved.append(glob)
    monkeypatch.setitem(sys.modules, "wandb", mod)

    params = {"w": np.ones((2, 2), np.float32)}
    save_checkpoint(str(tmp_path), params, {"m": params["w"]}, 1, 0.5,
                    is_best=True)
    joined = " ".join(saved)
    assert "ckpt" in joined and "best" in joined
    # COVERAGE, not just presence: orbax nests its payloads (d/<hash>,
    # ocdbt.process_0/...); every file under ckpt/ and best/ must be
    # uploaded or a later run-path restore downloads an unrestorable subset
    expected = set()
    for sub in ("ckpt", "best"):
        for root, _dirs, files in os.walk(os.path.join(str(tmp_path), sub)):
            for fn in files:
                expected.add(os.path.join(root, fn))
    assert expected, "orbax wrote no payload files?"
    missing = expected - set(saved)
    assert not missing, f"not uploaded: {sorted(missing)[:5]}"


def test_save_checkpoint_without_wandb_is_silent(tmp_path, monkeypatch):
    import sys
    import types

    import numpy as np

    from fumi_tpu.train.checkpoint import save_checkpoint

    mod = types.ModuleType("wandb")  # no .run attribute at all
    monkeypatch.setitem(sys.modules, "wandb", mod)
    params = {"w": np.ones((2, 2), np.float32)}
    save_checkpoint(str(tmp_path), params, {"m": params["w"]}, 1, 0.5,
                    is_best=False)  # must not raise


def test_reference_wandb_run_resolves_to_torch_file(tmp_path, monkeypatch):
    """A REFERENCE wandb run uploads best.pth.tar/ckpt.pth.tar (ref
    utils.py:406-419) — resolution returns the downloaded torch file,
    which load_checkpoint routes through the importer."""
    files = [_FakeFile("best.pth.tar"), _FakeFile("ckpt.pth.tar")]
    _install_fake_wandb(monkeypatch,
                        {"ent/proj/refrun": _FakeRun(files)})
    monkeypatch.chdir(tmp_path)
    out = resolve_checkpoint("ent/proj/refrun", "fumi")
    assert out.endswith(os.path.join("refrun", "best.pth.tar"))  # best wins
    assert os.path.isfile(out)
    # cached second resolution takes the same path without re-downloading
    assert resolve_checkpoint("ent/proj/refrun", "fumi") == out


def test_ckpt_only_reference_run(tmp_path, monkeypatch):
    _install_fake_wandb(
        monkeypatch, {"ent/proj/r2": _FakeRun([_FakeFile("ckpt.pth.tar")])})
    monkeypatch.chdir(tmp_path)
    out = resolve_checkpoint("ent/proj/r2", "fumi")
    assert out.endswith("ckpt.pth.tar")


def test_atomic_swap_restores_aside_renamed_state(tmp_path):
    """Review regression: a crash between _atomic_swap_in's two renames
    leaves the last good state at <dir>.old; the NEXT save must restore
    it as the current state before anything else — not delete it as a
    stale leftover (it is the only intact copy)."""
    import os

    import pytest

    from fumi_tpu.train.checkpoint import _atomic_swap_in

    final = os.path.join(str(tmp_path), "ckpt")

    def write_marker(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "state.txt"), "w") as f:
            f.write("good")

    _atomic_swap_in(final, write_marker)
    # simulate the crash window: old renamed aside, new never landed
    os.rename(final, final + ".old")

    def failing_write(staging):
        raise RuntimeError("simulated crash during the next save")

    with pytest.raises(RuntimeError):
        _atomic_swap_in(final, failing_write)
    # the aside-renamed good state was restored before the failed write
    with open(os.path.join(final, "state.txt")) as f:
        assert f.read() == "good"
