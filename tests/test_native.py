"""Native C++ sampler tests: build, policy invariants, numpy equivalence of
the gather, and integration through HostEpisodeSampler."""

import numpy as np
import pytest

from fumi_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.load()
    if l is None:
        pytest.skip("g++ unavailable; native sampler not built")
    return l


def test_sample_episodes_invariants(lib):
    counts = np.array([10, 12, 8, 20, 9, 15], dtype=np.int32)
    B, N, KQ = 16, 4, 7
    class_idx, sel = native.sample_episodes_native(lib, 42, 0, counts,
                                                   B, N, KQ)
    assert class_idx.shape == (B, N) and sel.shape == (B, N, KQ)
    for b in range(B):
        # distinct classes per task
        assert len(set(class_idx[b].tolist())) == N
        for i in range(N):
            c = class_idx[b, i]
            picks = sel[b, i]
            # distinct in-class positions within range
            assert len(set(picks.tolist())) == KQ
            assert picks.min() >= 0 and picks.max() < counts[c]


def test_sample_episodes_deterministic(lib):
    counts = np.full(8, 20, dtype=np.int32)
    a = native.sample_episodes_native(lib, 7, 3, counts, 4, 3, 5)
    b = native.sample_episodes_native(lib, 7, 3, counts, 4, 3, 5)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    c = native.sample_episodes_native(lib, 7, 4, counts, 4, 3, 5)
    assert not np.array_equal(a[1], c[1])


def test_sample_episodes_errors(lib):
    counts = np.array([3, 3], dtype=np.int32)
    with pytest.raises(ValueError):
        native.sample_episodes_native(lib, 0, 0, counts, 1, 3, 2)  # N > C
    with pytest.raises(ValueError):
        native.sample_episodes_native(lib, 0, 0, counts, 1, 2, 5)  # K+Q > cnt


def test_gather_rows_native(lib, rng_np):
    table = rng_np.randn(50, 33).astype(np.float32)
    rows = rng_np.randint(0, 50, size=17).astype(np.int32)
    got = native.gather_rows_native(lib, table, rows)
    np.testing.assert_array_equal(got, table[rows])


def test_host_sampler_native_backend(lib):
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import HostEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set

    cs, table, ids = synthetic_class_set(num_classes=8, images_per_class=20,
                                         im_dim=16, text_dim=8)
    spec = EpisodeSpec(3, 4, 2, 5, 16, 8)
    s = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="native")
    ep = s.sample()
    assert ep.support_im.shape == (3, 8, 16)
    ids_s = np.asarray(ep.support_ids)
    ids_q = np.asarray(ep.query_ids)
    for b in range(3):
        assert len(set(ids_s[b]) & set(ids_q[b])) == 0
    # deterministic per (seed, counter): fresh sampler reproduces
    s2 = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="native")
    np.testing.assert_array_equal(np.asarray(s2.sample().support_ids), ids_s)


def test_backend_streams_intentionally_distinct(lib):
    """The documentation contract of --tpu_sampler_backend: native
    (xoshiro256**) and numpy (RandomState) backends are POLICY-equal
    (distributional match pinned in test_data.py) but STREAM-unequal —
    the same seed yields different episodes, and each sampler names its
    resolved backend so startup logs surface which one a run used.
    Cross-machine comparisons must pin the backend; 'auto' resolves
    per-box (by g++ availability)."""
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import HostEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set

    cs, table, ids = synthetic_class_set(num_classes=8, images_per_class=20,
                                         im_dim=16, text_dim=8)
    spec = EpisodeSpec(3, 4, 2, 5, 16, 8)
    nat = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="native")
    np_ = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="numpy")
    auto = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="auto")
    assert nat.backend_name == "native" and np_.backend_name == "numpy"
    assert auto.backend_name == "native"  # this box has the .so
    a = np.asarray(nat.sample().support_ids)
    b = np.asarray(np_.sample().support_ids)
    assert a.shape == b.shape
    assert not np.array_equal(a, b), \
        "streams unexpectedly identical — if the backends ever converge, " \
        "update the --tpu_sampler_backend docs (the divergence is the " \
        "documented contract)"


# ---------------------------------------------------------------------------
# Multiprocess loader (--num_workers N as worker PROCESSES)
# ---------------------------------------------------------------------------

def _mp_fixtures():
    from fumi_tpu.core.episode import EpisodeSpec
    from fumi_tpu.data.sampler import HostEpisodeSampler
    from fumi_tpu.data.synthetic import synthetic_class_set

    cs, table, ids = synthetic_class_set(num_classes=8, images_per_class=20,
                                         im_dim=16, text_dim=8)
    spec = EpisodeSpec(3, 4, 2, 5, 16, 8)
    return table, ids, cs, spec


@pytest.mark.filterwarnings("ignore:os.fork():RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_multiprocess_sampler_stream_parity(lib):
    """num_workers=3 worker processes reproduce EXACTLY the
    single-process native episode stream (counter-addressed draws make
    episode c independent of who computes it) — the reference's
    --num_workers semantics without torch's worker-seed stream change."""
    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    solo = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    ref = [solo.sample() for _ in range(7)]

    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    mp = MultiprocessSampler(base, num_workers=3)
    try:
        got = [mp.sample() for _ in range(7)]
    finally:
        mp.close()
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r.support_ids),
                                      np.asarray(g.support_ids))
        np.testing.assert_array_equal(np.asarray(r.query_ids),
                                      np.asarray(g.query_ids))
        np.testing.assert_array_equal(np.asarray(r.support_im),
                                      np.asarray(g.support_im))


@pytest.mark.filterwarnings("ignore:os.fork():RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_multiprocess_sampler_keeps_wrapped_counter_in_step(lib):
    """Consuming N episodes through the multiprocess wrapper advances the
    wrapped sampler's counter too: unwrapping (loop.py's
    getattr(..., 'sampler') pattern) and calling .sample() directly must
    continue the stream at counter N, not replay episodes 0..N-1."""
    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    solo = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    ref = [solo.sample() for _ in range(5)]

    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    mp = MultiprocessSampler(base, num_workers=2)
    try:
        for _ in range(4):
            mp.sample()
    finally:
        mp.close()
    assert base._counter == 4
    cont = base.sample()  # direct draw after unwrapping
    np.testing.assert_array_equal(np.asarray(ref[4].support_ids),
                                  np.asarray(cont.support_ids))
    np.testing.assert_array_equal(np.asarray(ref[4].query_ids),
                                  np.asarray(cont.query_ids))


@pytest.mark.filterwarnings("ignore:os.fork():RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_multiprocess_sampler_propagates_worker_exception(lib):
    """A worker exception surfaces in sample() at its counter position —
    earlier episodes flow, later calls keep raising (torch DataLoader
    failure semantics, without the silent hang)."""
    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    orig = base._indices_at

    def poisoned(c):
        if c == 4:
            raise RuntimeError("h5 volume went away")
        return orig(c)

    base._indices_at = poisoned  # inherited by the forked workers
    mp = MultiprocessSampler(base, num_workers=2)
    try:
        good = 0
        with pytest.raises(RuntimeError, match="h5 volume went away"):
            for _ in range(10):
                mp.sample()
                good += 1
        assert good == 4  # counters 0..3 flowed before the poison at 4
        with pytest.raises(RuntimeError, match="h5 volume went away"):
            mp.sample()
    finally:
        mp.close()


@pytest.mark.filterwarnings("ignore:os.fork():RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_multiprocess_sampler_dead_worker_raises(lib):
    """A worker killed outright (no exception envelope possible) raises
    instead of blocking forever on its queue."""
    import os
    import signal
    import time

    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    mp = MultiprocessSampler(base, num_workers=2, depth=1)
    try:
        mp.sample()
        os.kill(mp._procs[0].pid, signal.SIGKILL)
        time.sleep(0.2)
        with pytest.raises(RuntimeError, match="died without reporting"):
            for _ in range(8):  # drain whatever worker 0 prefetched
                mp.sample()
    finally:
        mp.close()


def test_multiprocess_sampler_rejects_unsupported_configs(lib):
    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    np_sampler = HostEpisodeSampler(table, ids, cs, spec, seed=0,
                                    backend="numpy")
    with pytest.raises(ValueError, match="native"):
        MultiprocessSampler(np_sampler, num_workers=2)
    aug = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="native",
                             augment_scale=0.1)
    with pytest.raises(ValueError, match="augmentation"):
        MultiprocessSampler(aug, num_workers=2)
    ok = HostEpisodeSampler(table, ids, cs, spec, seed=0, backend="native")
    with pytest.raises(ValueError, match="mp_context"):
        MultiprocessSampler(ok, num_workers=2, mp_context="forkserver")


@pytest.mark.slow
def test_multiprocess_sampler_spawn_stream_parity(lib):
    """mp_context='spawn' (no fork-after-JAX hazard) reproduces the exact
    single-process stream too: the sampler pickles (ctypes handle dropped
    and re-loaded in the child), and counter-addressed draws are start-
    method-independent."""
    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    solo = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    ref = [solo.sample() for _ in range(5)]

    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    mp = MultiprocessSampler(base, num_workers=2, mp_context="spawn")
    try:
        got = [mp.sample() for _ in range(5)]
    finally:
        mp.close()
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r.support_ids),
                                      np.asarray(g.support_ids))
        np.testing.assert_array_equal(np.asarray(r.support_im),
                                      np.asarray(g.support_im))


class _BlockingGet:
    """Stands in for an mp queue whose pipe holds a PARTIAL message: get()
    blocks far past its timeout (recv_bytes has no deadline). `release` is
    set at test teardown so the absorbed reader thread unblocks and exits
    through the loop's normal Empty→stop path instead of leaking for 60 s
    and dying with an unhandled exception after the session ends."""

    def __init__(self):
        import threading
        self.release = threading.Event()

    def get(self, timeout=None):
        import queue
        self.release.wait(60.0)
        raise queue.Empty


@pytest.mark.filterwarnings("ignore:os.fork():RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_multiprocess_sampler_mid_write_kill_raises_not_hangs(lib):
    """A worker killed MID-WRITE leaves a partial message that blocks the
    pipe read indefinitely; sample() must still raise within its own
    timeout (the reader thread absorbs the unbounded recv, the consumer
    times out on the thread queue and runs the dead-worker check)."""
    import os
    import signal
    import time

    from fumi_tpu.data.sampler import HostEpisodeSampler, MultiprocessSampler

    table, ids, cs, spec = _mp_fixtures()
    base = HostEpisodeSampler(table, ids, cs, spec, seed=5, backend="native")
    mp = MultiprocessSampler(base, num_workers=2, depth=1)
    try:
        # emulate the partial write: worker 0's queue read now blocks
        # forever, and the worker itself is dead
        blocker = _BlockingGet()
        mp._queues[0] = blocker
        os.kill(mp._procs[0].pid, signal.SIGKILL)
        time.sleep(0.2)
        t0 = time.monotonic()
        with pytest.raises(RuntimeError, match="died without reporting"):
            for _ in range(8):  # drain anything already bridged pre-swap
                mp.sample()
        assert time.monotonic() - t0 < 30.0
    finally:
        blocker.release.set()
        mp.close()
