"""Profiling utilities."""

import time

import numpy as np
import jax.numpy as jnp

from fumi_tpu.utils.profiling import Throughput, device_sync, profile_trace


def test_throughput_counter():
    t = Throughput(alpha=1.0)  # no smoothing: rate == instantaneous
    assert t.update(0) == 0.0
    time.sleep(0.05)
    r = t.update(100)
    assert r > 0
    assert t.total_episodes == 100


def test_device_sync():
    assert device_sync(jnp.asarray([3.5, 1.0])) == 3.5
    assert device_sync(jnp.asarray(2.0)) == 2.0


def test_profile_trace_noop():
    with profile_trace(None):
        pass  # disabled path must be a clean no-op


def test_hbm_stats_shape():
    """mem/* metrics: floats keyed mem/<stat>; platforms that report
    nothing yield an empty dict (the logging path just merges it)."""
    from fumi_tpu.utils.profiling import hbm_stats

    stats = hbm_stats()
    assert isinstance(stats, dict)
    for k, v in stats.items():
        assert k.startswith("mem/") and isinstance(v, float)
