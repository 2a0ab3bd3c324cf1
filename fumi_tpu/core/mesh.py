"""Device-mesh and sharding setup.

The reference is strictly single-device (ref: fumi/main.py:145-146; no
torch.distributed anywhere). Here parallelism is first-class: a 2-D
``jax.sharding.Mesh`` with axes

- ``"dp"`` — episode/task data parallelism: the meta-batch of B tasks is
  sharded along this axis; meta-gradients are ``psum``-reduced over ICI
  (replacing the reference's implicit single-device accumulation,
  ref: fumi/models/fumi.py:187-193).
- ``"mp"`` — a model axis, trivial (size 1) for these small MLP/hypernet
  models but kept available for sharding larger frozen encoders.

Use :func:`make_mesh` for real devices and
``jax.sharding.Mesh(np.array(jax.devices()[:n]).reshape(...), ...)``
directly in tests (with ``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
MP_AXIS = "mp"


def largest_divisor_leq(m: int, cap: int) -> int:
    """Largest d ≤ cap with m % d == 0 (≥ 1)."""
    for d in range(min(cap, m), 0, -1):
        if m % d == 0:
            return d
    return 1


def auto_dp(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Auto dp pick: the largest device count that evenly divides the
    meta-batch (tasks split evenly across shards)."""
    if n_devices is None:
        n_devices = len(jax.devices())
    return largest_divisor_leq(batch_size, n_devices)


def make_mesh(dp: int = 0, mp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a (dp, mp) mesh. ``dp == 0`` means "use all devices / mp"."""
    devices = devices if devices is not None else jax.devices()
    if dp <= 0:
        dp = max(1, len(devices) // mp)
    n = dp * mp
    if n > len(devices):
        raise ValueError(
            f"mesh ({dp}x{mp}) needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dp, mp)
    return Mesh(dev_array, (DP_AXIS, MP_AXIS))


def episode_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (task/meta-batch) axis of episode leaves over dp."""
    return NamedSharding(mesh, P(DP_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def put_episode(episode, mesh: Mesh):
    """Place an episode with its task axis sharded over dp."""
    sharding = episode_sharding(mesh)
    return jax.device_put(episode, sharding)


# resharding programs cached per mesh: a fresh `jax.jit(lambda a: a)` has a
# new function identity every call, so an uncached version would retrace at
# every eval-boundary fetch on a multi-host mesh
_RESHARD_FN_CACHE: dict = {}


def _reshard_replicated(mesh: Mesh):
    fn = _RESHARD_FN_CACHE.get(mesh)
    if fn is None:
        fn = jax.jit(lambda a: a,
                     out_shardings=NamedSharding(mesh, P()))
        _RESHARD_FN_CACHE[mesh] = fn
    return fn


def host_fetch(x) -> np.ndarray:
    """``np.asarray`` that also works on multi-host global arrays.

    Replicated arrays (losses, pmean'd metrics) are fully addressable from
    every process and fetch directly. Arrays sharded across hosts — e.g.
    mp-sharded pjit weights, or jit-chosen output shardings under a
    pod-wide mesh — span non-addressable devices, so they are re-placed
    replicated first (a collective; every process must call this at the
    same point, which the harness's lockstep loops guarantee)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        mesh = getattr(x.sharding, "mesh", None)
        if isinstance(mesh, Mesh):
            x = _reshard_replicated(mesh)(x)
        else:  # no concrete mesh on the sharding: gather across processes
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)
