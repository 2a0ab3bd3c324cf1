"""Multi-host (DCN) initialization.

SURVEY §5.8: the single-slice (ICI) path needs nothing beyond a local mesh;
multi-host pods coordinate via ``jax.distributed.initialize`` before any
backend use. This wrapper is the one supported entry point:

- on TPU pods the coordinator/process env is auto-detected (GKE/TPU-VM
  metadata), so a bare :func:`initialize` works;
- elsewhere pass coordinator_address/num_processes/process_id explicitly.

After initialization, ``jax.devices()`` spans the pod and
``fumi_tpu.core.mesh.make_mesh`` builds pod-wide meshes; the episode-parallel
engines need no changes (their collectives ride whatever mesh they get —
dp groups should map onto ICI-contiguous devices, which ``make_mesh``'s
default device order preserves). Per-host data loading: each host holds the
full (replicated) embedding tables; samplers draw per-shard episodes
on-device, so there is NO per-host input pipeline to coordinate.

Untestable in this environment (single tunneled chip) — validated only for
API shape; the multi-chip execution path itself is covered by the virtual
mesh tests and ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with optional explicit topology."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    import jax
    return jax.process_count() > 1
