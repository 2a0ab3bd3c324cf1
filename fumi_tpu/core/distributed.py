"""Multi-host (DCN) initialization and process-role helpers.

SURVEY §5.8: the single-slice (ICI) path needs nothing beyond a local mesh;
multi-host pods coordinate via ``jax.distributed.initialize`` before any
backend use. The CLI becomes one process of a multi-host run through the
``--tpu_dist_*`` flags (or a bare :func:`initialize` on TPU pods, where the
coordinator/process env is auto-detected from GKE/TPU-VM metadata).

After initialization, ``jax.devices()`` spans the pod and
``fumi_tpu.core.mesh.make_mesh`` builds pod-wide meshes; the episode-parallel
engines need no changes — their shard_map collectives ride whatever mesh
they get, dp groups map onto ICI-contiguous devices (``make_mesh``'s default
device order preserves locality), and every engine output is replicated
(losses/metrics pmean/psum-reduced, artifacts all_gathered inside the
shard), so each process can fetch results from its addressable shards.

Per-host data policy: every host holds the full (replicated) embedding
tables and the device samplers draw per-shard episodes on-device from a
shared key stream, so there is NO per-host input pipeline to coordinate.
Artifact policy: run dirs / JSONL / CSV get a per-process suffix (hosts on
a shared filesystem cannot collide; per-host filesystems each keep a local
copy — checkpoints hold replicated arrays, so every host's copy is the
same); wandb logging runs on process 0 only.

Tested end to end in ``tests/test_distributed.py``: two coordinated CPU
processes (4 virtual devices each) run the full CLI on a global dp=8 mesh
and must produce identical replicated test metrics.
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


def initialize_from_config(cfg) -> bool:
    """Initialize multi-host coordination from ``--tpu_dist_*`` flags.

    Returns True when a multi-host topology was requested (and therefore
    initialized). Must run before any other JAX backend use.
    """
    if cfg.dist_coordinator is None and cfg.dist_num_processes <= 0:
        return False
    initialize(
        coordinator_address=cfg.dist_coordinator,
        num_processes=(cfg.dist_num_processes
                       if cfg.dist_num_processes > 0 else None),
        process_id=(cfg.dist_process_id
                    if cfg.dist_process_id >= 0 else None))
    return True


def is_multihost() -> bool:
    import jax
    return jax.process_count() > 1


def is_primary() -> bool:
    """True for the process that owns singleton side effects (wandb)."""
    import jax
    return jax.process_index() == 0


def process_tag() -> str:
    """Per-process artifact suffix: '' single-process, '-pN' multi-host."""
    import jax
    return f"-p{jax.process_index()}" if jax.process_count() > 1 else ""
