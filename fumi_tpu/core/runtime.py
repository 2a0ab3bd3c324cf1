"""Runtime setup: persistent compilation cache + virtual-mesh env.

Chunked training/eval programs take tens of seconds to minutes to compile
through remote-compile TPU runtimes; JAX's persistent cache reuses the
compiled binaries across processes (measured 15.2 s -> 5.7 s for the
flagship train chunk). Enabled by the CLI, bench, and the graft entry;
override the location with FUMI_TPU_CACHE_DIR, disable with
FUMI_TPU_CACHE_DIR=0.
"""

from __future__ import annotations

import os


def virtual_cpu_env(n_devices: int, base: dict = None) -> dict:
    """Subprocess env for an n-device virtual CPU mesh (SURVEY §4's fake
    backend for multi-chip tests). One shared definition — the multichip
    dryrun and the multi-host tests both sanitize the same platform quirks:

    - JAX_PLATFORMS=cpu, and PALLAS_AXON_POOL_IPS cleared (the image's
      sitecustomize registers an accelerator PJRT plugin and force-sets
      JAX_PLATFORMS whenever that var is present);
    - the persistent compilation cache disabled (it may hold XLA:CPU AOT
      results compiled on a different host profile — SIGILL risk);
    - ``--xla_force_host_platform_device_count=<n>`` replacing any stale
      value in XLA_FLAGS.
    """
    env = dict(os.environ if base is None else base)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")]
    kept.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(kept)
    return env

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "fumi_tpu_xla")
_done = False


def setup_cache(path: str = None) -> None:
    global _done
    if _done:
        return
    path = path or os.environ.get("FUMI_TPU_CACHE_DIR", _DEFAULT)
    if path in ("0", "off", "none"):
        return
    import jax
    if jax.default_backend() == "cpu":
        # CPU compiles are fast, and XLA:CPU persists AOT code specialized
        # to the compiling machine's ISA features — reloading it on a
        # different host risks SIGILL (the cache dir outlives the machine).
        # The cache exists for the minutes-long REMOTE TPU compiles.
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _done = True
