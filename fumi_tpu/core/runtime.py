"""Runtime setup: persistent compilation cache.

Chunked training/eval programs take tens of seconds to minutes to compile
through remote-compile TPU runtimes; JAX's persistent cache reuses the
compiled binaries across processes (measured 15.2 s -> 5.7 s for the
flagship train chunk). Enabled by the CLI, bench, and the graft entry;
override the location with FUMI_TPU_CACHE_DIR, disable with
FUMI_TPU_CACHE_DIR=0.
"""

from __future__ import annotations

import os

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
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _done = True
