"""Persistent XLA compilation cache.

The tunneled TPU backend costs ~30 s per program compile; the persistent
cache turns repeat compiles (across processes and rounds) into sub-second
loads.  Enabled once, idempotently, by the engine/bench/entry points.
Opt out with SSR_EVAL_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _done
    if _done or os.environ.get("SSR_EVAL_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        # TPU-only: the tunnel's remote compiles are what cost ~30 s.  CPU
        # programs compile fast AND cached CPU AOT artifacts may carry
        # machine features the current host lacks (SIGILL risk observed
        # with cross-process cache reuse on this fleet).
        if jax.default_backend() != "tpu":
            _done = True
            return
        path = path or os.path.join(os.path.expanduser("~"), ".cache", "ssr_eval_tpu", "xla")
        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _done = True
