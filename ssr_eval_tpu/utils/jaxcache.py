"""Persistent XLA compilation cache.

The tunneled TPU backend costs ~30 s per program compile; the persistent
cache turns repeat compiles (across processes and rounds) into sub-second
loads.  Enabled once, idempotently, by the engine/bench/entry points.
Opt out with SSR_EVAL_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import hashlib
import os
import platform

_done = False


def host_fingerprint() -> str:
    """Stable 8-hex id of this host's CPU ISA surface.

    XLA:CPU AOT executables are keyed only by program + compile options,
    not by the compiling host's machine features; loading an artifact
    built on a host with a different feature set (e.g. AMX/AVX512
    variants across this fleet) aborts with cpu_aot_loader errors at
    best and SIGILL/SIGSEGV at worst (observed: bench segfault in r4).
    Scoping the cache directory per ISA fingerprint makes stale
    cross-host artifacts unreachable instead of relying on the loader.
    """
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feat}"
    return hashlib.sha256(raw.encode()).hexdigest()[:8]


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
        # Even with a TPU default backend, programs explicitly placed on
        # the live CPU backend land in the same cache dir, so the dir is
        # scoped per host-ISA fingerprint (see host_fingerprint).
        path = path or os.path.join(
            os.path.expanduser("~"),
            ".cache",
            "ssr_eval_tpu",
            f"xla-{host_fingerprint()}",
        )
        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _done = True
