"""On-chip A/B: CT FFT MXU base-DFT width under the CURRENT precision
default.

The 128/256/512/1024 base sweep was originally adjudicated at
Precision.HIGHEST (fft_matmul._default_base: 140/131/185/155 ms —
256 won).  Each halving of the matmul pass count (dsp/precision.py)
re-prices the "wider base trades matmul FLOPs for butterfly HBM passes"
trade, so the optimum must be re-measured whenever the precision policy
changes.  Interleaved in ONE process; bases are flipped between traces
via `fft_matmul._BASE` (documented hook, resolved at call time).

Usage: python scripts/ctbase_ab.py [bases, default 128 256 512 1024]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ssr_eval_tpu.degrade.plan import expand_settings  # noqa: E402
from ssr_eval_tpu.dsp import fft_matmul  # noqa: E402
from ssr_eval_tpu.harness.testee import BatchedTestee  # noqa: E402


def _fused_program(eng):
    entries = [(k, v) for k, v in eng._cost_args.items() if k and k[0] == "fused"]
    assert len(entries) == 1, [k for k, _ in entries]
    _, (fn, aargs) = entries[0]
    args = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aargs)
    return fn, args


def _force(o):
    m = o[0] if isinstance(o, tuple) else o
    return np.asarray(m)


def main():
    bases = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024]
    tmp = tempfile.mkdtemp(prefix="ssr_ctbase_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    from ssr_eval_tpu.dsp.precision import dsp_precision

    prec = str(dsp_precision()).split(".")[-1].lower()
    engines = {}
    results = {}
    compile_s = {}
    prev = fft_matmul._BASE
    try:
        for b in bases:
            fft_matmul._BASE = b
            t0 = time.perf_counter()
            eng = bench._engine(specs, BatchedTestee())
            results[b] = eng.evaluate_files(paths)
            compile_s[b] = round(time.perf_counter() - t0, 1)
            engines[b] = eng
            print(f"[base={b}] warm {compile_s[b]}s", flush=True)
    finally:
        fft_matmul._BASE = prev

    base0 = bases[0]
    deltas = {}
    for b in bases[1:]:
        d = 0.0
        for p in paths:
            for key in results[base0][p]:
                for m in results[base0][p][key]:
                    a, v = results[base0][p][key][m], results[b][p][key][m]
                    if np.isfinite(a) and np.isfinite(v):
                        d = max(d, abs(a - v))
        deltas[b] = d
    print(f"[check] max |delta metric| vs base={base0}: {deltas}", flush=True)

    progs = {b: _fused_program(e) for b, e in engines.items()}
    for b, (fn, args) in progs.items():
        _force(fn(*args))

    K = 12
    t1 = {b: None for b in bases}
    tK = {b: None for b in bases}
    for rep in range(4):
        for b in bases:
            fn, args = progs[b]
            t0 = time.perf_counter()
            _force(fn(*args))
            dt = time.perf_counter() - t0
            t1[b] = dt if t1[b] is None else min(t1[b], dt)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            _force(outs[-1])
            dt = time.perf_counter() - t0
            tK[b] = dt if tK[b] is None else min(tK[b], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(f"b{b}={(tK[b] - t1[b]) / (K - 1) * 1e3:.1f}" for b in bases),
            flush=True,
        )

    out = {
        "precision": prec,
        "bases": bases,
        "compile_warm_s": compile_s,
        "one_call_ms": {b: round(t1[b] * 1e3, 2) for b in bases},
        "pipelined_marginal_ms_per_call": {
            b: round((tK[b] - t1[b]) / (K - 1) * 1e3, 2) for b in bases
        },
        "k": K,
        "max_abs_delta_metric_vs_first_base": {b: float(d) for b, d in deltas.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
