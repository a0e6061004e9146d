"""On-chip A/B: spec-loop lowering variants on the headline fused program
— lax.map (baseline), scan-unroll, and the spec-FLAT fold.

The r4 device trace books ~25% of the fused call in copy/reshape/
dynamic-update-slice from `lax.map` state threading; unrolling the spec
loops (`lax.scan(unroll=k)`) trades loop-carried copies for a k-times
bigger HLO body, and the flat fold ("flat") removes the loops entirely by
folding the spec axis into the leading batch dim (VERDICT r4 #1).
Interleaves the variants' pipelined-marginal measurements in ONE process
(cross-process timing through the tunnel is weather-dominated —
CLAUDE.md).  Prints a JSON summary.

Usage: python scripts/unroll_ab.py [variants, default 1 2 7 flat]
       (ints = scan-unroll factors, 1 = lax.map; "flat" = spec fold)
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

import bench  # noqa: E402  (constants + dataset/engine builders)
from ssr_eval_tpu.degrade.plan import expand_settings  # noqa: E402
from ssr_eval_tpu.harness.testee import BatchedTestee  # noqa: E402


def _fused_program(eng):
    entries = [
        (k, v) for k, v in eng._cost_args.items() if k and k[0] == "fused"
    ]
    assert len(entries) == 1, [k for k, _ in entries]
    _, (fn, aargs) = entries[0]
    args = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aargs)
    return fn, args


def _force(o):
    m = o[0] if isinstance(o, tuple) else o
    return np.asarray(m)


def main():
    factors = [
        a if a in ("flat", "single") else int(a) for a in sys.argv[1:]
    ] or [1, 2, 7, "flat"]
    tmp = tempfile.mkdtemp(prefix="ssr_unroll_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    engines = {}
    results = {}
    compile_s = {}
    for u in factors:
        if u == "flat":
            eng = bench._engine(specs, BatchedTestee(), spec_flat=True)
        elif u == "single":
            eng = bench._engine(specs, BatchedTestee(), spec_single=True)
        else:
            eng = bench._engine(specs, BatchedTestee(), spec_unroll=u)
        t0 = time.perf_counter()
        results[u] = eng.evaluate_files(paths)  # compile + warm
        compile_s[u] = round(time.perf_counter() - t0, 1)
        engines[u] = eng
        print(f"[unroll={u}] warm {compile_s[u]}s", flush=True)

    # metric agreement vs the lax.map baseline (fusion regrouping may
    # move low bits; anything beyond ~1e-5 would be a red flag)
    base = factors[0]
    deltas = {}
    for u in factors[1:]:
        d = 0.0
        for p in paths:
            for key in results[base][p]:
                for m in results[base][p][key]:
                    a, b = results[base][p][key][m], results[u][p][key][m]
                    if np.isfinite(a) and np.isfinite(b):
                        d = max(d, abs(a - b))
        deltas[u] = d
    print(f"[check] max |delta metric| vs unroll={base}: {deltas}", flush=True)

    progs = {u: _fused_program(e) for u, e in engines.items()}
    for u, (fn, args) in progs.items():
        _force(fn(*args))  # ensure warm on zeros

    K = 12
    t1 = {u: None for u in factors}
    tK = {u: None for u in factors}
    for rep in range(4):
        for u in factors:
            fn, args = progs[u]
            t0 = time.perf_counter()
            _force(fn(*args))
            dt = time.perf_counter() - t0
            t1[u] = dt if t1[u] is None else min(t1[u], dt)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            _force(outs[-1])
            dt = time.perf_counter() - t0
            tK[u] = dt if tK[u] is None else min(tK[u], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(
                f"u{u}={(tK[u] - t1[u]) / (K - 1) * 1e3:.1f}" for u in factors
            ),
            flush=True,
        )

    out = {
        "factors": factors,
        "compile_warm_s": compile_s,
        "one_call_ms": {u: round(t1[u] * 1e3, 2) for u in factors},
        "pipelined_marginal_ms_per_call": {
            u: round((tK[u] - t1[u]) / (K - 1) * 1e3, 2) for u in factors
        },
        "k": K,
        "max_abs_delta_metric_vs_base": {u: float(d) for u, d in deltas.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
