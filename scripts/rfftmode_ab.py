"""On-chip A/B: rfft/irfft factorization mode under the CURRENT base +
precision defaults (fft_matmul._default_rfft_mode for the three modes).

The r4 "pack trick" adjudication (half-size complex CT + Hermitian
untangle beats the real-as-complex full transform) was made at base 256
under Precision.HIGHEST.  The r5 device trace books the untangle's
lane-axis `reverse` ops at ~1.3 ms per [16,744,1152] flip, and at
base 512 / HIGH the direct path has a single radix-4 butterfly level —
so the trade must be re-measured, exactly like the CT base width.

Interleaved in ONE process; modes are flipped between traces via
`fft_matmul._RFFT_MODE` (resolved at trace time; spectral.py routes
"dense" around CT entirely).

Usage: python scripts/rfftmode_ab.py [modes, default pack direct dense]
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
    modes = sys.argv[1:] or ["pack", "direct", "dense"]
    assert all(m in ("pack", "direct", "dense") for m in modes), modes
    tmp = tempfile.mkdtemp(prefix="ssr_rfftmode_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    from ssr_eval_tpu.dsp.precision import dsp_precision

    prec = str(dsp_precision()).split(".")[-1].lower()
    engines = {}
    results = {}
    compile_s = {}
    prev = fft_matmul._RFFT_MODE
    try:
        for m in modes:
            fft_matmul._RFFT_MODE = m
            t0 = time.perf_counter()
            eng = bench._engine(specs, BatchedTestee())
            results[m] = eng.evaluate_files(paths)
            compile_s[m] = round(time.perf_counter() - t0, 1)
            engines[m] = eng
            print(f"[mode={m}] warm {compile_s[m]}s", flush=True)
    finally:
        fft_matmul._RFFT_MODE = prev

    mode0 = modes[0]
    deltas = {}
    for m in modes[1:]:
        d = 0.0
        for p in paths:
            for key in results[mode0][p]:
                for met in results[mode0][p][key]:
                    a, v = results[mode0][p][key][met], results[m][p][key][met]
                    if np.isfinite(a) and np.isfinite(v):
                        d = max(d, abs(a - v))
        deltas[m] = d
    print(f"[check] max |delta metric| vs mode={mode0}: {deltas}", flush=True)

    progs = {m: _fused_program(e) for m, e in engines.items()}
    for m, (fn, args) in progs.items():
        _force(fn(*args))

    K = 12
    t1 = {m: None for m in modes}
    tK = {m: None for m in modes}
    for rep in range(4):
        for m in modes:
            fn, args = progs[m]
            t0 = time.perf_counter()
            _force(fn(*args))
            dt = time.perf_counter() - t0
            t1[m] = dt if t1[m] is None else min(t1[m], dt)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            _force(outs[-1])
            dt = time.perf_counter() - t0
            tK[m] = dt if tK[m] is None else min(tK[m], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(f"{m}={(tK[m] - t1[m]) / (K - 1) * 1e3:.1f}" for m in modes),
            flush=True,
        )

    out = {
        "precision": prec,
        "ct_base": fft_matmul._BASE,
        "modes": modes,
        "compile_warm_s": compile_s,
        "one_call_ms": {m: round(t1[m] * 1e3, 2) for m in modes},
        "pipelined_marginal_ms_per_call": {
            m: round((tK[m] - t1[m]) / (K - 1) * 1e3, 2) for m in modes
        },
        "k": K,
        "max_abs_delta_metric_vs_first_mode": {m: float(d) for m, d in deltas.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
