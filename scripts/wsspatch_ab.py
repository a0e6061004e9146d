"""On-chip A/B: iSTFT window-sum-square masking form (spectral._WSS_MODE).

"slice" (r4 closed form) subtracts a per-utterance full-length
dynamic_slice of the shifted constant — vmapped, that lowers to a
sequential per-row [total]-copy loop (~4 ms/call booked to while.30 +
dynamic-update-slice.102 in the r5 device trace).  "patch" divides by
the broadcast constant and exactly recomputes the single static-size
window where the shifted term is nonzero and the output is kept
(bit-identical; verified across bucket-edge lengths in
tests/test_spectral.py).

Interleaved in ONE process, same protocol as scripts/ctbase_ab.py.

Usage: python scripts/wsspatch_ab.py [modes, default slice patch]
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
from ssr_eval_tpu.dsp import spectral  # noqa: E402
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
    modes = sys.argv[1:] or ["slice", "patch"]
    assert all(m in ("slice", "patch") for m in modes), modes
    tmp = tempfile.mkdtemp(prefix="ssr_wss_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    engines = {}
    results = {}
    compile_s = {}
    prev = spectral._WSS_MODE
    try:
        for m in modes:
            spectral._WSS_MODE = m
            t0 = time.perf_counter()
            eng = bench._engine(specs, BatchedTestee())
            results[m] = eng.evaluate_files(paths)
            compile_s[m] = round(time.perf_counter() - t0, 1)
            engines[m] = eng
            print(f"[wss={m}] warm {compile_s[m]}s", flush=True)
    finally:
        spectral._WSS_MODE = prev

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
    print(f"[check] max |delta metric| vs wss={mode0}: {deltas}", flush=True)

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
