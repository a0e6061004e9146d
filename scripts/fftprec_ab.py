"""On-chip A/B: DSP matmul precision (bf16 pass count) on the headline
fused program.

The r4 device trace shows the CT base-DFT matmuls running AT the
f32-HIGHEST ceiling (~33 TFLOP/s = 6 bf16 passes on v5e), i.e. the
precision passes are paid in wall-clock.  Precision.HIGH (3 passes)
doubles and DEFAULT (1 pass) sextuples that sub-portion's throughput at
an accuracy cost this script MEASURES rather than guesses: per-metric
max deltas of the well-conditioned (broadband-noise) sweep vs the f64
host oracle, per variant — the same protocol as bench.py's accuracy
section.  Timing is the pipelined marginal of the identity headline
program, interleaved in ONE process (cross-process numbers are
weather-dominated — CLAUDE.md).

Usage: python scripts/fftprec_ab.py [variants, default: highest high default]
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
from ssr_eval_tpu.harness.testee import BatchedTestee  # noqa: E402

_ENV = "SSR_EVAL_TPU_DSP_PRECISION"


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
    variants = sys.argv[1:] or ["highest", "high", "default"]
    tmp = tempfile.mkdtemp(prefix="ssr_fftprec_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    rng_noise = np.random.default_rng(777)
    noise = (1e-3 * rng_noise.standard_normal(1 << 17)).astype(np.float32)

    # f64 oracle on the accuracy subsample (host work, before any timing)
    oracle = {
        p: bench._f64_pipeline_one(p, bench.CUTOFFS, noise=noise)
        for p in paths[: bench.N_BASE]
    }

    engines = {}
    acc = {}
    compile_s = {}
    prev = os.environ.get(_ENV)
    try:
        for v in variants:
            os.environ[_ENV] = v
            t0 = time.perf_counter()
            eng = bench._engine(specs, BatchedTestee())
            eng.evaluate_files(paths)  # trace + warm under this env
            noisy_eng = bench._engine(specs, bench._make_noisy_testee(noise))
            res = noisy_eng.evaluate_files(paths[: bench.N_BASE])
            compile_s[v] = round(time.perf_counter() - t0, 1)
            engines[v] = eng
            d = {m: 0.0 for m in ("lsd", "log_sispec", "sispec", "ssim")}
            for p, ref in oracle.items():
                for key in ref:
                    for m in d:
                        a, b = res[p][key][m], ref[key][m]
                        if np.isfinite(a) and np.isfinite(b):
                            d[m] = max(d[m], abs(a - b))
            acc[v] = d
            print(f"[{v}] warm {compile_s[v]}s  max|delta vs f64|: "
                  + ", ".join(f"{m}={d[m]:.3e}" for m in d), flush=True)
    finally:
        if prev is None:
            os.environ.pop(_ENV, None)
        else:
            os.environ[_ENV] = prev

    progs = {v: _fused_program(e) for v, e in engines.items()}
    for v, (fn, args) in progs.items():
        _force(fn(*args))

    K = 12
    t1 = {v: None for v in variants}
    tK = {v: None for v in variants}
    for rep in range(4):
        for v in variants:
            fn, args = progs[v]
            t0 = time.perf_counter()
            _force(fn(*args))
            dt = time.perf_counter() - t0
            t1[v] = dt if t1[v] is None else min(t1[v], dt)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            _force(outs[-1])
            dt = time.perf_counter() - t0
            tK[v] = dt if tK[v] is None else min(tK[v], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(f"{v}={(tK[v] - t1[v]) / (K - 1) * 1e3:.1f}" for v in variants),
            flush=True,
        )

    out = {
        "variants": variants,
        "compile_warm_s": compile_s,
        "one_call_ms": {v: round(t1[v] * 1e3, 2) for v in variants},
        "pipelined_marginal_ms_per_call": {
            v: round((tK[v] - t1[v]) / (K - 1) * 1e3, 2) for v in variants
        },
        "k": K,
        "max_abs_delta_vs_f64_oracle": acc,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
