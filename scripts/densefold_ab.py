"""On-chip A/B: dense-rDFT window/scale fold (spectral._DENSE_FOLD).

"unfold" (the pre-fold form) applies the Hann window as an elementwise
pass over the framed [frames, n_fft] slab on the forward STFT, and
window + hermitian scale + 1/N as three elementwise passes around the
inverse matmuls.  "fold" carries all of them inside the precomputed
f64-built constant matrices (_dft_matrices_windowed /
_idft_matrices_windowed) — mathematically exact, removes the slab
passes from a transform-pass-bound program.

Variants may also toggle the OLA lowering form (spectral._OLA_MODE:
"dus" = sequential .at[].add passes, "padsum" = one pad-and-sum fusion;
bitwise identical by construction, tests/test_spectral.py).

Interleaved in ONE process, same protocol as scripts/wsspatch_ab.py.

Usage: python scripts/densefold_ab.py [variants...]
  variant tokens: unfold | fold | unfold+padsum | fold+padsum
  default: unfold fold fold+padsum
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


def _parse_variant(tok):
    parts = tok.split("+")
    assert parts[0] in ("unfold", "fold"), tok
    ola = "dus"
    for p in parts[1:]:
        assert p in ("dus", "padsum"), tok
        ola = p
    return tok, parts[0] == "fold", ola


def main():
    toks = sys.argv[1:] or ["unfold", "fold", "fold+padsum"]
    variants = [_parse_variant(t) for t in toks]
    modes = [t for t, _, _ in variants]
    tmp = tempfile.mkdtemp(prefix="ssr_densefold_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    names = {m: m for m in modes}
    engines = {}
    results = {}
    compile_s = {}
    prev = (spectral._DENSE_FOLD, spectral._OLA_MODE)
    try:
        for m, fold, ola in variants:
            spectral._DENSE_FOLD = fold
            spectral._OLA_MODE = ola
            t0 = time.perf_counter()
            eng = bench._engine(specs, BatchedTestee())
            results[m] = eng.evaluate_files(paths)
            compile_s[m] = round(time.perf_counter() - t0, 1)
            engines[m] = eng
            print(f"[{m}] warm {compile_s[m]}s", flush=True)
    finally:
        spectral._DENSE_FOLD, spectral._OLA_MODE = prev

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
        deltas[m] = float(d)
    print(f"[check] max |delta metric| vs {mode0}: {deltas}", flush=True)

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
            + ", ".join(
                f"{names[m]}={(tK[m] - t1[m]) / (K - 1) * 1e3:.1f}" for m in modes
            ),
            flush=True,
        )

    out = {
        "modes": [names[m] for m in modes],
        "compile_warm_s": {names[m]: compile_s[m] for m in modes},
        "one_call_ms": {names[m]: round(t1[m] * 1e3, 2) for m in modes},
        "pipelined_marginal_ms_per_call": {
            names[m]: round((tK[m] - t1[m]) / (K - 1) * 1e3, 2) for m in modes
        },
        "k": K,
        "max_abs_delta_metric_vs_first_mode": deltas,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
