"""On-chip A/B: CT FFT MXU base-DFT width measured on its REMAINING hot
user — the IIR filter family's overlap-save block transforms.

The r5 dense-rDFT default (scripts/rfftmode_ab.py) routed the STFT
sites around Cooley-Tukey entirely, which invalidates the basis of the
512-wins adjudication (scripts/ctbase_ab.py measured the fft-family
fused program).  After the flip, `fft_matmul._BASE` is only hot inside
dsp/filters.py's 2·B-point block FFTs (B >= 1024) plus the iSTFT those
programs share, so the optimum must be re-measured on an IIR-family
fused program.  Same interleaved one-process protocol as ctbase_ab.

Usage: python scripts/ctbase_iir_ab.py [bases, default 128 256 512 1024]
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


def _fused_programs(eng):
    """All fused programs of the engine (the IIR sweep compiles one per
    overlap-save block size B — fkey ('iir', B)); marginals are summed
    across them since a full sweep pass executes each once per batch."""
    entries = [(k, v) for k, v in eng._cost_args.items() if k and k[0] == "fused"]
    assert entries, list(eng._cost_args)
    out = []
    for _, (fn, aargs) in entries:
        args = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aargs)
        out.append((fn, args))
    return out


def _force(o):
    m = o[0] if isinstance(o, tuple) else o
    return np.asarray(m)


def main():
    bases = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024]
    tmp = tempfile.mkdtemp(prefix="ssr_ctbase_iir_ab_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    # Butterworth + Chebyshev over the headline cutoffs at the reference's
    # clamped-max order 8 — the sweep shape of eval.py:244-262, all of it
    # landing on dsp/filters.py's overlap-save CT blocks.
    specs = expand_settings(
        setting_lowpass_filtering={
            "filter": ["butter", "cheby"],
            "cutoff_freq": [2 * c for c in bench.CUTOFFS],
            "filter_order": [8],
        },
        sr=bench.SR,
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

    progs = {b: _fused_programs(e) for b, e in engines.items()}
    for b, plist in progs.items():
        for fn, args in plist:
            _force(fn(*args))

    K = 12
    t1 = {b: None for b in bases}  # summed one-call s across programs
    tK = {b: None for b in bases}  # summed K-call s across programs
    for rep in range(4):
        for b in bases:
            s1 = sK = 0.0
            for fn, args in progs[b]:
                t0 = time.perf_counter()
                _force(fn(*args))
                s1 += time.perf_counter() - t0
                t0 = time.perf_counter()
                outs = [fn(*args) for _ in range(K)]
                _force(outs[-1])
                sK += time.perf_counter() - t0
            t1[b] = s1 if t1[b] is None else min(t1[b], s1)
            tK[b] = sK if tK[b] is None else min(tK[b], sK)
        print(
            f"[rep {rep}] marginal ms/sweep-pass: "
            + ", ".join(f"b{b}={(tK[b] - t1[b]) / (K - 1) * 1e3:.1f}" for b in bases),
            flush=True,
        )

    out = {
        "family": "iir(butter+cheby1, order 8)",
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
