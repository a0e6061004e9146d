"""On-chip A/B: NVSR BN-folding (fold_bn) — folded vs unfolded, adjudicated
by the INTERLEAVED pipelined marginal of the two compiled fused programs.

r4's verdict rested on sequential whole-pass timings, which through the
tunnel are weather-dominated (three runs gave +31%, -13%, +5.4% — all
noise around an a-priori ~0-5% effect: folding removes a per-channel
affine from ~50 conv blocks).  This script times the two programs
synced, alternating, in ONE process on device-resident zero args — the
protocol CLAUDE.md records as stable to ~1 ms — plus a metric-agreement
check on real audio.  VERDICT r4 #2: if the stable effect is <5% (r3's
keep-threshold), the bench default flips to unfolded.

Usage: python scripts/foldbn_ab.py [n_utts, default 16]
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
from ssr_eval_tpu.models.testees import NVSRTestee  # noqa: E402

BATCH, FOLD = 16, 112  # the benched bf16 config


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
    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else BATCH
    tmp = tempfile.mkdtemp(prefix="ssr_foldbn_ab_")
    paths = bench._make_dataset(tmp, n_utts)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    variants = ("folded", "unfolded")
    engines, results = {}, {}
    for name in variants:
        nv = NVSRTestee(
            model_name="unet", dtype=jnp.bfloat16, fold_bn=(name == "folded")
        )
        eng = bench._engine(specs, nv, batch=BATCH, infer_fold_max=FOLD)
        t0 = time.perf_counter()
        results[name] = eng.evaluate_files(paths)
        print(f"[{name}] warm {time.perf_counter() - t0:.1f}s", flush=True)
        engines[name] = eng

    # metric agreement on real audio (exactness beyond bf16 noise is
    # covered by tests/test_models.py's fold_bn tests)
    dmax = 0.0
    for p in paths:
        for key in results["folded"][p]:
            for m in results["folded"][p][key]:
                a = results["folded"][p][key][m]
                b = results["unfolded"][p][key][m]
                if np.isfinite(a) and np.isfinite(b):
                    dmax = max(dmax, abs(a - b))
    print(f"[check] max |delta metric| folded vs unfolded: {dmax:.2e}", flush=True)

    progs = {name: _fused_program(engines[name]) for name in variants}
    for name, (fn, args) in progs.items():
        _force(fn(*args))  # warm on zeros

    K = 8
    t1 = {name: None for name in variants}
    tK = {name: None for name in variants}
    for rep in range(4):
        for name in variants:
            fn, args = progs[name]
            t0 = time.perf_counter()
            _force(fn(*args))
            dt = time.perf_counter() - t0
            t1[name] = dt if t1[name] is None else min(t1[name], dt)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            _force(outs[-1])
            dt = time.perf_counter() - t0
            tK[name] = dt if tK[name] is None else min(tK[name], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(
                f"{n}={(tK[n] - t1[n]) / (K - 1) * 1e3:.1f}" for n in variants
            ),
            flush=True,
        )

    marg = {
        n: round((tK[n] - t1[n]) / (K - 1) * 1e3, 2) for n in variants
    }
    out = {
        "config": {"batch": BATCH, "fold": FOLD, "dtype": "bf16", "k": K},
        "one_call_ms": {n: round(t1[n] * 1e3, 2) for n in variants},
        "pipelined_marginal_ms_per_call": marg,
        "fold_speedup": round(marg["unfolded"] / marg["folded"], 4),
        "max_abs_delta_metric": float(dmax),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
