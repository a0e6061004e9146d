"""Accuracy gate for the dense-fold A/B (scripts/densefold_ab.py):
per-metric max deltas of the well-conditioned (broadband-noise) sweep vs
the f64 host oracle, fold on/off — the raw cross-mode deltas densefold_ab
prints include ill-conditioned near-cancellation estimates; THIS is the
number the <1e-3 LSD tolerance applies to.

Usage: python scripts/densefold_acc.py
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

import bench  # noqa: E402
from ssr_eval_tpu.degrade.plan import expand_settings  # noqa: E402
from ssr_eval_tpu.dsp import spectral  # noqa: E402


def main():
    modes = [False, True]
    names = {False: "unfold", True: "fold"}
    tmp = tempfile.mkdtemp(prefix="ssr_densefold_acc_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    rng_noise = np.random.default_rng(777)
    noise = (1e-3 * rng_noise.standard_normal(1 << 17)).astype(np.float32)
    oracle = {
        p: bench._f64_pipeline_one(p, bench.CUTOFFS, noise=noise)
        for p in paths[: bench.N_BASE]
    }

    acc = {}
    prev = spectral._DENSE_FOLD
    try:
        for mode in modes:
            spectral._DENSE_FOLD = mode
            t0 = time.perf_counter()
            noisy_eng = bench._engine(specs, bench._make_noisy_testee(noise))
            res = noisy_eng.evaluate_files(paths[: bench.N_BASE])
            d = {m: 0.0 for m in ("lsd", "log_sispec", "sispec", "ssim")}
            for p, ref in oracle.items():
                for key in ref:
                    for m in d:
                        a, v = res[p][key][m], ref[key][m]
                        if np.isfinite(a) and np.isfinite(v):
                            d[m] = max(d[m], abs(a - v))
            acc[names[mode]] = d
            print(
                f"[{names[mode]}] warm {time.perf_counter() - t0:.1f}s  "
                + "max|delta vs f64|: "
                + ", ".join(f"{m}={d[m]:.3e}" for m in d),
                flush=True,
            )
    finally:
        spectral._DENSE_FOLD = prev

    print(json.dumps({"modes": list(acc), "max_abs_delta_vs_f64_oracle": acc}))


if __name__ == "__main__":
    main()
