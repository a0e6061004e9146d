"""Accuracy gate for the IIR CT-base A/B (scripts/ctbase_iir_ab.py):
max relative waveform error of the device zero-phase filter vs scipy
float64 `sosfiltfilt`, per base, ON CHIP — the path the base width
actually serves after the r5 dense-rDFT flip routed the STFT sites
around Cooley-Tukey.

The IIR degrade output feeds the metric STFTs directly, so waveform-
level agreement at ~1e-5 rel bounds the metric deltas well inside the
<1e-3 tolerance (the metric floors move by O(err)).

Usage: python scripts/ctbase_iir_acc.py [bases, default 128 512]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402
from scipy import signal  # noqa: E402

import bench  # noqa: E402
from ssr_eval_tpu.dsp import fft_matmul  # noqa: E402
from ssr_eval_tpu.dsp.filters import (  # noqa: E402
    blocked_plan_arrays,
    design_lowpass_sos,
    make_filtfilt_plan,
    response_len,
    sosfiltfilt_blocked,
)
from ssr_eval_tpu.degrade.apply import IIR_BLOCK_MIN  # noqa: E402
from ssr_eval_tpu.dsp.filters import _next_pow2  # noqa: E402
from ssr_eval_tpu.harness.fixtures import speechlike  # noqa: E402


def main():
    bases = [int(a) for a in sys.argv[1:]] or [128, 512]
    x64 = speechlike(3.0, bench.SR, 0).astype(np.float64)
    L = x64.shape[0]
    x32 = x64.astype(np.float32)

    cases = [
        (ftype, 8, float(c))
        for ftype in ("butter", "cheby1")
        for c in bench.CUTOFFS
    ]

    out = {}
    prev = fft_matmul._BASE
    try:
        for b in bases:
            fft_matmul._BASE = b
            worst = 0.0
            for ftype, order, cut in cases:
                sos = design_lowpass_sos(ftype, order, cut, bench.SR)
                ref = signal.sosfiltfilt(sos, x64)
                plan = make_filtfilt_plan(sos, L)
                block = max(_next_pow2(response_len(sos)), IIR_BLOCK_MIN)
                (Hr, Hi), r = blocked_plan_arrays(plan, block, truncate=True)
                y = sosfiltfilt_blocked(
                    jnp.asarray(x32), L, plan.edge,
                    (jnp.asarray(Hr), jnp.asarray(Hi)), jnp.asarray(r),
                    block, plan.edge,
                )
                err = np.max(np.abs(np.asarray(y)[:L] - ref)) / (
                    np.max(np.abs(ref)) + 1e-30
                )
                worst = max(worst, float(err))
            out[b] = worst
            print(
                f"[base={b}] worst rel waveform err vs f64 scipy: {worst:.3e}",
                flush=True,
            )
    finally:
        fft_matmul._BASE = prev

    print(json.dumps({"bases": bases, "worst_rel_err": {str(b): out[b] for b in bases}}))


if __name__ == "__main__":
    main()
