"""DSP matmul precision policy (TPU bf16 pass selection).

TPU MXU matmuls are bf16 multiply-accumulate; float32 operands are
emulated by splitting each operand into bf16 limbs and accumulating
multiple passes.  ``jax.lax.Precision`` selects the pass count:

    DEFAULT  1 pass   (~197 TFLOP/s v5e peak, ~bf16 accuracy)
    HIGH     3 passes (~66 TFLOP/s)
    HIGHEST  6 passes (~33 TFLOP/s, f32-equivalent)

Governs the FFT/DFT matmuls (CT base DFT in dsp/fft_matmul.py, the
dense non-pow2 DFT in dsp/spectral.py) — the sites the r4 device trace
showed running AT the precision-pass ceiling.  The polyphase resampler
and mel fbank matmuls stay HIGHEST (not measured hot; parity-sensitive).

Default: **HIGH**, adjudicated by interleaved one-process on-chip A/B
(scripts/fftprec_ab.py, r5): headline fused marginal 83.5 -> 79.1
ms/batch (-5.2%) with max |dLSD| vs the f64 oracle 5.5e-5 (44.1 kHz CT
path; HIGHEST's own floor is 2.0e-6) and 7.8e-5 high-vs-highest on the
48 kHz dense-DFT path — 13-18x inside the <1e-3 product tolerance.
DEFAULT (1 pass) is a recorded dead end for this workload: -14.7% time
but |dLSD| 4.5e-2 / dSSIM 5.1e-3 — single-pass bf16 destroys the
spectral floors the metrics integrate (docs/DESIGN.md "Precision
policy").  ``SSR_EVAL_TPU_DSP_PRECISION=highest`` restores f32-exact
matmuls for last-digit parity work; ``AudioMetrics(precision="float64")``
remains the exact host path.

Read at TRACE time: engines jit per-instance, so an A/B can build one
engine per env setting in a single process.

Coupling: the CT MXU base width's optimum depends on this policy (the
pass count re-prices base-matmul FLOPs vs butterfly HBM passes) AND on
the rfft mode (which decides WHICH programs CT serves) — re-run
scripts/ctbase_ab.py / ctbase_iir_ab.py whenever the default here
moves (fft_matmul._default_base records all three eras: 256 at
HIGHEST, 512 at HIGH on the STFT sites, 128 at HIGH on the IIR filter
blocks once dense-rDFT took the STFT sites).
"""

from __future__ import annotations

import os

import jax

_LEVELS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def dsp_precision() -> jax.lax.Precision:
    """The Precision for FFT/DFT matmuls, from SSR_EVAL_TPU_DSP_PRECISION
    (highest | high | default); unknown or unset values mean HIGH."""
    name = os.environ.get("SSR_EVAL_TPU_DSP_PRECISION", "high").strip().lower()
    return _LEVELS.get(name, jax.lax.Precision.HIGH)
