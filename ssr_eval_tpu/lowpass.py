"""Drop-in module-path shim for the reference's `ssr_eval.lowpass`."""

from ssr_eval_tpu.degrade.lowpass import (
    align_length,
    bandpass,
    limit,
    lowpass,
    subsampling,
)

__all__ = ["align_length", "bandpass", "limit", "lowpass", "subsampling"]
