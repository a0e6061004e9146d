"""ssr_eval_tpu — a TPU-native speech-super-resolution evaluation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ``haoheliu/ssr_eval``
(reference: /root/reference). The public API mirrors the reference
(`SSR_Eval_Helper`, `BasicTestee`, `test`; cf. reference ssr_eval/__init__.py:1-2)
while the implementation is TPU-first:

- All DSP (STFT/iSTFT, IIR zero-phase filtering, polyphase resampling,
  spectrogram metrics) runs as jitted XLA / Pallas kernels, batched over
  utterances and sharded over a `jax.sharding.Mesh`.
- Host work is reduced to audio codec IO at the edges (C++-accelerated
  wav/flac with a pure-NumPy fallback).
- Aggregation is an XLA reduction instead of a Python loop.

The reference's results-JSON schema and degradation key naming
(`proc_fft_<2*cutoff>_<sr>` etc., reference eval.py:305,340,358,374,390,406,417)
are preserved bit-compatibly.
"""

__version__ = "0.1.0"

from ssr_eval_tpu.harness.helper import SSR_Eval_Helper
from ssr_eval_tpu.harness.testee import BasicTestee, BatchedTestee

# Bound last so `ssr_eval_tpu.test` is the callable, not the shim module —
# the same shadowing order as the reference's __init__ (ssr_eval/__init__.py:2).
from ssr_eval_tpu.test import test

__all__ = [
    "SSR_Eval_Helper",
    "BasicTestee",
    "BatchedTestee",
    "test",
    "__version__",
]
