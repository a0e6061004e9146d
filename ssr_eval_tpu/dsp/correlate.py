"""Full cross-correlation via FFT (replaces scipy.signal.correlate at
reference eval.py:319 for MP3 decode-alignment) — device-side, O(N log N)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def cross_correlate_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.correlate(a, b, mode='full') for 1-D real inputs.

    c[k] = sum_n a[n] * b[n - k + len(b) - 1],  k in [0, la + lb - 1).
    Computed as linear convolution of `a` with reversed `b` via rFFT.
    """
    la, lb = a.shape[0], b.shape[0]
    n = _next_pow2(la + lb - 1)
    A = jnp.fft.rfft(a, n=n)
    B = jnp.fft.rfft(b[::-1], n=n)
    return jnp.fft.irfft(A * B, n=n)[: la + lb - 1]


def align_by_correlation(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Shift `y` to best-align with `x` (reference eval.py:319-320,272-278).

    shift = argmax(correlate(y, x)) - len(x); positive shift drops the head
    of y, negative shift delays it (zero fill), exactly like the reference's
    `shift` helper.
    """
    c = cross_correlate_full(y, x)
    shift = jnp.argmax(c) - x.shape[0]
    n = y.shape[0]
    idx = jnp.arange(n) + shift
    valid = (idx >= 0) & (idx < n)
    return jnp.where(valid, y[jnp.clip(idx, 0, n - 1)], 0.0)
