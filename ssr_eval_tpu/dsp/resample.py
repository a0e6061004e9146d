"""Rational resampling (scipy `resample_poly` semantics) as an MXU matmul.

The reference resamples with scipy ``resample_poly`` (subsampling
degradation, lowpass.py:134-144) and librosa's ``res_type="polyphase"``
(output-rate conversion, eval.py:144-150), and with a sox subprocess for the
ground-truth path (eval.py:133).  All three become this kernel.

TPU-native formulation: upfirdn's zero-stuff -> FIR -> decimate pipeline is
rewritten as a **dense polyphase matmul**.  For output block b and phase p
(k = b*up + p):

    y[k] = sum_j  h_pad[rho_p + up*j] * x[b*down + floor(p*down/up) - j]

Gathering one window ``XW[b, s] = x[b*down + s - (J-1)]`` of S = down+J-1
samples per block and scattering the phase filters into a dense matrix
``Wd[up, S]`` turns the whole resample into  ``Y = XW @ Wd.T`` — a single
[n_blocks, S] x [S, up] matmul that the MXU eats, instead of a strided
scalar loop.  Filter design (firwin + kaiser beta=5.0, scipy's default)
stays host-side in float64, computed once per (sr_in, sr_out) pair.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
from scipy import signal as _sps

import jax
import jax.numpy as jnp


class ResamplePlan(NamedTuple):
    up: int                  # reduced upsample factor
    down: int                # reduced downsample factor
    J: int                   # taps per phase
    S: int                   # gather window per block
    n_pre_remove: int        # leading outputs to drop (upfirdn alignment)
    Wd: np.ndarray           # [up, S] dense phase-filter matrix (f32)
    left: int = -1           # window start offset: XW[b, s] = x[b*down + s - left]
                             # (-1 -> the scipy-plan default J - 1)

    @property
    def left_ext(self) -> int:
        return self.J - 1 if self.left < 0 else self.left

    def out_length(self, in_length):
        """ceil(L * up / down) — works for int or traced lengths."""
        num = in_length * self.up
        return num // self.down + (num % self.down != 0)


def _output_len(len_h: int, in_len: int, up: int, down: int) -> int:
    """scipy.signal.upfirdn output length."""
    return ((in_len - 1) * up + len_h - 1) // down + 1


@functools.lru_cache(maxsize=128)
def resample_poly_plan(sr_in: int, sr_out: int, max_len: int) -> ResamplePlan:
    """Build the dense polyphase plan for a rate pair (scipy-compatible)."""
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    if up == down:
        up = down = 1
    max_rate = max(up, down)
    if up == 1 and down == 1:
        # Identity: single phase, single tap.
        return ResamplePlan(1, 1, 1, 1, 0, np.ones((1, 1), np.float32))

    # Filter design — exactly scipy.signal.resample_poly's default window.
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = _sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    h = h * up
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    n_out = max_len * up // down + bool((max_len * up) % down)
    while (
        _output_len(len(h) + n_pre_pad + n_post_pad, max_len, up, down)
        < n_out + n_pre_remove
    ):
        n_post_pad += 1
    h_pad = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])

    len_hp = len(h_pad)
    J = -(-len_hp // up)  # ceil: max taps in any phase
    S = down + J - 1
    Wd = np.zeros((up, S), dtype=np.float64)
    for p in range(up):
        rho = (p * down) % up
        off = (p * down) // up
        j = np.arange((len_hp - rho + up - 1) // up)
        taps = h_pad[rho + up * j]
        s = off - j + (J - 1)
        Wd[p, s] = taps
    return ResamplePlan(up, down, J, S, n_pre_remove, Wd.astype(np.float32))


@functools.lru_cache(maxsize=64)
def windowed_sinc_plan(
    sr_in: int,
    sr_out: int,
    max_len: int,
    num_zeros: int = 64,
    beta: float = 14.769656459379492,
    rolloff: float = 0.9475937167399596,
) -> ResamplePlan:
    """High-quality windowed-sinc resampler (librosa/resampy
    'kaiser_best'-parameterized: 64 zero crossings, Kaiser beta 14.77,
    rolloff 0.9476; see PARITY.md deviation 1).

    Unlike resampy's table-lookup + linear interpolation, rational rates
    let every phase's taps be evaluated at their *exact* sinc positions,
    so this is the filter resampy approximates.  Each output phase
    becomes a row of the dense polyphase matrix:

        y[b*up + p] = sum_d  h(d - frac_p) * x[off_p + b*down + d]

    with h(t) = scale * rolloff * sinc(rolloff*scale*t) * kaiser(scale*t/N).
    """
    from scipy.special import i0 as _i0

    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    if up == down:
        return ResamplePlan(1, 1, 1, 1, 0, np.ones((1, 1), np.float32), 0)
    scale = min(1.0, up / down)
    half = int(np.ceil(num_zeros / scale)) + 1
    left = half
    S = down + 2 * half + 1
    Wd = np.zeros((up, S), dtype=np.float64)
    d = np.arange(-half, half + 1, dtype=np.float64)
    for p in range(up):
        t_p = p * down / up
        off_p = int(np.floor(t_p))
        frac = t_p - off_p
        tau = (d - frac) * scale
        u = tau / num_zeros
        win = np.where(np.abs(u) <= 1.0, _i0(beta * np.sqrt(np.clip(1 - u * u, 0, 1))) / _i0(beta), 0.0)
        h = scale * rolloff * np.sinc(rolloff * tau) * win
        s = off_p + d.astype(np.int64) + left
        valid = (s >= 0) & (s < S)
        Wd[p, s[valid]] = h[valid]
    J = 2 * half + 1
    return ResamplePlan(up, down, J, S, 0, Wd.astype(np.float32), left)


def apply_resample(x: jnp.ndarray, length, plan: ResamplePlan, out_len: int, Wd: jnp.ndarray):
    """Resample one buffered signal.

    x: [Lmax] buffer (zero beyond true `length` — upfirdn's implicit zero
    padding makes the padded buffer *exactly* equivalent to scipy on the
    valid prefix).  Returns ([out_len] buffer, traced valid output length).
    `Wd` is the device copy of plan.Wd (passed explicitly for sharing).
    """
    if plan.up == 1 and plan.down == 1:
        out = x[:out_len] if x.shape[0] >= out_len else jnp.pad(x, (0, out_len - x.shape[0]))
        return out, length

    up, down, J, S = plan.up, plan.down, plan.J, plan.S
    n_k = plan.n_pre_remove + out_len          # outputs needed
    n_blocks = -(-n_k // up)

    # Window framing: XW[b, s] = x[b*down + s - left], as down-strided
    # contiguous slab slices (frame_slabs) — a 2-D index gather here costs
    # ~20 ms per 8x266k batch on TPU.
    from ssr_eval_tpu.dsp.spectral import frame_slabs

    left = plan.left_ext
    need = (n_blocks - 1) * down + S - left    # rightmost x index + 1
    pad_right = max(0, need - x.shape[0])
    xp = jnp.pad(x, (left, pad_right))
    XW = frame_slabs(xp, down, S, n_blocks)    # [n_blocks, S]

    Y = jnp.dot(XW, Wd.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [n_blocks, up]
    y_full = Y.reshape(n_blocks * up)
    y = y_full[plan.n_pre_remove : plan.n_pre_remove + out_len]

    out_length = plan.out_length(length)
    mask = jnp.arange(out_len) < out_length
    return jnp.where(mask, y, 0.0), out_length
