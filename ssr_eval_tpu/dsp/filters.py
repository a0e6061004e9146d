"""Zero-phase IIR filtering (scipy `sosfiltfilt` semantics) as TPU kernels.

The reference degrades audio with scipy's ``sosfiltfilt`` over
butter/cheby1/cheby2/ellip/bessel SOS designs (reference lowpass.py:94-131).
A literal port would be a sequential per-sample recurrence — the worst
possible TPU program.  Instead we use the LTI identity:

    sosfilt(sos, ext, zi=zi*ext[0]) == conv(ext, h) + ext[0] * r

where ``h`` is the cascade's impulse response (zero-state response) and
``r`` is its zero-input response from unit-scaled initial conditions
``zi`` — both precomputed host-side in float64 at *design* time (filter
design is tiny and happens once per sweep setting; SURVEY §2.3).  On
device, each forward/backward pass is then a single FFT convolution:
O(N log N) fully-parallel VPU work with no sequential dependence, instead
of O(N * n_sections) serial steps.

scipy semantics replicated exactly (sosfiltfilt source):
  - odd edge extension of length ``edge = 3 * (2*n_sections + 1)``
  - forward pass with initial state ``sosfilt_zi(sos) * ext[0]``
  - reversed pass with initial state ``zi * y_fwd[-1]``
  - trim ``edge`` from both sides.

Variable utterance lengths are handled with traced-index gathers into
static buffers so one compiled kernel serves a whole bucket.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
from scipy import signal as _sps

import jax
import jax.numpy as jnp


class FiltFiltPlan(NamedTuple):
    """Host-designed, device-applied zero-phase filter plan (hashable-free:
    pass arrays as jit array args, ints as statics)."""

    edge: int            # odd-extension length per side
    h: np.ndarray        # [n_ext_max] cascade impulse response (f32)
    r: np.ndarray        # [n_ext_max] zero-input response of unit zi (f32)
    fft_size: int        # convolution FFT size (power of 2)
    m: int               # truncated response length: sum|h[m:]| and
                         # sum|r[m:]| both < _TRUNC_TOL (blocked path)


def design_lowpass_sos(ftype: str, order: int, highcut: float, fs: float) -> np.ndarray:
    """SOS lowpass design, matching reference lowpass.py:112-123 parameters
    (cheby1 rp=0.1 dB, cheby2 rs=60 dB, ellip rp=0.1/rs=60)."""
    nyq = 0.5 * fs
    hi = highcut / nyq
    if ftype == "butter":
        return _sps.butter(order, hi, btype="low", output="sos")
    if ftype == "cheby1":
        return _sps.cheby1(order, 0.1, hi, btype="low", output="sos")
    if ftype == "cheby2":
        return _sps.cheby2(order, 60, hi, btype="low", output="sos")
    if ftype == "ellip":
        return _sps.ellip(order, 0.1, 60, hi, btype="low", output="sos")
    if ftype == "bessel":
        return _sps.bessel(order, hi, btype="low", output="sos")
    raise ValueError(f"The lowpass filter {ftype} is not supported!")


def design_bandpass_sos(ftype: str, order: int, lowcut: float, highcut: float, fs: float) -> np.ndarray:
    """SOS bandpass design (reference lowpass.py:72-84 parameters)."""
    nyq = 0.5 * fs
    band = [lowcut / nyq, highcut / nyq]
    if ftype == "butter":
        return _sps.butter(order, band, btype="band", output="sos")
    if ftype == "cheby1":
        return _sps.cheby1(order, 0.1, band, btype="band", output="sos")
    if ftype == "cheby2":
        return _sps.cheby2(order, 60, band, btype="band", output="sos")
    if ftype == "ellip":
        return _sps.ellip(order, 0.1, 60, band, btype="band", output="sos")
    if ftype == "bessel":
        return _sps.bessel(order, band, btype="band", output="sos")
    raise ValueError(f"The bandpass filter {ftype} is not supported!")


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# Truncation tolerance for the blocked (overlap-save) path: the residual
# convolution error is bounded by sum|h[m:]| * max|x|, so this bounds the
# relative output error directly (DC gain of every sweep lowpass is ~1).
_TRUNC_TOL = 1e-6


def _tail_len(v: np.ndarray, tol: float) -> int:
    """Smallest m with sum|v[m:]| < tol (0 if the whole tail is below)."""
    tails = np.cumsum(np.abs(v)[::-1])[::-1]
    if tails[0] < tol:
        return 0
    return int(np.argmax(tails < tol)) if tails[-1] < tol else v.shape[0]


@functools.lru_cache(maxsize=64)
def _plan_cache(sos_bytes: bytes, n_sections: int, max_len: int) -> FiltFiltPlan:
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(n_sections, 6).copy()
    ntaps = 2 * n_sections + 1
    ntaps -= min(int((sos[:, 2] == 0).sum()), int((sos[:, 5] == 0).sum()))
    edge = ntaps * 3
    n_ext = max_len + 2 * edge
    # Impulse response (zero-state) and unit-zi zero-input response, f64.
    impulse = np.zeros(n_ext)
    impulse[0] = 1.0
    h = _sps.sosfilt(sos, impulse)
    zi = _sps.sosfilt_zi(sos)
    r, _ = _sps.sosfilt(sos, np.zeros(n_ext), zi=zi)
    fft_size = _next_pow2(2 * n_ext)
    m = max(_tail_len(h, _TRUNC_TOL), _tail_len(r, _TRUNC_TOL), 1)
    return FiltFiltPlan(
        edge=edge,
        h=h.astype(np.float32),
        r=r.astype(np.float32),
        fft_size=fft_size,
        m=m,
    )


@functools.lru_cache(maxsize=256)
def _response_len_cache(sos_bytes: bytes, n_sections: int) -> int:
    """Truncated-response length for an SOS cascade, independent of the
    bucket length (stable poles: the response decays exponentially, so a
    2^18-sample probe covers every design the order clamp [2,10] allows)."""
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(n_sections, 6).copy()
    probe = 1 << 18
    impulse = np.zeros(probe)
    impulse[0] = 1.0
    h = _sps.sosfilt(sos, impulse)
    zi = _sps.sosfilt_zi(sos)
    r, _ = _sps.sosfilt(sos, np.zeros(probe), zi=zi)
    return max(_tail_len(h, _TRUNC_TOL), _tail_len(r, _TRUNC_TOL), 1)


def response_len(sos: np.ndarray) -> int:
    sos = np.ascontiguousarray(sos, dtype=np.float64)
    return _response_len_cache(sos.tobytes(), sos.shape[0])


def make_filtfilt_plan(sos: np.ndarray, max_len: int, edge_max: int | None = None) -> FiltFiltPlan:
    """Build (and cache) the device plan for a given SOS and bucket length."""
    sos = np.ascontiguousarray(sos, dtype=np.float64)
    plan = _plan_cache(sos.tobytes(), sos.shape[0], max_len)
    if edge_max is not None and plan.edge > edge_max:
        raise ValueError(f"edge {plan.edge} exceeds edge_max {edge_max}")
    return plan


def _flip_prefix(y: jnp.ndarray, n_valid, out_size: int) -> jnp.ndarray:
    """out[v] = y[n_valid - 1 - v] for v < n_valid, else 0 (traced n_valid).

    A static reverse + one dynamic slice — full-buffer index gathers on
    TPU cost ~20 ms per 8x266k batch (they bypass the vector memory
    path), and the zero-phase filter had three of them."""
    pad = jnp.concatenate([y[::-1], jnp.zeros(out_size, y.dtype)])
    return jax.lax.dynamic_slice(pad, (y.shape[0] - n_valid,), (out_size,))


def _odd_extend(x: jnp.ndarray, length, edge, edge_max: int) -> jnp.ndarray:
    """scipy's odd_ext for a traced true length (and possibly traced edge)
    inside a static buffer.

    ext = [2*x[0] - x[edge..1], x[0..L), 2*x[L-1] - x[L-2..L-edge-1], ...]
    Returns [Lmax + 2*edge_max].  Positions in [L + 2*edge, L + edge +
    edge_max) may hold garbage — the filters mask everything beyond
    L + 2*edge.  Contract: x is zero beyond `length` (bucket buffers are)
    and length > edge (utterances are orders of magnitude longer).

    Built from contiguous ops only: a static flip, two edge_max-sized
    dynamic slices for the reflected edges, and two traced-offset
    contiguous writes — no full-buffer gathers (see _flip_prefix).
    """
    Lmax = x.shape[0]
    xf = x[::-1]
    x0 = x[0]
    xl = x[jnp.clip(length - 1, 0, Lmax - 1)]
    xf_pad = jnp.concatenate([xf, jnp.zeros(edge_max + 2, x.dtype)])
    # left[v] = 2*x0 - x[edge - v] = 2*x0 - xf[Lmax - 1 - edge + v]
    left = 2.0 * x0 - jax.lax.dynamic_slice(
        xf_pad, (Lmax - 1 - edge,), (edge_max,)
    )
    # right[j] = 2*xl - x[L - 2 - j] = 2*xl - xf[Lmax + 1 - L + j]
    right = 2.0 * xl - jax.lax.dynamic_slice(
        xf_pad, (Lmax + 1 - length,), (edge_max,)
    )
    ext = jnp.zeros(Lmax + 2 * edge_max, x.dtype)
    ext = jax.lax.dynamic_update_slice(ext, left, (0,))
    # x overwrites left's garbage tail (positions >= edge) ...
    ext = jax.lax.dynamic_update_slice(ext, x, (edge,))
    # ... and right lands at the traced end of the signal.
    return jax.lax.dynamic_update_slice(ext, right, (edge + length,))


def _fft_lfilter(ext: jnp.ndarray, x0, Hr: jnp.ndarray, Hi: jnp.ndarray, r: jnp.ndarray, fft_size: int) -> jnp.ndarray:
    """One causal IIR pass: zero-state FFT convolution + scaled zi response.

    ext: [n_ext_buf] input (zero beyond its valid prefix);
    Hr/Hi: rfft of the impulse response as separate float32 real/imag
    (complex arrays cannot cross the host<->device boundary on some TPU
    runtimes, so complex values are assembled on device);
    r:   [n_ext_buf] unit-zi zero-input response; x0 scales it.
    """
    n = ext.shape[0]
    X = jnp.fft.rfft(ext, n=fft_size)
    H = jax.lax.complex(Hr, Hi)
    y = jnp.fft.irfft(X * H, n=fft_size)[:n]
    return y + x0 * r


def sosfiltfilt(x: jnp.ndarray, length, plan: FiltFiltPlan, H, r: jnp.ndarray):
    """Zero-phase filter one buffered signal; returns [Lmax] (zero beyond L).

    x: [Lmax] buffer, true length `length` (traced ok).
    H, r: device arrays from `plan_device_arrays` (H is an (Hr, Hi) float
    pair; kept as explicit args so they are donatable/shardable rather
    than baked-in constants).
    """
    Hr, Hi = H
    edge = plan.edge
    return _filtfilt_core(x, length, edge, Hr, Hi, r, plan.fft_size, edge)


def sosfiltfilt_dynamic(x, length, edge, H, r, fft_size: int, edge_max: int):
    """Zero-phase filter with the filter itself as *data*.

    Like `sosfiltfilt`, but the odd-extension edge length is a traced
    scalar and (H, r) are device arrays sized for `edge_max`, so ONE
    compiled program serves every (ftype, order, cutoff) in a sweep —
    sweep parameters are data, not constants (compile count = buckets,
    not specs).

    x: [Lmax]; H: rfft of the padded impulse response [fft_size//2+1];
    r: [Lmax + 2*edge_max] zero-input response (zero-padded past its
    design length — those positions are masked).
    """
    Hr, Hi = H
    return _filtfilt_core(x, length, edge, Hr, Hi, r, fft_size, edge_max)


def _block_conv(ext, x0, Hr, Hi, r_trunc, block: int):
    """Overlap-save causal IIR pass: conv(ext, h) + x0 * r on [n_ext_buf].

    Hr/Hi: rfft of the m<=block truncated impulse response, padded to
    F = 2*block; r_trunc: [block] truncated zero-input response.  The
    monolithic path FFTs the whole 1M-point buffer (a deep, HBM-bound
    transform XLA handles poorly); here the signal is cut into
    `block`-hop, 2*block-long frames via two contiguous slab slices (no
    gathers), batched through the MXU Cooley-Tukey FFT, and each frame's
    second half is exact because the truncated kernel (m <= block) never
    wraps into it.
    """
    from ssr_eval_tpu.dsp.fft_matmul import irfft_ct, rfft_ct

    n = ext.shape[0]
    nb = -(-n // block)
    total = (nb + 1) * block
    padded = jnp.concatenate(
        [jnp.zeros(block, ext.dtype), ext, jnp.zeros(total - block - n, ext.dtype)]
    )
    slab = padded.reshape(nb + 1, block)
    frames = jnp.concatenate([slab[:-1], slab[1:]], axis=-1)  # [nb, 2*block]
    Fr, Fi = rfft_ct(frames, 2 * block)
    Yr = Fr * Hr - Fi * Hi
    Yi = Fr * Hi + Fi * Hr
    y = irfft_ct(Yr, Yi, 2 * block)[:, block:]  # valid: ext[k*block + t]
    y = y.reshape(-1)[:n]
    return y.at[: r_trunc.shape[0]].add(x0 * r_trunc)


def sosfiltfilt_blocked(x, length, edge, H, r_trunc, block: int, edge_max: int):
    """Zero-phase filter via overlap-save block convolution.

    Same contract as `sosfiltfilt_dynamic` (filter as *data*, one program
    per (bucket, block)), but the two causal passes are batched
    2*block-point MXU FFTs instead of one monolithic next_pow2(2*Lmax)
    transform.  `H` is (Hr, Hi) = rfft of the truncated impulse response
    padded to 2*block; `r_trunc` is [block].  Requires the truncated
    response length m <= block (guaranteed by the plan's bucket choice).
    """
    Hr, Hi = H
    Lmax = x.shape[0]
    n_ext_buf = Lmax + 2 * edge_max
    n_ext = length + 2 * edge

    ext = _odd_extend(x, length, edge, edge_max)
    y_f = _block_conv(ext, ext[0], Hr, Hi, r_trunc, block)
    valid = jnp.arange(n_ext_buf) < n_ext
    y_f = jnp.where(valid, y_f, 0.0)

    z = _flip_prefix(y_f, n_ext, n_ext_buf)
    y_b = _block_conv(z, z[0], Hr, Hi, r_trunc, block)
    y_b = jnp.where(valid, y_b, 0.0)

    fb = _flip_prefix(y_b, n_ext, n_ext_buf)
    fb = jnp.concatenate([fb, jnp.zeros(Lmax, fb.dtype)])
    out = jax.lax.dynamic_slice(fb, (edge,), (Lmax,))
    return jnp.where(jnp.arange(Lmax) < length, out, 0.0)


def blocked_plan_arrays(plan: FiltFiltPlan, block: int, truncate: bool = False):
    """Host arrays for the blocked path: ((Hr, Hi) over 2*block, r[:block]).

    With ``truncate=True`` a response slightly longer than the block is cut
    at ``block`` instead of raising: the block is sized from a 2^18-sample
    probe (`response_len`), so a longer bucket can nudge `plan.m` just past
    it — the tail mass beyond the probe-derived length is below
    ``_TRUNC_TOL`` for any stable design, so cutting keeps the error bound
    (degrade/apply.spec_params relies on this so spec_params never fails at
    sweep-build time).  The tail-mass assumption is VERIFIED here, not
    assumed (ADVICE r3 #1): if the actually-discarded mass exceeds the
    tolerance, a loud warning reports the true error bound."""
    if plan.m > block and not truncate:
        raise ValueError(f"truncated response {plan.m} exceeds block {block}")
    m = min(plan.m, block)
    if m < plan.m:
        tail_h = float(np.sum(np.abs(plan.h[m:].astype(np.float64))))
        tail_r = float(np.sum(np.abs(plan.r[m:].astype(np.float64))))
        if max(tail_h, tail_r) >= _TRUNC_TOL:
            import warnings

            warnings.warn(
                f"blocked filtfilt truncation at block={block} discards "
                f"tail mass sum|h[{m}:]|={tail_h:.3e}, "
                f"sum|r[{m}:]|={tail_r:.3e} >= {_TRUNC_TOL:.0e}; the "
                "relative output error is bounded by that mass (slowly-"
                "decaying high-order low-cutoff IIR on a long bucket) — "
                "use the monolithic sosfiltfilt path for this spec",
                RuntimeWarning,
                stacklevel=2,
            )
    h = np.zeros(2 * block, dtype=np.float64)
    h[:m] = plan.h[:m].astype(np.float64)
    H = np.fft.rfft(h)
    r = np.zeros(block, dtype=np.float32)
    r[:m] = plan.r[:m]
    return (
        (H.real.astype(np.float32), H.imag.astype(np.float32)),
        r,
    )


def _filtfilt_core(x, length, edge, Hr, Hi, r, fft_size: int, edge_max: int):
    """Shared forward-backward pass; `edge` may be traced (<= edge_max)."""
    Lmax = x.shape[0]
    n_ext_buf = Lmax + 2 * edge_max
    n_ext = length + 2 * edge

    ext = _odd_extend(x, length, edge, edge_max)
    y_f = _fft_lfilter(ext, ext[0], Hr, Hi, r, fft_size)
    valid = jnp.arange(n_ext_buf) < n_ext
    y_f = jnp.where(valid, y_f, 0.0)

    # Reverse the valid prefix (z[v] = y_f[n_ext-1-v]), filter again.
    z = _flip_prefix(y_f, n_ext, n_ext_buf)
    y_b = _fft_lfilter(z, z[0], Hr, Hi, r, fft_size)
    y_b = jnp.where(valid, y_b, 0.0)

    # Undo the reversal and trim `edge` from both sides:
    # result[k] = y_b[n_ext - 1 - (edge + k)] = flip_prefix(y_b)[edge + k].
    fb = _flip_prefix(y_b, n_ext, n_ext_buf)
    fb = jnp.concatenate([fb, jnp.zeros(Lmax, fb.dtype)])
    out = jax.lax.dynamic_slice(fb, (edge,), (Lmax,))
    return jnp.where(jnp.arange(Lmax) < length, out, 0.0)


def plan_device_arrays(plan: FiltFiltPlan):
    """Device-side constants for a plan: ((Hr, Hi) = rfft(h), r)."""
    h = np.zeros(plan.fft_size, dtype=np.float32)
    h[: plan.h.shape[0]] = plan.h
    H = np.fft.rfft(h)
    return (
        (jnp.asarray(H.real.astype(np.float32)), jnp.asarray(H.imag.astype(np.float32))),
        jnp.asarray(plan.r),
    )
