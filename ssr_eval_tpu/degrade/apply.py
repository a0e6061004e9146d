"""Per-family degradation kernels operating on bucketed [Lmax] buffers.

Sweep parameters are **traced data, not compile-time constants**: one
compiled program per (family, bucket) serves every cutoff/order/filter in
a sweep — compile count stays O(families x buckets) instead of
O(specs x buckets).  `spec_params(spec, max_len)` produces the device
arrays for a given spec; `build_family_degrader(family, max_len)` builds
the pure function `(x, length, params) -> y` that the engine vmaps/jits.

Family semantics (with reference quirks preserved — SURVEY §7):
- fft: STFT(2048/441), zero bins >= int(1025 * ratio) (a traced bin
  index), iSTFT to the original length (reference lowpass.py:17-28).  The
  reference's eps=1e-8 magnitude clamp cancels exactly in mag*cos /
  mag*sin, so the roundtrip is a plain mask on real/imag.
- iir: zero-phase SOS filtering; the host-designed impulse/zi responses
  (H spectrum, r) and the odd-extension edge length are all device args,
  so butter/cheby/ellip/bessel at any order share one program.  Order is
  clamped to [2, 10] (lowpass.py:147-153,168) at design time.
- subsampling: resample_poly down then up with the reference's
  fs_ori=44100-always quirk (lowpass.py:134-144 — `fs_ori` never
  forwarded), then align_length to the input length.  Resample plans have
  ratio-dependent shapes, so these compile per distinct ratio.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.degrade.plan import DegradationSpec
from ssr_eval_tpu.dsp.filters import (
    blocked_plan_arrays,
    design_lowpass_sos,
    make_filtfilt_plan,
    response_len,
    sosfiltfilt_blocked,
    sosfiltfilt_dynamic,
)
from ssr_eval_tpu.dsp.resample import apply_resample, resample_poly_plan
from ssr_eval_tpu.dsp.spectral import (
    StftConfig,
    istft,
    n_frames_for_length,
    stft_real_imag,
)

# The degradation STFT (FDomainHelper defaults, reference dsp.py:7-10).
DEGRADE_STFT = StftConfig(n_fft=2048, hop=441)

# Upper bound on scipy's odd-extension edge: order<=10 lowpass -> <=5 SOS
# sections -> ntaps 11 -> edge 33; bandpass doubles sections -> 63.
EDGE_MAX = 64


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def iir_fft_size(max_len: int) -> int:
    return _next_pow2(2 * (max_len + 2 * EDGE_MAX))


# Overlap-save block-size floor and the cap beyond which the blocked path
# stops paying (a >2^15-tap response would need 64k-point block FFTs; the
# monolithic full-buffer FFT handles those rare designs instead).  Floor
# from a v5e block scan (flat 1024-8192, worse at 512 and >=16384).
IIR_BLOCK_MIN = 1024
IIR_BLOCK_CAP = 1 << 15


def iir_block_size(spec: DegradationSpec) -> int | None:
    """Power-of-2 overlap-save block for `spec`, or None -> monolithic FFT.

    The truncated impulse-response length is a property of the filter
    alone (host-designed once, cached), so specs whose responses fit the
    same bucket share one compiled program.
    """
    sos = design_lowpass_sos(spec.ftype, spec.clamped_order, spec.highcut, spec.sr)
    m = response_len(sos)
    if m > IIR_BLOCK_CAP:
        return None
    return max(_next_pow2(m), IIR_BLOCK_MIN)


def family_key(spec: DegradationSpec) -> tuple:
    """Compile-cache key: specs with the same key share one XLA program."""
    if spec.family == "subsampling":
        return ("subsampling", spec.cutoff, spec.sr)  # ratio-dependent shapes
    if spec.family == "iir":
        return ("iir", iir_block_size(spec))
    return (spec.family,)


def spec_params(spec: DegradationSpec, max_len: int):
    """Device-arg pytree for `spec` (host design work happens here, once)."""
    if spec.family == "fft":
        cut = int(DEGRADE_STFT.n_bins * spec.lowpass_ratio)  # lowpass.py:24
        return {"cut": jnp.int32(cut)}
    if spec.family == "iir":
        sos = design_lowpass_sos(spec.ftype, spec.clamped_order, spec.highcut, spec.sr)
        plan = make_filtfilt_plan(sos, max_len, edge_max=EDGE_MAX)
        block = iir_block_size(spec)
        if block is not None:
            # Overlap-save path: params sized by the block, not the bucket.
            # truncate=True: the block comes from a probe-length response
            # measurement, so a long bucket may push plan.m marginally past
            # it — truncation is within the error tolerance (see
            # blocked_plan_arrays) and must not fail at sweep-build time.
            (Hr, Hi), r = blocked_plan_arrays(plan, block, truncate=True)
            return {
                "edge": jnp.int32(plan.edge),
                "Hr": jnp.asarray(Hr),
                "Hi": jnp.asarray(Hi),
                "r": jnp.asarray(r),
            }
        fft_size = iir_fft_size(max_len)
        h = np.zeros(fft_size, dtype=np.float32)
        h[: plan.h.shape[0]] = plan.h
        H = np.fft.rfft(h)
        r = np.zeros(max_len + 2 * EDGE_MAX, dtype=np.float32)
        r[: plan.r.shape[0]] = plan.r
        # complex64 can't cross host<->device on some TPU runtimes: ship
        # real/imag separately, assemble on device.
        return {
            "edge": jnp.int32(plan.edge),
            "Hr": jnp.asarray(H.real.astype(np.float32)),
            "Hi": jnp.asarray(H.imag.astype(np.float32)),
            "r": jnp.asarray(r),
        }
    if spec.family == "subsampling":
        # One leaf so stacked-spec vmaps can infer the spec axis size.
        return {"_dummy": jnp.zeros((), jnp.float32)}
    raise ValueError(f"family {spec.family!r} is not a device degradation")


@functools.lru_cache(maxsize=64)
def build_family_degrader(key: tuple, max_len: int):
    """-> pure fn(x [Lmax], length, params) -> y [Lmax].

    The mp3 family is host-edge work (codec subprocess) and handled by
    `ssr_eval_tpu.degrade.codec`.
    """
    family = key[0]
    if family == "fft":
        cfg = DEGRADE_STFT
        mf = cfg.max_frames(max_len)

        def fft_fn(x, length, params):
            real, imag = stft_real_imag(x, length, cfg, mf)
            nf = n_frames_for_length(cfg, length)
            fmask = (jnp.arange(mf) < nf)[:, None]
            bmask = (jnp.arange(cfg.n_bins) < params["cut"])[None, :]
            m = (fmask & bmask).astype(real.dtype)
            return istft(real * m, imag * m, length, cfg, max_len)

        return fft_fn

    if family == "iir":
        block = key[1] if len(key) > 1 else None
        if block is not None:

            def iir_blocked_fn(x, length, params):
                return sosfiltfilt_blocked(
                    x, length, params["edge"], (params["Hr"], params["Hi"]),
                    params["r"], block, EDGE_MAX,
                )

            return iir_blocked_fn

        fft_size = iir_fft_size(max_len)

        def iir_fn(x, length, params):
            return sosfiltfilt_dynamic(
                x, length, params["edge"], (params["Hr"], params["Hi"]),
                params["r"], fft_size, EDGE_MAX,
            )

        return iir_fn

    if family == "subsampling":
        _, cutoff, sr = key
        # Reference quirk: fs_ori is ALWAYS 44100 (default never overridden).
        fs_ori = 44100
        fs_down = int((cutoff // 2) / int(sr / 2) * fs_ori)
        p1 = resample_poly_plan(fs_ori, fs_down, max_len)
        o1 = int(p1.out_length(max_len))
        p2 = resample_poly_plan(fs_down, fs_ori, o1)
        o2 = int(p2.out_length(o1))
        W1 = jnp.asarray(p1.Wd)
        W2 = jnp.asarray(p2.Wd)

        def sub_fn(x, length, params):
            y1, n1 = apply_resample(x, length, p1, o1, W1)
            y2, n2 = apply_resample(y1, n1, p2, o2, W2)
            # align_length (lowpass.py:142-143): zero-pad or crop to L.
            out = y2[:max_len] if o2 >= max_len else jnp.pad(y2, (0, max_len - o2))
            idx = jnp.arange(max_len)
            return jnp.where((idx < length) & (idx < n2), out, 0.0)

        return sub_fn

    raise ValueError(f"family {family!r} is not a device degradation")


@functools.lru_cache(maxsize=64)
def build_family_pre(key: tuple, max_len: int):
    """Spec-INDEPENDENT precomputation for a family, or None.

    The fused sweep engine runs `pre` once per utterance and shares its
    output across every spec of the family (the stacked lax.map axis) —
    for the fft family that removes one full forward STFT per spec
    (lowpass.py:17-28 recomputes it for every cutoff).
    """
    family = key[0]
    if family == "fft":
        cfg = DEGRADE_STFT
        mf = cfg.max_frames(max_len)

        def pre(x, length):
            real, imag = stft_real_imag(x, length, cfg, mf)
            return {"real": real, "imag": imag}

        return pre
    return None


@functools.lru_cache(maxsize=64)
def build_family_apply(key: tuple, max_len: int):
    """Spec-dependent tail: fn(ctx, x, length, params) -> y [Lmax].

    `ctx` is build_family_pre's output (None-pre families ignore it and
    recompute from x)."""
    family = key[0]
    if family == "fft":
        cfg = DEGRADE_STFT
        mf = cfg.max_frames(max_len)

        def fft_apply(ctx, x, length, params):
            nf = n_frames_for_length(cfg, length)
            fmask = (jnp.arange(mf) < nf)[:, None]
            bmask = (jnp.arange(cfg.n_bins) < params["cut"])[None, :]
            m = (fmask & bmask).astype(ctx["real"].dtype)
            return istft(ctx["real"] * m, ctx["imag"] * m, length, cfg, max_len)

        return fft_apply

    deg = build_family_degrader(key, max_len)

    def passthrough(ctx, x, length, params):
        return deg(x, length, params)

    return passthrough


def build_degrader(spec: DegradationSpec, max_len: int):
    """Back-compat single-spec builder: params baked via closure."""
    fn = build_family_degrader(family_key(spec), max_len)
    params = spec_params(spec, max_len)

    def run(x, length):
        return fn(x, length, params)

    return run
