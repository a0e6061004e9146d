"""Per-spec degradation kernels operating on bucketed [Lmax] buffers.

Each builder returns a pure function `(x, length) -> y` ([Lmax] in, [Lmax]
out, shape preserved like the reference asserts at eval.py:348-349) that is
jit/vmap-compatible; the engine vmaps it over the utterance batch and jits
the whole degrade→metric chain per (spec, bucket).

Family semantics (with reference quirks preserved — SURVEY §7):
- fft: STFT(2048/441) mag/cos/sin, zero bins >= int(1025 * ratio), iSTFT
  to the original length (lowpass.py:17-28).  The reference's eps=1e-8
  magnitude clamp cancels exactly in mag*cos / mag*sin, so the roundtrip
  is a plain mask on real/imag.
- iir: zero-phase SOS filtering (scipy-semantics FFT-conv kernel), order
  clamped to [2, 10] (lowpass.py:147-153,168).
- subsampling: resample_poly down then up with the reference's fs_ori=44100
  default left at 44100 even for other input rates (lowpass.py:134-144 —
  the `fs_ori` argument is never forwarded), then align_length to the
  input length (pad/crop).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ssr_eval_tpu.degrade.plan import DegradationSpec
from ssr_eval_tpu.dsp.filters import (
    design_lowpass_sos,
    make_filtfilt_plan,
    plan_device_arrays,
    sosfiltfilt,
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


def _build_fft_mask(spec: DegradationSpec, max_len: int):
    cfg = DEGRADE_STFT
    mf = cfg.max_frames(max_len)
    cut = int(cfg.n_bins * spec.lowpass_ratio)  # int(1025 * ratio), lowpass.py:24

    def fn(x, length):
        real, imag = stft_real_imag(x, length, cfg, mf)
        nf = n_frames_for_length(cfg, length)
        fmask = (jnp.arange(mf) < nf)[:, None]
        bmask = (jnp.arange(cfg.n_bins) < cut)[None, :]
        m = (fmask & bmask).astype(real.dtype)
        return istft(real * m, imag * m, length, cfg, max_len)

    return fn


def _build_iir(spec: DegradationSpec, max_len: int):
    sos = design_lowpass_sos(spec.ftype, spec.clamped_order, spec.highcut, spec.sr)
    plan = make_filtfilt_plan(sos, max_len)
    H, r = plan_device_arrays(plan)

    def fn(x, length):
        return sosfiltfilt(x, length, plan, H, r)

    return fn


def _build_subsampling(spec: DegradationSpec, max_len: int):
    # Reference quirk: fs_ori is ALWAYS 44100 (default never overridden).
    fs_ori = 44100
    fs_down = int(spec.lowpass_ratio * fs_ori)
    p1 = resample_poly_plan(fs_ori, fs_down, max_len)
    o1 = int(p1.out_length(max_len))
    p2 = resample_poly_plan(fs_down, fs_ori, o1)
    o2 = int(p2.out_length(o1))
    W1 = jnp.asarray(p1.Wd)
    W2 = jnp.asarray(p2.Wd)

    def fn(x, length):
        y1, n1 = apply_resample(x, length, p1, o1, W1)
        y2, n2 = apply_resample(y1, n1, p2, o2, W2)
        # align_length (lowpass.py:142-143): pad with zeros or crop to L.
        out = y2[:max_len] if o2 >= max_len else jnp.pad(y2, (0, max_len - o2))
        idx = jnp.arange(max_len)
        return jnp.where((idx < length) & (idx < n2), out, 0.0)

    return fn


@functools.lru_cache(maxsize=256)
def build_degrader(spec: DegradationSpec, max_len: int):
    """-> pure fn(x [Lmax], length) -> y [Lmax] for device families.

    The mp3 family is host-edge work (codec subprocess) and handled by
    `ssr_eval_tpu.degrade.codec`; requesting it here raises.
    """
    if spec.family == "fft":
        return _build_fft_mask(spec, max_len)
    if spec.family == "iir":
        return _build_iir(spec, max_len)
    if spec.family == "subsampling":
        return _build_subsampling(spec, max_len)
    raise ValueError(f"family {spec.family!r} is not a device degradation")
