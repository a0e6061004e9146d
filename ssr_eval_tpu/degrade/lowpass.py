"""User-facing degradation functions with reference-`lowpass.py` API parity.

`lowpass(data, highcut, fs, order, _type)` and `bandpass(...)` accept 1-D
numpy arrays and dispatch with the reference's substring semantics
(`_type in "butter"` — lowpass.py:175-194), clamp order to [2, 10], and
return numpy.  They are conveniences over the bucketed device kernels; the
harness engine uses those kernels directly in batched form.

The reference's latent no-op at lowpass.py:130 (a `subsampling()` call
whose result is discarded) is intentionally FIXED by omission — documented
in PARITY.md.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.degrade.plan import DegradationSpec
from ssr_eval_tpu.degrade.apply import build_family_degrader, family_key, spec_params
from ssr_eval_tpu.dsp.filters import (
    design_bandpass_sos,
    make_filtfilt_plan,
    plan_device_arrays,
    sosfiltfilt,
)


def limit(integer, high, low):
    """Order clamp (reference lowpass.py:147-153)."""
    if integer > high:
        return high
    if integer < low:
        return low
    return int(integer)


def align_length(x, y):
    """Pad/crop `y` to the length of `x` (reference lowpass.py:31-51)."""
    Lx, Ly = len(x), len(y)
    if Lx == Ly:
        return y
    if Lx > Ly:
        return np.pad(y, (0, Lx - Ly), mode="constant")
    return y[:Lx]


def _bucket(n: int) -> int:
    return max(4096, 1 << (n - 1).bit_length())


@functools.lru_cache(maxsize=128)
def _jitted(fkey: tuple, lmax: int):
    fn = build_family_degrader(fkey, lmax)
    return jax.jit(fn)


def _run_device(spec: DegradationSpec, data: np.ndarray) -> np.ndarray:
    L = data.shape[0]
    lmax = _bucket(L)
    buf = np.zeros(lmax, dtype=np.float32)
    buf[:L] = data
    fn = _jitted(family_key(spec), lmax)
    y = fn(jnp.asarray(buf), jnp.int32(L), spec_params(spec, lmax))
    return np.asarray(y)[:L]


def _check_1d(data):
    if data.ndim != 1:
        raise ValueError(
            "Error (chebyshev_lowpass_filter): Data "
            + str(data.shape)
            + " should be type 1d time array, (samples,) , can not be (samples, 1)"
        )


def lowpass(data, highcut, fs, order=5, _type="butter"):
    """Reference-compatible lowpass entry (lowpass.py:156-196)."""
    data = np.asarray(data, dtype=np.float32)
    _check_1d(data)
    order = limit(order, high=10, low=2)

    def spec(family, ftype=None):
        return DegradationSpec(
            key="_direct",
            family=family,
            ftype=ftype,
            cutoff=int(highcut) * 2,
            order=order,
            sr=fs,
        )

    # Branch set and order exactly as reference lowpass.py:175-194 (no
    # cheby2 branch there either — it is reachable only via bandpass/design).
    if _type in "butter":
        return _run_device(spec("iir", "butter"), data)
    elif _type in "cheby1":
        return _run_device(spec("iir", "cheby1"), data)
    elif _type in "ellip":
        return _run_device(spec("iir", "ellip"), data)
    elif _type in "bessel":
        return _run_device(spec("iir", "bessel"), data)
    elif _type in "subsampling":
        return _run_device(spec("subsampling"), data)
    elif _type in "stft_hard":
        return _run_device(spec("fft"), data)
    else:
        raise ValueError("Error: Unexpected filter type " + _type)


def _sos_filtfilt_device(sos: np.ndarray, data: np.ndarray) -> np.ndarray:
    L = data.shape[0]
    lmax = _bucket(L)
    buf = np.zeros(lmax, dtype=np.float32)
    buf[:L] = data
    fn = _jitted_sos(np.ascontiguousarray(sos).tobytes(), lmax)
    return np.asarray(fn(jnp.asarray(buf), jnp.int32(L)))[:L]


def lowpass_filter(x, highcut, fs, order, ftype):
    """Exact-type zero-phase lowpass (reference lowpass.py:94-131; unlike
    `lowpass`, cheby2 is reachable here and the order is NOT clamped).
    The reference's discarded `subsampling()` call at :130 is fixed by
    omission (PARITY.md)."""
    x = np.asarray(x, dtype=np.float32)
    if ftype not in ("butter", "cheby1", "cheby2", "ellip", "bessel"):
        raise ValueError(f"The lowpass filter {ftype} is not supported!")
    from ssr_eval_tpu.dsp.filters import design_lowpass_sos

    sos = design_lowpass_sos(ftype, int(order), float(highcut), float(fs))
    return _sos_filtfilt_device(sos, x)


def bandpass_filter(x, lowcut, highcut, fs, order, ftype):
    """Exact-type zero-phase bandpass (reference lowpass.py:199-256
    inner function; no order clamp)."""
    x = np.asarray(x, dtype=np.float32)
    if ftype not in ("butter", "cheby1", "cheby2", "ellip", "bessel"):
        raise ValueError(f"The bandpass filter {ftype} is not supported!")
    sos = design_bandpass_sos(ftype, int(order), int(lowcut), int(highcut), fs)
    return _sos_filtfilt_device(sos, x)


def stft_hard_lowpass_v0(data, lowpass_ratio):
    """FFT-mask lowpass at a bin ratio (reference lowpass.py:17-28):
    STFT(2048/441), zero bins >= int(n_bins * ratio), length-exact iSTFT."""
    data = np.asarray(data, dtype=np.float32)
    _check_1d(data)
    from ssr_eval_tpu.degrade.apply import DEGRADE_STFT

    L = data.shape[0]
    lmax = _bucket(L)
    buf = np.zeros(lmax, dtype=np.float32)
    buf[:L] = data
    fn = _jitted(("fft",), lmax)
    cut = int(DEGRADE_STFT.n_bins * lowpass_ratio)
    y = fn(jnp.asarray(buf), jnp.int32(L), {"cut": jnp.int32(cut)})
    return np.asarray(y)[:L]


def subsampling(data, lowpass_ratio, fs_ori=44100):
    """resample_poly down-then-up (reference lowpass.py:134-144)."""
    from scipy.signal import resample_poly

    data = np.asarray(data)
    fs_down = int(lowpass_ratio * fs_ori)
    y = resample_poly(data, fs_down, fs_ori)
    y = resample_poly(y, fs_ori, fs_down)
    return align_length(data, y)


@functools.lru_cache(maxsize=64)
def _jitted_sos(sos_key, lmax: int):
    sos = np.frombuffer(sos_key, dtype=np.float64).reshape(-1, 6).copy()
    plan = make_filtfilt_plan(sos, lmax)
    H, r = plan_device_arrays(plan)
    return jax.jit(lambda x, L: sosfiltfilt(x, L, plan, H, r))


def bandpass(data, lowcut, highcut, fs, order=5, _type="butter"):
    """Reference-compatible bandpass entry (lowpass.py:199-256)."""
    data = np.asarray(data, dtype=np.float32)
    _check_1d(data)
    for name in ("butter", "cheby1", "cheby2", "ellip", "bessel"):
        if _type in name:
            order = limit(order, high=10, low=2)
            sos = design_bandpass_sos(name, order, int(lowcut), int(highcut), fs)
            L = data.shape[0]
            lmax = _bucket(L)
            buf = np.zeros(lmax, dtype=np.float32)
            buf[:L] = data
            fn = _jitted_sos(np.ascontiguousarray(sos).tobytes(), lmax)
            return np.asarray(fn(jnp.asarray(buf), jnp.int32(L)))[:L]
    raise ValueError("Error: Unexpected filter type " + _type)


def test1():
    """Self-test writing audible wavs for each degradation type
    (reference lowpass.py:259-277).  librosa's bundled trumpet clip is
    unreachable offline; a deterministic synthetic harmonic clip stands
    in with the same rates and parameters."""
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav

    data = speechlike(2.0, 44100, seed=0)
    cutoff, fs, order = 7000, 44100, 12

    print(data.shape)

    data_butter = lowpass(data, cutoff, fs, order, _type="butter")
    data_chebyshev = lowpass(data, cutoff, fs, order, _type="cheby1")
    data_stft = lowpass(data, cutoff, fs, order, _type="stft_hard")
    data_resample = lowpass(data, cutoff, fs, order, _type="subsampling")

    write_wav("original.wav", data, 44100)
    write_wav("butter.wav", data_butter, 44100)
    write_wav("cheby1.wav", data_chebyshev, 44100)
    write_wav("stft_hard.wav", data_stft, 44100)
    write_wav("subsampling.wav", data_resample, 44100)
