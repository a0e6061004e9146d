"""`FDomainHelper` — reference-compatible STFT utility surface
(reference ssr_eval/dsp.py:6-183), torch-free.

The reference wraps torchlibrosa STFT/ISTFT modules; here the same
public methods are thin conveniences over the framework's single jitted
STFT core (dsp/spectral.py), operating on numpy or jax arrays shaped
[batch, channels, samples] and returning [batch, channels, T, F] (and
inverses), exactly like the original:

    spectrogram, spectrogram_phase, wav_to_spectrogram,
    wav_to_spectrogram_phase, spectrogram_phase_to_wav,
    complex_spectrogram, reverse_complex_spectrogram,
    wav_to_complex_spectrogram, complex_spectrogram_to_wav,
    spectrogram_to_wav

Design note (SURVEY §5 'race detection'): the reference kept a mutable
module-global `f_helper` singleton (lowpass.py:14,107-109) — the one
thread-unsafe piece of shared state.  Here configuration is a hashable
`StftConfig` and the jitted kernels live in pure per-config caches, so
instances are freely shareable across threads.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.dsp.spectral import (
    StftConfig,
    istft,
    n_frames_for_length,
    stft_real_imag,
)
from ssr_eval_tpu.utils.bucket import bucket_length


@functools.lru_cache(maxsize=64)
def _jit_stft(cfg: StftConfig, lmax: int):
    mf = cfg.max_frames(lmax)

    @jax.jit
    def run(x, length):
        r, i = stft_real_imag(x, length, cfg, mf)
        nf = n_frames_for_length(cfg, length)
        m = (jnp.arange(mf) < nf)[:, None].astype(r.dtype)
        return r * m, i * m, nf

    return run


@functools.lru_cache(maxsize=64)
def _jit_istft(cfg: StftConfig, mf: int, out_len: int):
    @jax.jit
    def run(r, i, length):
        nf = n_frames_for_length(cfg, length)
        m = (jnp.arange(mf) < nf)[:, None].astype(r.dtype)
        return istft(r * m, i * m, length, cfg, out_len)

    return run


class FDomainHelper:
    """STFT defaults match the reference: window 2048, hop 441, hann,
    center=True reflect padding (dsp.py:7-17).  `subband` divides the
    sizes (dsp.py:40-59)."""

    def __init__(
        self,
        window_size=2048,
        hop_size=441,
        center=True,
        pad_mode="reflect",
        window="hann",
        freeze_parameters=True,
        subband=None,
    ):
        if window != "hann" or pad_mode != "reflect":
            raise ValueError("FDomainHelper supports hann/reflect (reference defaults)")
        self.subband = subband
        div = subband if subband else 1
        self.cfg = StftConfig(n_fft=window_size // div, hop=hop_size // div, center=center)

    # -- internals -----------------------------------------------------

    def _stft_chan(self, x):
        """x: [samples] -> (real, imag [T, F], n_frames)."""
        x = np.asarray(x, dtype=np.float32)
        L = x.shape[-1]
        lmax = bucket_length(L)
        buf = np.zeros(lmax, np.float32)
        buf[:L] = x
        r, i, nf = _jit_stft(self.cfg, lmax)(jnp.asarray(buf), jnp.int32(L))
        nf = int(nf)
        return np.asarray(r)[:nf], np.asarray(i)[:nf], nf

    # -- reference API -------------------------------------------------

    def spectrogram(self, input, eps=0.0):
        """[B, samples] -> [B, 1, T, F] magnitude (dsp.py:72-74)."""
        input = np.asarray(input, dtype=np.float32)
        out = []
        for b in range(input.shape[0]):
            r, i, _ = self._stft_chan(input[b])
            out.append(np.sqrt(np.clip(r * r + i * i, eps, np.inf)))
        return np.stack(out)[:, None]

    def spectrogram_phase(self, input, eps=0.0):
        """[B, samples] -> (mag, cos, sin) each [B, 1, T, F] (dsp.py:76-81)."""
        input = np.asarray(input, dtype=np.float32)
        mags, coss, sins = [], [], []
        for b in range(input.shape[0]):
            r, i, _ = self._stft_chan(input[b])
            mag = np.sqrt(np.clip(r * r + i * i, eps, np.inf))
            mags.append(mag)
            coss.append(r / mag)
            sins.append(i / mag)
        return (
            np.stack(mags)[:, None],
            np.stack(coss)[:, None],
            np.stack(sins)[:, None],
        )

    def wav_to_spectrogram_phase(self, input, eps=1e-8):
        """[B, C, samples] -> (sps, coss, sins) [B, C, T, F] (dsp.py:83-105)."""
        input = np.asarray(input, dtype=np.float32)
        chans = []
        for c in range(input.shape[1]):
            chans.append(self.spectrogram_phase(input[:, c, :], eps=eps))
        sps = np.concatenate([m for m, _, _ in chans], axis=1)
        coss = np.concatenate([c for _, c, _ in chans], axis=1)
        sins = np.concatenate([s for _, _, s in chans], axis=1)
        return sps, coss, sins

    def wav_to_spectrogram(self, input, eps=1e-8):
        """[B, C, samples] -> [B, C, T, F] magnitudes (dsp.py:121-135)."""
        input = np.asarray(input, dtype=np.float32)
        return np.concatenate(
            [self.spectrogram(input[:, c, :], eps=eps) for c in range(input.shape[1])],
            axis=1,
        )

    def spectrogram_phase_to_wav(self, sps, coss, sins, length):
        """(mag, cos, sin) [B, C, T, F] -> [B, C, length] (dsp.py:107-119)."""
        sps = np.asarray(sps, dtype=np.float32)
        real = sps * np.asarray(coss, dtype=np.float32)
        imag = sps * np.asarray(sins, dtype=np.float32)
        return self._istft_bc(real, imag, length)

    def _istft_bc(self, real, imag, length):
        B, C, T, F = real.shape
        out_len = bucket_length(length)
        fn = _jit_istft(self.cfg, T, out_len)
        out = np.zeros((B, C, length), np.float32)
        for b in range(B):
            for c in range(C):
                y = fn(jnp.asarray(real[b, c]), jnp.asarray(imag[b, c]), jnp.int32(length))
                out[b, c] = np.asarray(y)[:length]
        return out

    def complex_spectrogram(self, input, eps=0.0):
        """[B, samples] -> [B, 2, T, F] (real, imag) (dsp.py:61-65)."""
        input = np.asarray(input, dtype=np.float32)
        rs, im = [], []
        for b in range(input.shape[0]):
            r, i, _ = self._stft_chan(input[b])
            rs.append(r)
            im.append(i)
        return np.stack([np.stack(rs), np.stack(im)], axis=1)

    def reverse_complex_spectrogram(self, input, eps=0.0, length=None):
        """[B, 2, T, F] -> [B, length] (dsp.py:67-70)."""
        input = np.asarray(input, dtype=np.float32)
        out = self._istft_bc(input[:, 0:1], input[:, 1:2], length)
        return out[:, 0]

    def wav_to_complex_spectrogram(self, input, eps=0.0):
        """[B, C, samples] -> [B, 2C, T, F] (dsp.py:162-169)."""
        input = np.asarray(input, dtype=np.float32)
        return np.concatenate(
            [self.complex_spectrogram(input[:, c, :], eps=eps) for c in range(input.shape[1])],
            axis=1,
        )

    def complex_spectrogram_to_wav(self, input, eps=0.0, length=None):
        """[B, 2C, T, F] -> [B, C, length] (dsp.py:171-183)."""
        input = np.asarray(input, dtype=np.float32)
        C = input.shape[1] // 2
        return np.stack(
            [
                self.reverse_complex_spectrogram(input[:, 2 * c : 2 * c + 2], length=length)
                for c in range(C)
            ],
            axis=1,
        )

    def spectrogram_to_wav(self, input, spectrogram, length=None):
        """Swap `input`'s magnitudes for `spectrogram`'s, keep phases
        (dsp.py:137-159).  input [B, C, samples], spectrogram [B, C, T, F]."""
        input = np.asarray(input, dtype=np.float32)
        spectrogram = np.asarray(spectrogram, dtype=np.float32)
        outs = []
        for c in range(input.shape[1]):
            _, cos, sin = self.spectrogram_phase(input[:, c, :], eps=1e-8)
            real = spectrogram[:, c : c + 1] * cos
            imag = spectrogram[:, c : c + 1] * sin
            outs.append(self._istft_bc(real, imag, length)[:, 0])
        return np.stack(outs, axis=1)
