"""Independent NumPy/SciPy oracle implementations of the reference DSP.

These replicate the *semantics* of the reference's external dependencies
(librosa STFT/iSTFT, scipy sosfiltfilt / resample_poly, skimage SSIM) so the
JAX kernels can be unit-tested without those packages installed.  Everything
runs in float64 for a tight error budget.

librosa semantics replicated (librosa 0.9.x, the reference era):
  stft(y, n_fft, hop):  pad n_fft//2 'reflect', periodic hann win=n_fft,
  frames at stride hop, rfft.
  istft: inverse rfft per frame, window, overlap-add, normalize by
  window-sum-square, trim n_fft//2 per side (or cut to `length`).
"""

from __future__ import annotations

import numpy as np


def hann(n):
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft_np(y, n_fft, hop, win_length=None, center=True, pad_mode="reflect", dtype=None):
    """-> complex [n_bins, n_frames] (librosa layout).

    dtype=np.float32 keeps the whole transform in single precision
    (librosa's behavior on float32 audio); default float64."""
    win_length = win_length or n_fft
    w = hann(win_length)
    if dtype is not None:
        w = w.astype(dtype)
        y = np.asarray(y, dtype=dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop
    frames = np.stack([y[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * w, axis=-1).T


def istft_np(Z, n_fft, hop, length=None, center=True, dtype=None):
    """Z: complex [n_bins, n_frames] -> time signal (librosa layout)."""
    w = hann(n_fft)
    if dtype is not None:
        w = w.astype(dtype)
    frames = np.fft.irfft(Z.T, n=n_fft, axis=-1) * w
    if dtype is not None:
        frames = frames.astype(dtype)
    n_frames = frames.shape[0]
    total = hop * (n_frames - 1) + n_fft
    out = np.zeros(total, dtype=frames.dtype)
    wss = np.zeros(total, dtype=w.dtype)
    for i in range(n_frames):
        out[i * hop : i * hop + n_fft] += frames[i]
        wss[i * hop : i * hop + n_fft] += w * w
    nz = wss > 1e-10
    out[nz] /= wss[nz]
    if center:
        out = out[n_fft // 2 :]
    if length is not None:
        out = out[:length]
    return out


def lsd_np(est_sp, target_sp, eps=1e-12):
    """Reference LSD on [T, F] magnitude spectrograms (metrics.py:109-112)."""
    lsd = np.log10(target_sp**2 / ((est_sp + eps) ** 2) + eps) ** 2
    return float(np.mean(np.mean(lsd, axis=1) ** 0.5))


def sispec_np(est_sp, target_sp, eps=1e-12):
    """Reference SiSpec on [T, F] magnitude spectrograms (metrics.py:114-121).

    energy_unify (utils.py:79-92): target scaled by <est, target>/||target||^2,
    pow_norm sums over all dims >= 2 of [1,1,T,F]; here that is all of [T,F].
    """
    pow_norm = np.sum(est_sp * target_sp)
    target = pow_norm * target_sp / (np.sum(target_sp**2) + eps)
    noise = est_sp - target
    return float(
        10 * np.log10(np.sum(target**2) / (np.sum(noise**2) + eps) + eps)
    )


def ssim_np(est_sp, target_sp, win_size=7, data_range=2.0):
    """skimage.metrics.structural_similarity defaults on float images.

    skimage (legacy, as called at reference metrics.py:131 with no
    data_range): uniform 7x7 filter, unbiased covariance (NP/(NP-1)),
    data_range inferred from the float dtype range (-1, 1) -> 2.0; the
    result is cropped by (win_size-1)//2 per side then averaged.  Boundary
    handling is irrelevant because the crop removes every boundary-affected
    cell — so valid-mode box filtering is exact.
    """
    X = est_sp.astype(np.float64)
    Y = target_sp.astype(np.float64)

    def box_valid(a):
        # 7x7 'valid' box mean via cumsum in both dims.
        c = np.cumsum(np.cumsum(np.pad(a, ((1, 0), (1, 0))), axis=0), axis=1)
        s = (
            c[win_size:, win_size:]
            - c[:-win_size, win_size:]
            - c[win_size:, :-win_size]
            + c[:-win_size, :-win_size]
        )
        return s / (win_size * win_size)

    NP = win_size * win_size
    cov_norm = NP / (NP - 1)
    ux, uy = box_valid(X), box_valid(Y)
    uxx, uyy, uxy = box_valid(X * X), box_valid(Y * Y), box_valid(X * Y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    return float(S.mean())
