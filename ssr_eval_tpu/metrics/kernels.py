"""The four SSR evaluation metrics as pure JAX kernels.

Replicates reference ssr_eval/metrics.py formula-for-formula (including its
quirks — SURVEY §7 'preserve' list):

- metric STFT params derive from the evaluation rate:
  hop = int(rate/100), n_fft = int(2048/(44100/rate))   (metrics.py:17-19)
  e.g. 44100 -> (441, 2048); 48000 -> (480, 2229: non-power-of-2 -> DFT
  matmul); 16000 -> (160, 743).
- both signals truncate to the shorter length before analysis
  (metrics.py:89-90); here that is a traced `min_len` with frame masks, so
  a bucket of mixed-length utterances shares one compiled kernel.
- LSD keeps the asymmetric epsilon: log10(target^2/(est+EPS)^2 + EPS)
  (metrics.py:110).
- SiSpec projects target onto est energy (energy_unify, utils.py:79-92).
- log-SiSpec is SiSpec of log10(sp + 1e-12) spectrograms (metrics.py:99-101).
- SSIM matches skimage structural_similarity defaults as called with float
  spectrograms and win_size=7 (metrics.py:131): uniform 7x7 window,
  unbiased covariance, data_range = 2.0 (float dtype range), border crop of
  (win_size-1)//2 — which makes 'valid'-mode box filtering exact.

Everything is a masked reduction over a [max_frames, n_bins] magnitude
spectrogram; `vmap` over the leading axis batches utterances and the
harness shards that axis over the device mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.dsp.spectral import StftConfig, n_frames_for_length, stft_magnitude

EPS = 1e-12
SSIM_WIN = 7
SSIM_DATA_RANGE = 2.0  # legacy skimage float dtype_range (-1, 1)


@functools.lru_cache(maxsize=16)
def metric_stft_config(rate: int) -> StftConfig:
    """STFT parameters derived from the evaluation rate (metrics.py:17-19)."""
    return StftConfig(n_fft=int(2048 / (44100 / rate)), hop=int(rate / 100))


def _to_log(x):
    return jnp.log10(x + EPS)


def _lsd(est_sp, tgt_sp, fmask):
    """Log-spectral distance over valid frames; [T,F] inputs, [T] mask."""
    ratio = jnp.log10(tgt_sp**2 / ((est_sp + EPS) ** 2) + EPS) ** 2
    per_frame = jnp.sqrt(jnp.mean(ratio, axis=1))
    n = jnp.maximum(jnp.sum(fmask), 1.0)
    return jnp.sum(per_frame * fmask) / n


def _sispec(est_sp, tgt_sp):
    """Scale-invariant spectral SNR; inputs pre-masked (invalid rows = 0)."""
    pow_norm = jnp.sum(est_sp * tgt_sp)
    target = pow_norm * tgt_sp / (jnp.sum(tgt_sp**2) + EPS)
    noise = est_sp - target
    return 10.0 * jnp.log10(jnp.sum(target**2) / (jnp.sum(noise**2) + EPS) + EPS)


def _box_valid_means(a, win):
    """'valid'-mode win x win box means of [T,F].

    Uses reduce_window (local sums) rather than integral-image cumsums:
    global cumulative sums in f32 lose ~1e-7 * total relative precision,
    which annihilates the tiny variances of masked high-band regions.
    Kept as ONE 2-D window: the seemingly-cheaper separable
    (win,1)+(1,win) split measured +3.7 ms/call SLOWER on the fused
    headline program (interleaved A/B, r4) — the sublane-dim window pass
    forces retiling that outweighs the 49->14 adds/point saving.
    """
    s = jax.lax.reduce_window(
        a,
        0.0,
        jax.lax.add,
        window_dimensions=(win, win),
        window_strides=(1, 1),
        padding="VALID",
    )
    return s / (win * win)


def ssim_target_moments(tgt_m):
    """Precomputed SSIM box moments (uy, uyy) of a masked target
    spectrogram.  They depend only on the target, so a sweep evaluation
    computes them once per utterance and shares them across every
    degradation spec (2 of the 5 box sums; the device trace shows the
    per-spec recompute as pure waste)."""
    win = SSIM_WIN
    return _box_valid_means(tgt_m, win), _box_valid_means(tgt_m * tgt_m, win)


def _ssim(est_sp, tgt_sp, n_frames, tgt_moments=None):
    """Mean SSIM over valid window positions (t < n_frames - win + 1)."""
    win = SSIM_WIN
    X, Y = est_sp, tgt_sp
    ux = _box_valid_means(X, win)
    if tgt_moments is None:
        uy = _box_valid_means(Y, win)
        uyy = _box_valid_means(Y * Y, win)
    else:
        uy, uyy = tgt_moments
    uxx = _box_valid_means(X * X, win)
    uxy = _box_valid_means(X * Y, win)
    NP = win * win
    cov_norm = NP / (NP - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * SSIM_DATA_RANGE) ** 2
    C2 = (0.03 * SSIM_DATA_RANGE) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    t_valid = jnp.arange(S.shape[0]) < (n_frames - win + 1)
    mask = t_valid[:, None].astype(S.dtype)
    count = jnp.maximum(jnp.sum(mask) * S.shape[1], 1.0)
    return jnp.sum(S * mask) / count


def spectral_metrics_with_target(
    est, min_len, tgt_sp, cfg: StftConfig, max_frames: int, tgt_ssim_moments=None
):
    """Metrics of `est` against a precomputed target spectrogram.

    `tgt_sp` must be the magnitude STFT of the target truncated to the
    same `min_len` (see `spectral_metrics`).  Splitting the target out
    lets sweep evaluations compute it once per utterance and share it
    across every degradation spec; `tgt_ssim_moments` optionally shares
    the target's SSIM box moments (`ssim_target_moments(tgt_sp * m2)`)
    the same way.
    """
    est_sp = stft_magnitude(est, min_len, cfg, max_frames)

    nf = n_frames_for_length(cfg, min_len)
    fmask = (jnp.arange(max_frames) < nf).astype(est_sp.dtype)
    m2 = fmask[:, None]

    est_m = est_sp * m2
    tgt_m = tgt_sp * m2

    return {
        "lsd": _lsd(est_sp, tgt_sp, fmask),
        "log_sispec": _sispec(_to_log(est_sp) * m2, _to_log(tgt_sp) * m2),
        "sispec": _sispec(est_m, tgt_m),
        "ssim": _ssim(est_m, tgt_m, nf, tgt_ssim_moments),
    }


def spectral_metrics(est, est_len, tgt, tgt_len, cfg: StftConfig, max_frames: int):
    """All four metrics for one buffered (est, target) pair.

    est/tgt: [Lmax] buffers with traced true lengths.  Implements the
    reference's truncate-to-min semantics (metrics.py:89-90) by analyzing
    both signals at min(est_len, tgt_len).  Returns a dict of f32 scalars.
    """
    min_len = jnp.minimum(est_len, tgt_len)
    tgt_sp = stft_magnitude(tgt, min_len, cfg, max_frames)
    return spectral_metrics_with_target(est, min_len, tgt_sp, cfg, max_frames)


def batched_spectral_metrics(est, est_lens, tgt, tgt_lens, cfg: StftConfig, max_frames: int):
    """vmap of `spectral_metrics` over the utterance axis: [B, Lmax] x2."""
    fn = lambda e, el, t, tl: spectral_metrics(e, el, t, tl, cfg, max_frames)
    return jax.vmap(fn)(est, est_lens, tgt, tgt_lens)
