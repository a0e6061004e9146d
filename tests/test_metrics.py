"""Metric kernels vs. float64 oracle implementations of the reference
formulas (metrics.py:51-132), including batched mixed-length parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssr_eval_tpu.metrics.audio_metrics import AudioMetrics
from ssr_eval_tpu.metrics.kernels import batched_spectral_metrics, metric_stft_config
from tests.oracles import lsd_np, sispec_np, ssim_np, stft_np


def _pair(L, seed=0, sr=44100):
    rng = np.random.default_rng(seed)
    t = np.arange(L) / sr
    tgt = (
        0.4 * np.sin(2 * np.pi * 520 * t)
        + 0.2 * np.sin(2 * np.pi * 6300 * t + 0.5)
        + 0.1 * np.sin(2 * np.pi * 12345 * t + 1.5)
        + 0.01 * rng.standard_normal(L)
    ).astype(np.float32)
    # est: lowpassed-ish + noise — a plausible SSR output
    est = tgt * 0.9 + 0.02 * rng.standard_normal(L).astype(np.float32)
    return est.astype(np.float32), tgt


def _oracle(est, tgt, rate):
    hop = int(rate / 100)
    n_fft = int(2048 / (44100 / rate))
    min_len = min(len(est), len(tgt))
    est, tgt = est[:min_len], tgt[:min_len]
    est_sp = np.abs(stft_np(est.astype(np.float64), n_fft, hop)).T
    tgt_sp = np.abs(stft_np(tgt.astype(np.float64), n_fft, hop)).T
    return {
        "lsd": lsd_np(est_sp, tgt_sp),
        "log_sispec": sispec_np(np.log10(est_sp + 1e-12), np.log10(tgt_sp + 1e-12)),
        "sispec": sispec_np(est_sp, tgt_sp),
        "ssim": ssim_np(est_sp, tgt_sp),
    }


@pytest.mark.parametrize("rate", [44100, 48000, 16000])
def test_audio_metrics_matches_oracle(rate):
    est, tgt = _pair(30011, seed=1, sr=rate)
    am = AudioMetrics(rate)
    got = am.evaluation(est, tgt, None)
    ref = _oracle(est, tgt, rate)
    assert abs(got["lsd"] - ref["lsd"]) < 1e-3, (got["lsd"], ref["lsd"])
    assert abs(got["ssim"] - ref["ssim"]) < 1e-3, (got["ssim"], ref["ssim"])
    assert abs(got["sispec"] - ref["sispec"]) < 0.05, (got["sispec"], ref["sispec"])
    assert abs(got["log_sispec"] - ref["log_sispec"]) < 0.05


def test_length_mismatch_truncation():
    """Reference truncates both to min length (metrics.py:89-90)."""
    est, tgt = _pair(20000, seed=2)
    am = AudioMetrics(44100)
    got = am.evaluation(est[:19950], tgt, None)
    ref = _oracle(est[:19950], tgt, 44100)
    assert abs(got["lsd"] - ref["lsd"]) < 1e-3


def test_length_mismatch_guard():
    est, tgt = _pair(20000, seed=3)
    am = AudioMetrics(44100)
    with pytest.raises(AssertionError):
        am.evaluation(est[:19000], tgt, None)


def test_batched_mixed_lengths_match_single():
    """One compiled kernel over a bucket of different-length pairs must
    reproduce the per-pair results."""
    rate = 44100
    cfg = metric_stft_config(rate)
    lengths = [16000, 20011, 24000]
    lmax = 24000
    mf = cfg.max_frames(lmax)
    est_b = np.zeros((3, lmax), np.float32)
    tgt_b = np.zeros((3, lmax), np.float32)
    singles = []
    for i, L in enumerate(lengths):
        est, tgt = _pair(L, seed=10 + i)
        est_b[i, :L], tgt_b[i, :L] = est, tgt
        singles.append(AudioMetrics(rate).evaluation(est, tgt, None))
    out = batched_spectral_metrics(
        jnp.asarray(est_b),
        jnp.asarray(np.array(lengths, np.int32)),
        jnp.asarray(tgt_b),
        jnp.asarray(np.array(lengths, np.int32)),
        cfg,
        mf,
    )
    for i in range(3):
        for k in ("lsd", "log_sispec", "sispec", "ssim"):
            assert abs(float(out[k][i]) - singles[i][k]) < 2e-3, (k, i)


def test_identity_pair_limits():
    """est == target: lsd ~ 0, ssim ~ 1, sispec large."""
    est, tgt = _pair(16000, seed=4)
    am = AudioMetrics(44100)
    got = am.evaluation(tgt.copy(), tgt, None)
    assert got["lsd"] < 1e-3
    assert got["ssim"] > 0.999
    assert got["sispec"] > 100.0


def test_float64_host_mode_matches_oracle():
    """AudioMetrics(precision='float64') reproduces the float64 oracle
    bit-for-bit-ish (same formulas, vectorized)."""
    est, tgt = _pair(25000, seed=9)
    am = AudioMetrics(44100, precision="float64")
    got = am.evaluation(est, tgt, None)
    ref = _oracle(est, tgt, 44100)
    for k in ("lsd", "ssim"):
        assert abs(got[k] - ref[k]) < 1e-9, (k, got[k], ref[k])
    for k in ("sispec", "log_sispec"):
        assert abs(got[k] - ref[k]) < 1e-6, k


def test_center_crop_parity():
    am = AudioMetrics(44100)
    x = np.zeros((1, 1, 20, 8))
    y = np.zeros((1, 1, 17, 8))
    cx, cy = am.center_crop(x, y)
    assert cx.shape == (1, 1, 17, 8) and cy.shape == (1, 1, 17, 8)
    with pytest.raises(AssertionError):
        am.center_crop(np.zeros((1, 1, 40, 8)), np.zeros((1, 1, 20, 8)))


def test_per_metric_public_methods():
    """AudioMetrics.lsd/.sispec/.ssim on [B, C, T, F] spectrograms match
    the float64 oracle formulas (reference metrics.py:109-132 surface)."""
    import numpy as np

    from ssr_eval_tpu.metrics.audio_metrics import AudioMetrics
    from tests.oracles import lsd_np, sispec_np, ssim_np

    rng = np.random.default_rng(5)
    m = AudioMetrics(44100)
    est = np.abs(rng.standard_normal((2, 1, 64, 100))).astype(np.float32)
    tgt = np.abs(rng.standard_normal((2, 1, 64, 100))).astype(np.float32)

    lsd = m.lsd(est, tgt)
    assert lsd.shape == (2, 1, 1, 1)
    for b in range(2):
        assert abs(lsd[b, 0, 0, 0] - lsd_np(est[b, 0], tgt[b, 0])) < 1e-4

    si = m.sispec(est, tgt)
    oracle = sum(sispec_np(est[b, 0], tgt[b, 0]) for b in range(2)) / 2
    assert abs(si - oracle) < 1e-2, (si, oracle)

    ss = m.ssim(est, tgt)
    assert ss.shape == (2, 1, 1, 1)
    for b in range(2):
        assert abs(ss[b, 0, 0, 0] - ssim_np(est[b, 0], tgt[b, 0])) < 1e-4
