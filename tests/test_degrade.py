"""Degradation kernels vs. float64 oracle implementations of the
reference's lowpass.py behaviors."""

import numpy as np
import pytest
from scipy.signal import resample_poly, sosfiltfilt as scipy_sff

import jax
import jax.numpy as jnp

from ssr_eval_tpu.degrade.apply import build_degrader
from ssr_eval_tpu.degrade.lowpass import align_length, lowpass
from ssr_eval_tpu.degrade.plan import DegradationSpec, expand_settings
from ssr_eval_tpu.dsp.filters import design_lowpass_sos
from tests.oracles import istft_np, stft_np


def _sig(n, seed=0, sr=44100):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (
        0.4 * np.sin(2 * np.pi * 700 * t)
        + 0.3 * np.sin(2 * np.pi * 8000 * t + 1.0)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)


def test_expand_settings_key_parity():
    specs = expand_settings(
        setting_lowpass_filtering={
            "filter": ["cheby", "butter"],
            "cutoff_freq": [8000, 44100],
            "filter_order": [3, 6],
        },
        setting_subsampling={"cutoff_freq": [8000]},
        setting_fft={"cutoff_freq": [24000]},
        setting_mp3_compression={"low_kbps": [32]},
        sr=44100,
    )
    keys = [s.key for s in specs]
    # butter family first (preprocess order), cutoff x order grid, 44100
    # decremented to 44099 (cutoff == sr quirk), then cheby, then
    # subsampling, mp3, fft last.
    assert keys == [
        "proc_bw_8000_3_44100",
        "proc_bw_8000_6_44100",
        "proc_bw_44099_3_44100",
        "proc_bw_44099_6_44100",
        "proc_ch_8000_3_44100",
        "proc_ch_8000_6_44100",
        "proc_ch_44099_3_44100",
        "proc_ch_44099_6_44100",
        "proc_subsampling_8000_44100",
        "proc_mp3_32_44100",
        "proc_fft_24000_44100",
    ]


@pytest.mark.parametrize("ftype", ["butter", "cheby1", "bessel", "ellip"])
def test_iir_degradation_matches_scipy(ftype):
    L = 24000
    x = _sig(L)
    spec = DegradationSpec("k", "iir", ftype, 8000, 8, 44100)
    fn = jax.jit(build_degrader(spec, L))
    got = np.asarray(fn(jnp.asarray(x), jnp.int32(L)))
    sos = design_lowpass_sos(ftype, 8, 4000, 44100)
    ref = scipy_sff(sos, x.astype(np.float64))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_order_clamp():
    """Order 15 clamps to 10; order 1 clamps to 2 (lowpass.py:147-153)."""
    L = 16000
    x = _sig(L, seed=1)
    got = lowpass(x, 4000, 44100, order=15, _type="butter")
    ref = scipy_sff(design_lowpass_sos("butter", 10, 4000, 44100), x.astype(np.float64))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4
    got2 = lowpass(x, 4000, 44100, order=1, _type="butter")
    ref2 = scipy_sff(design_lowpass_sos("butter", 2, 4000, 44100), x.astype(np.float64))
    assert np.abs(got2 - ref2).max() / np.abs(ref2).max() < 1e-4


def test_subsampling_matches_scipy_roundtrip():
    """Including the reference's fs_ori=44100-always quirk."""
    L = 20000
    for sr, highcut in [(44100, 4000), (48000, 8000)]:
        x = _sig(L, seed=2, sr=sr)
        spec = DegradationSpec("k", "subsampling", None, highcut * 2, 1, sr)
        fn = jax.jit(build_degrader(spec, L))
        got = np.asarray(fn(jnp.asarray(x), jnp.int32(L)))
        fs_down = int(highcut / int(sr / 2) * 44100)
        y = resample_poly(x.astype(np.float64), fs_down, 44100)
        y = resample_poly(y, 44100, fs_down)
        ref = align_length(x, y)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4, sr


def test_fft_mask_matches_oracle():
    L = 22050
    x = _sig(L, seed=3)
    spec = DegradationSpec("k", "fft", None, 12000, 1, 44100)
    fn = jax.jit(build_degrader(spec, L))
    got = np.asarray(fn(jnp.asarray(x), jnp.int32(L)))
    Z = stft_np(x.astype(np.float64), 2048, 441)
    cut = int(1025 * (6000 / 22050))
    Z[cut:, :] = 0.0
    ref = istft_np(Z, 2048, 441, length=L)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_fft_mask_bucketed_equals_tight():
    L, Lmax = 15000, 32768
    x = _sig(L, seed=4)
    spec = DegradationSpec("k", "fft", None, 8000, 1, 44100)
    tight = np.asarray(jax.jit(build_degrader(spec, L))(jnp.asarray(x), jnp.int32(L)))
    xb = np.zeros(Lmax, np.float32)
    xb[:L] = x
    bucket = np.asarray(jax.jit(build_degrader(spec, Lmax))(jnp.asarray(xb), jnp.int32(L)))
    np.testing.assert_allclose(bucket[:L], tight, atol=2e-5)
    assert np.abs(bucket[L:]).max() == 0.0


def test_lowpass_1d_validation():
    with pytest.raises(ValueError):
        lowpass(np.zeros((100, 1), np.float32), 4000, 44100)


def test_lowpass_substring_dispatch():
    """_type 'butt' matches 'butter'; 'stft_hard' routes to the mask."""
    L = 8192
    x = _sig(L, seed=5)
    a = lowpass(x, 4000, 44100, order=5, _type="butt")
    b = lowpass(x, 4000, 44100, order=5, _type="butter")
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        lowpass(x, 4000, 44100, _type="nonsense")


def test_mp3_plumbing_with_stub_codec(tmp_path, monkeypatch):
    """MP3 path end-to-end with the codec round-trip stubbed by a lossy
    quantize+shift (no sox/ffmpeg on this machine): exercises unify_length,
    FFT-correlation realignment, FLAC caching and the non-identity assert
    (reference eval.py:302-325)."""
    from ssr_eval_tpu.degrade import codec
    from ssr_eval_tpu.io.audio import decode_audio, read_wav, write_wav

    L = 20000
    x = _sig(L, seed=21)

    def fake_backend():
        return "stub"

    def fake_encode_decode(src_wav, kbps, backend, workdir):
        import os
        y, sr = read_wav(src_wav)
        # lossy-ish: quantize harder + delay by 37 samples (mp3 padding)
        y = np.round(y * 2048) / 2048
        y = np.concatenate([np.zeros(37, np.float32), y]).astype(np.float32)
        out = os.path.join(workdir, "dec.wav")
        write_wav(out, y, sr)
        return out

    monkeypatch.setattr(codec, "detect_backend", fake_backend)
    monkeypatch.setattr(codec, "_encode_decode_mp3", fake_encode_decode)

    cache = str(tmp_path / "utt_proc_mp3_64_44100.flac")
    out = codec.mp3_degrade("utt.flac", x, 44100, 64, cache_path=cache)
    assert out.shape == x.shape
    # The reference's shift formula `argmax(correlate) - len(x)` is off by
    # one (eval.py:319-320), leaving exactly one sample of residual delay —
    # preserved here.  out[n] == quantized x[n-1] in the interior.
    err_aligned = np.abs(out[101:-100] - np.round(x[100:-101] * 2048) / 2048).max()
    assert err_aligned < 2e-3, err_aligned
    # cached FLAC exists and decodes to the aligned audio
    y, sr = decode_audio(cache)
    assert sr == 44100
    np.testing.assert_allclose(y[:, 0] if y.ndim > 1 else y, out, atol=1e-4)


def test_lowpass_filter_exact_type_matches_scipy():
    """lowpass_filter / bandpass_filter (exact-name dispatch, no order
    clamp, cheby2 reachable) vs float64 scipy sosfiltfilt."""
    from scipy.signal import butter, cheby2

    from ssr_eval_tpu.degrade.lowpass import bandpass_filter, lowpass_filter

    rng = np.random.default_rng(11)
    x = rng.standard_normal(9000).astype(np.float32)

    y = lowpass_filter(x, 4000, 44100, 12, "cheby2")  # order 12: unclamped
    sos = cheby2(12, 60, 4000 / 22050, btype="low", output="sos")
    ref = scipy_sff(sos, x.astype(np.float64))
    assert np.max(np.abs(y - ref)) < 5e-4 * np.max(np.abs(ref))

    y = bandpass_filter(x, 1000, 6000, 44100, 4, "butter")
    sos = butter(4, [1000 / 22050, 6000 / 22050], btype="band", output="sos")
    ref = scipy_sff(sos, x.astype(np.float64))
    assert np.max(np.abs(y - ref)) < 5e-4 * np.max(np.abs(ref))

    with pytest.raises(ValueError, match="not supported"):
        lowpass_filter(x, 4000, 44100, 4, "cheby")  # substring not accepted here


def test_stft_hard_lowpass_v0_matches_oracle():
    """stft_hard_lowpass_v0(data, ratio) vs the float64 STFT-mask oracle
    (reference lowpass.py:17-28)."""
    from ssr_eval_tpu.degrade.lowpass import stft_hard_lowpass_v0

    rng = np.random.default_rng(12)
    x = rng.standard_normal(8000).astype(np.float32)
    ratio = 6000 / 22050
    y = stft_hard_lowpass_v0(x, ratio)
    Z = stft_np(x.astype(np.float64), 2048, 441)
    Z[int(1025 * ratio):, :] = 0.0
    ref = istft_np(Z, 2048, 441, length=len(x))
    assert y.shape == x.shape
    assert np.max(np.abs(y - ref)) < 1e-4
