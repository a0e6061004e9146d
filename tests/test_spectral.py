"""STFT/iSTFT kernels vs. the NumPy oracle (librosa semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssr_eval_tpu.dsp.spectral import (
    StftConfig,
    istft,
    n_frames_for_length,
    stft_magnitude,
    stft_real_imag,
)
from tests.oracles import istft_np, stft_np


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3150 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


CFGS = [
    StftConfig(n_fft=2048, hop=441),   # FDomainHelper degradation STFT (dsp.py:7-10)
    StftConfig(n_fft=2048, hop=512),   # librosa defaults (BasicTestee)
    StftConfig(n_fft=2229, hop=480),   # metric STFT at 48 kHz (metrics.py:17-19)
    StftConfig(n_fft=743, hop=160),    # metric STFT at 16 kHz
]


@pytest.mark.parametrize("cfg", CFGS)
@pytest.mark.parametrize("L", [9000, 12345])
def test_stft_matches_oracle(cfg, L):
    x = _sig(L)
    Z = stft_np(x.astype(np.float64), cfg.n_fft, cfg.hop)
    mf = cfg.max_frames(L)
    real, imag = stft_real_imag(jnp.asarray(x), L, cfg, mf)
    nf = int(n_frames_for_length(cfg, L))
    assert nf == Z.shape[1]
    got = np.asarray(real[:nf]) + 1j * np.asarray(imag[:nf])
    ref = Z.T
    scale = np.abs(ref).max()
    # f32 budget: rfft path ~1e-6 rel; dense f32 DFT matmul (non-pow2 n_fft)
    # accumulates to ~3e-4 rel of the spectral peak.
    assert np.abs(got - ref).max() / scale < 5e-4


@pytest.mark.parametrize("cfg", CFGS)
def test_stft_bucketed_length_invariance(cfg):
    """Same signal in a longer zero-padded bucket -> identical valid frames."""
    L = 10000
    x = _sig(L)
    mf_b = cfg.max_frames(16384)
    xb = np.zeros(16384, dtype=np.float32)
    xb[:L] = x
    rb, ib = stft_real_imag(jnp.asarray(xb), L, cfg, mf_b)
    r, i = stft_real_imag(jnp.asarray(x), L, cfg, cfg.max_frames(L))
    nf = int(n_frames_for_length(cfg, L))
    np.testing.assert_allclose(np.asarray(rb[:nf]), np.asarray(r[:nf]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ib[:nf]), np.asarray(i[:nf]), atol=1e-5)


@pytest.mark.parametrize("cfg", CFGS[:3])
def test_istft_roundtrip(cfg):
    L = 11025
    x = _sig(L)
    mf = cfg.max_frames(L)
    real, imag = stft_real_imag(jnp.asarray(x), L, cfg, mf)
    nf = int(n_frames_for_length(cfg, L))
    fmask = (np.arange(mf) < nf)[:, None]
    y = istft(real * fmask, imag * fmask, L, cfg, L)
    # Oracle roundtrip for cross-check
    y_ref = istft_np(stft_np(x.astype(np.float64), cfg.n_fft, cfg.hop), cfg.n_fft, cfg.hop, length=L)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-5)
    # Roundtrip ~ identity in the interior
    np.testing.assert_allclose(np.asarray(y)[cfg.n_fft:-cfg.n_fft], x[cfg.n_fft:-cfg.n_fft], atol=5e-4)


def test_magnitude():
    cfg = CFGS[0]
    L = 9000
    x = _sig(L)
    mag = stft_magnitude(jnp.asarray(x), L, cfg, cfg.max_frames(L))
    ref = np.abs(stft_np(x.astype(np.float64), cfg.n_fft, cfg.hop)).T
    nf = ref.shape[0]
    np.testing.assert_allclose(np.asarray(mag[:nf]), ref, atol=2e-4)


def test_fdomain_helper_roundtrip():
    """FDomainHelper public surface (reference dsp.py API): stft->istft
    roundtrip through (mag, cos, sin) recovers the signal."""
    from ssr_eval_tpu.dsp.fdomain import FDomainHelper

    f = FDomainHelper()
    L = 22050
    x = _sig(L, seed=8)[None, None, :]  # [B=1, C=1, samples]
    sps, coss, sins = f.wav_to_spectrogram_phase(x)
    assert sps.shape[0:2] == (1, 1) and sps.shape[3] == 1025
    y = f.spectrogram_phase_to_wav(sps, coss, sins, L)
    assert y.shape == (1, 1, L)
    np.testing.assert_allclose(y[0, 0, 2048:-2048], x[0, 0, 2048:-2048], atol=1e-3)


def test_fdomain_complex_roundtrip():
    from ssr_eval_tpu.dsp.fdomain import FDomainHelper

    f = FDomainHelper()
    L = 10000
    x = _sig(L, seed=9)[None, None, :]
    cs = f.wav_to_complex_spectrogram(x)
    assert cs.shape[1] == 2
    y = f.complex_spectrogram_to_wav(cs, length=L)
    np.testing.assert_allclose(y[0, 0, 2048:-2048], x[0, 0, 2048:-2048], atol=1e-3)


def test_fdomain_subband():
    """subband divides window/hop sizes (reference dsp.py:40-59)."""
    from ssr_eval_tpu.dsp.fdomain import FDomainHelper

    f = FDomainHelper(subband=2)
    assert f.cfg.n_fft == 1024 and f.cfg.hop == 220
    L = 9000
    x = _sig(L, seed=10)[None, None, :]
    sps, coss, sins = f.wav_to_spectrogram_phase(x)
    assert sps.shape[3] == 513
    y = f.spectrogram_phase_to_wav(sps, coss, sins, L)
    np.testing.assert_allclose(y[0, 0, 1024:-1024], x[0, 0, 1024:-1024], atol=1e-3)


# ---------------------------------------------------------------------------
# Cooley-Tukey matmul FFT (dsp/fft_matmul.py)
# ---------------------------------------------------------------------------


def test_ct_fft_matches_numpy_rfft():
    """Every supported MXU base width (128/256/512/1024, plus the module
    default) must agree with numpy — the base is a perf knob
    (fft_matmul._default_base), never a semantics knob.  Sizes smaller
    than the base take the capped single-matmul path (ct_levels)."""
    import numpy as np
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.fft_matmul import ct_levels, rfft_ct

    rng = np.random.default_rng(0)
    for base in (None, 128, 256, 512, 1024):
        for n in (128, 256, 1024, 2048):
            assert ct_levels(n, base) is not None, (n, base)
            x = rng.standard_normal((2, 5, n)).astype(np.float32)
            re, im = rfft_ct(jnp.asarray(x), n, base)
            ref = np.fft.rfft(x.astype(np.float64), axis=-1)
            scale = np.abs(ref).max()
            assert np.max(np.abs(np.asarray(re) - ref.real)) / scale < 1e-6
            assert np.max(np.abs(np.asarray(im) - ref.imag)) / scale < 1e-6


def test_ct_irfft_roundtrip():
    import numpy as np
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.fft_matmul import irfft_ct, rfft_ct

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    re, im = rfft_ct(jnp.asarray(x), 2048)
    y = irfft_ct(re, im, 2048)
    assert np.max(np.abs(np.asarray(y) - x)) < 2e-6


def test_ct_levels_non_pow2_none():
    from ssr_eval_tpu.dsp.fft_matmul import ct_levels

    assert ct_levels(2229) is None  # 48 kHz metric size -> dense DFT path
    assert ct_levels(743) is None
    assert ct_levels(64) is None  # below the MXU base tile


def test_frame_slabs_equals_gather():
    import numpy as np
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.spectral import frame_slabs

    rng = np.random.default_rng(2)
    hop, n_fft, mf = 441, 2048, 9
    ext = rng.standard_normal(hop * (mf - 1) + n_fft).astype(np.float32)
    got = np.asarray(frame_slabs(jnp.asarray(ext), hop, n_fft, mf))
    want = np.stack([ext[i * hop : i * hop + n_fft] for i in range(mf)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cfg", CFGS)
@pytest.mark.parametrize("frac", [1.0, 0.61, 0.13, 0.0])
def test_wss_closed_form_matches_masked_ola(cfg, frac):
    """istft's window-sum-square closed form (W[j] - W[j - nf*hop] over
    the cumulative window-energy array) == the direct masked OLA of
    win^2 for every valid-frame count, including nf=0 and nf=max."""
    from ssr_eval_tpu.dsp.spectral import (
        _overlap_add,
        _wss_semi_infinite,
        hann_window,
    )

    L = 12000
    mf = cfg.max_frames(L)
    nf = int(round(frac * mf))
    win = hann_window(cfg.win).astype(np.float64)
    if cfg.win < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win) // 2
        win = np.pad(win, (lpad, cfg.n_fft - cfg.win - lpad))
    # direct construction: OLA of fmask * win^2 (the pre-r4 kernel)
    fmask = (np.arange(mf) < nf).astype(np.float32)[:, None]
    w2 = (win * win).astype(np.float32)[None, :]
    ref = np.asarray(_overlap_add(jnp.asarray(fmask * w2), cfg.hop))
    total = ref.shape[0]
    W = _wss_semi_infinite(cfg.n_fft, cfg.hop, cfg.win, total)
    Wpad = np.concatenate([np.zeros(total, np.float32), W])
    got = W - Wpad[total - nf * cfg.hop : 2 * total - nf * cfg.hop]
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_dsp_precision_env_plumbing(monkeypatch):
    """SSR_EVAL_TPU_DSP_PRECISION maps to the lax.Precision levels (read
    at TRACE time by the CT base-DFT / dense-DFT matmuls); unknown or
    unset values fall back to the benched default HIGH (dsp/precision.py
    — adjudicated by the interleaved on-chip A/B, scripts/fftprec_ab.py).
    Precision only changes MXU pass counts on TPU — on the CPU test
    backend results are identical, so this pins the plumbing and the
    numerics-neutral path."""
    import jax
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.fft_matmul import rfft_ct
    from ssr_eval_tpu.dsp.precision import dsp_precision

    monkeypatch.delenv("SSR_EVAL_TPU_DSP_PRECISION", raising=False)
    assert dsp_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv("SSR_EVAL_TPU_DSP_PRECISION", "highest")
    assert dsp_precision() == jax.lax.Precision.HIGHEST
    monkeypatch.setenv("SSR_EVAL_TPU_DSP_PRECISION", "HIGH")
    assert dsp_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv("SSR_EVAL_TPU_DSP_PRECISION", "default")
    assert dsp_precision() == jax.lax.Precision.DEFAULT
    monkeypatch.setenv("SSR_EVAL_TPU_DSP_PRECISION", "bogus")
    assert dsp_precision() == jax.lax.Precision.HIGH

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 2048)), jnp.float32)
    monkeypatch.setenv("SSR_EVAL_TPU_DSP_PRECISION", "high")
    re_h, im_h = (np.asarray(a) for a in rfft_ct(x, 2048))
    monkeypatch.delenv("SSR_EVAL_TPU_DSP_PRECISION")
    re, im = (np.asarray(a) for a in rfft_ct(x, 2048))
    ref = np.fft.rfft(np.asarray(x, np.float64), axis=-1)
    scale = np.abs(ref).max()
    for r, i in ((re_h, im_h), (re, im)):
        assert np.max(np.abs(r - ref.real)) / scale < 1e-6
        assert np.max(np.abs(i - ref.imag)) / scale < 1e-6


def test_rfft_mode_env_plumbing_and_cap(monkeypatch):
    """SSR_EVAL_TPU_RFFT_MODE selects the real-FFT factorization for the
    STFT sites (fft_matmul._default_rfft_mode; benched TPU default
    "dense" via "auto", scripts/rfftmode_ab.py: pack 75.5 / direct 85.0
    / dense 58.4 ms/batch marginal on-chip).  "auto" resolves per
    backend at trace time — dense on TPU, pack on CPU (CPU dnnl GEMMs
    are M-shape-dependent: batch-composition invariance would break at
    the stopband floor, tests/test_fuzz.py).  The dense routing is
    capped at n_fft <= 4096 so the FFT-conv filter path's ~1M-point
    transforms can never land on an O(N^2) matmul."""
    import jax

    from ssr_eval_tpu.dsp import fft_matmul as fm
    from ssr_eval_tpu.dsp import spectral as sp

    monkeypatch.delenv("SSR_EVAL_TPU_RFFT_MODE", raising=False)
    assert fm._default_rfft_mode() == "auto"
    monkeypatch.setenv("SSR_EVAL_TPU_RFFT_MODE", "pack")
    assert fm._default_rfft_mode() == "pack"
    monkeypatch.setenv("SSR_EVAL_TPU_RFFT_MODE", "DIRECT")
    assert fm._default_rfft_mode() == "direct"
    monkeypatch.setenv("SSR_EVAL_TPU_RFFT_MODE", "dense")
    assert fm._default_rfft_mode() == "dense"
    monkeypatch.setenv("SSR_EVAL_TPU_RFFT_MODE", "bogus")
    assert fm._default_rfft_mode() == "auto"

    monkeypatch.setattr(fm, "_RFFT_MODE", "dense")
    assert sp._dense_pow2(2048)
    assert not sp._dense_pow2(1 << 20)
    monkeypatch.setattr(fm, "_RFFT_MODE", "pack")
    assert not sp._dense_pow2(2048)
    # "auto" on the CPU test backend resolves to pack (invariance).
    monkeypatch.setattr(fm, "_RFFT_MODE", "auto")
    assert jax.default_backend() == "cpu"
    assert not sp._dense_pow2(2048)


def test_rfft_mode_equivalence(monkeypatch):
    """All three factorizations (pack / direct CT / dense rDFT) are perf
    knobs, never semantics knobs: stft + istft outputs must agree to f32
    tolerance across modes, and rfft_ct's internal pack/direct switch
    must match numpy either way."""
    from ssr_eval_tpu.dsp import fft_matmul as fm
    from ssr_eval_tpu.dsp import spectral as sp

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = np.abs(ref).max()
    for mode in ("pack", "direct"):
        monkeypatch.setattr(fm, "_RFFT_MODE", mode)
        re, im = fm.rfft_ct(jnp.asarray(x), 2048)
        assert np.max(np.abs(np.asarray(re) - ref.real)) / scale < 1e-6, mode
        assert np.max(np.abs(np.asarray(im) - ref.imag)) / scale < 1e-6, mode
        y = fm.irfft_ct(jnp.asarray(ref.real.astype(np.float32)),
                        jnp.asarray(ref.imag.astype(np.float32)), 2048)
        assert np.max(np.abs(np.asarray(y) - x)) < 2e-6, mode

    cfg = StftConfig(n_fft=2048, hop=441)
    L = 30000
    sig = np.zeros(32768, np.float32)
    sig[:L] = rng.standard_normal(L).astype(np.float32)
    mf = cfg.max_frames(sig.shape[0])
    outs = {}
    for mode in ("pack", "direct", "dense"):
        monkeypatch.setattr(fm, "_RFFT_MODE", mode)
        re, im = sp.stft_real_imag(jnp.asarray(sig), L, cfg, mf)
        nf = int(sp.n_frames_for_length(cfg, L))
        m = (np.arange(mf) < nf)[:, None].astype(np.float32)
        rez = jnp.asarray(np.asarray(re) * m)
        imz = jnp.asarray(np.asarray(im) * m)
        y = sp.istft(rez, imz, L, cfg, sig.shape[0])
        outs[mode] = (np.asarray(re), np.asarray(y))
    sc = np.abs(outs["pack"][0]).max()
    for mode in ("direct", "dense"):
        assert np.max(np.abs(outs[mode][0] - outs["pack"][0])) / sc < 1e-5, mode
        assert np.max(np.abs(outs[mode][1] - outs["pack"][1])) < 1e-4, mode
        assert np.max(np.abs(outs[mode][1][:L] - sig[:L])) < 1e-4, mode


@pytest.mark.parametrize("cfg", CFGS)
@pytest.mark.parametrize("L", [100, 5000, 12000])
def test_wss_patch_bit_exact(cfg, L, monkeypatch):
    """The "patch" wss form (divide by the broadcast constant W, exactly
    recompute the single window where the shifted term is nonzero and
    the output is kept) is BIT-identical to the full-length "slice"
    form for every utterance length, including bucket-edge cases — the
    guarded division sees the same values either way
    (spectral._default_wss_mode)."""
    from ssr_eval_tpu.dsp import spectral as sp

    rng = np.random.default_rng(11)
    Lmax = 12000
    x = np.zeros(Lmax, np.float32)
    x[:L] = rng.standard_normal(L).astype(np.float32)
    mf = cfg.max_frames(Lmax)
    re, im = sp.stft_real_imag(jnp.asarray(x), L, cfg, mf)
    nf = int(sp.n_frames_for_length(cfg, L))
    m = (np.arange(mf) < nf)[:, None].astype(np.float32)
    re = jnp.asarray(np.asarray(re) * m)
    im = jnp.asarray(np.asarray(im) * m)
    monkeypatch.setattr(sp, "_WSS_MODE", "slice")
    y_slice = np.asarray(sp.istft(re, im, L, cfg, Lmax))
    monkeypatch.setattr(sp, "_WSS_MODE", "patch")
    y_patch = np.asarray(sp.istft(re, im, L, cfg, Lmax))
    np.testing.assert_array_equal(y_slice, y_patch)


def test_wss_mode_env_plumbing(monkeypatch):
    from ssr_eval_tpu.dsp import spectral as sp

    monkeypatch.delenv("SSR_EVAL_TPU_WSS", raising=False)
    assert sp._default_wss_mode() == "slice"
    monkeypatch.setenv("SSR_EVAL_TPU_WSS", "patch")
    assert sp._default_wss_mode() == "patch"
    monkeypatch.setenv("SSR_EVAL_TPU_WSS", "bogus")
    assert sp._default_wss_mode() == "slice"


def test_dense_fold_equivalence(monkeypatch):
    """The dense-fold form (window/scale/1/N folded into the rDFT
    matrices, _dft_matrices_windowed/_idft_matrices_windowed) is a perf
    knob, never a semantics knob: stft + istft must agree with the
    separate-pass form to f32 tolerance on both the pow-2 (2048) and
    non-pow-2 (2229, the 48 kHz metric size) dense paths, and both must
    match the f64 oracle."""
    from ssr_eval_tpu.dsp import fft_matmul as fm
    from ssr_eval_tpu.dsp import spectral as sp

    monkeypatch.setattr(fm, "_RFFT_MODE", "dense")  # force dense on CPU
    rng = np.random.default_rng(11)
    for n_fft, hop in ((2048, 441), (2229, 480)):
        cfg = StftConfig(n_fft=n_fft, hop=hop)
        L = 20000
        sig = np.zeros(24000, np.float32)
        sig[:L] = rng.standard_normal(L).astype(np.float32)
        mf = cfg.max_frames(sig.shape[0])
        nf = int(sp.n_frames_for_length(cfg, L))
        outs = {}
        for fold in (False, True):
            monkeypatch.setattr(sp, "_DENSE_FOLD", fold)
            re, im = sp.stft_real_imag(jnp.asarray(sig), L, cfg, mf)
            m = (np.arange(mf) < nf)[:, None].astype(np.float32)
            y = sp.istft(
                jnp.asarray(np.asarray(re) * m),
                jnp.asarray(np.asarray(im) * m),
                L,
                cfg,
                sig.shape[0],
            )
            outs[fold] = (np.asarray(re), np.asarray(im), np.asarray(y))
        sc = np.abs(outs[False][0]).max()
        assert np.max(np.abs(outs[True][0] - outs[False][0])) / sc < 1e-6, n_fft
        assert np.max(np.abs(outs[True][1] - outs[False][1])) / sc < 1e-6, n_fft
        assert np.max(np.abs(outs[True][2] - outs[False][2])) < 1e-5, n_fft
        # oracle: masked-frame STFT rows against f64 numpy
        from tests.oracles import stft_np

        Z = stft_np(sig[:L].astype(np.float64), n_fft, hop)
        for fold in (False, True):
            d = np.max(np.abs(outs[fold][0][:nf] - Z.real.T[:nf])) / sc
            assert d < 1e-6, (n_fft, fold, d)
            assert np.max(np.abs(outs[fold][2][:L] - sig[:L])) < 1e-4, (n_fft, fold)


def test_dense_fold_env_plumbing(monkeypatch):
    from ssr_eval_tpu.dsp import spectral as sp

    monkeypatch.delenv("SSR_EVAL_TPU_DENSE_FOLD", raising=False)
    default = sp._default_dense_fold()
    monkeypatch.setenv("SSR_EVAL_TPU_DENSE_FOLD", "0")
    assert sp._default_dense_fold() is False
    monkeypatch.setenv("SSR_EVAL_TPU_DENSE_FOLD", "1")
    assert sp._default_dense_fold() is True
    monkeypatch.setenv("SSR_EVAL_TPU_DENSE_FOLD", "false")
    assert sp._default_dense_fold() is False
    assert default in (False, True)


def test_ola_mode_bitwise_identical(monkeypatch):
    """The padsum OLA lowering (one pad-and-sum fusion) is bitwise
    identical to the dus form (sequential .at[].add passes): adding
    structural zeros is exact in f32, and both accumulate column k in
    ascending order.  Env plumbing included."""
    from ssr_eval_tpu.dsp import spectral as sp

    rng = np.random.default_rng(21)
    for f, n_fft, hop in ((72, 2048, 441), (31, 743, 160), (8, 2048, 512)):
        fr = rng.standard_normal((f, n_fft)).astype(np.float32)
        monkeypatch.setattr(sp, "_OLA_MODE", "dus")
        a = np.asarray(sp._overlap_add(jnp.asarray(fr), hop))
        monkeypatch.setattr(sp, "_OLA_MODE", "padsum")
        b = np.asarray(sp._overlap_add(jnp.asarray(fr), hop))
        assert np.array_equal(a, b), (f, n_fft, hop)

    monkeypatch.delenv("SSR_EVAL_TPU_OLA", raising=False)
    assert sp._default_ola_mode() in ("dus", "padsum")
    monkeypatch.setenv("SSR_EVAL_TPU_OLA", "padsum")
    assert sp._default_ola_mode() == "padsum"
    monkeypatch.setenv("SSR_EVAL_TPU_OLA", "bogus")
    assert sp._default_ola_mode() == "dus"
