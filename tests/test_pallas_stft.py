"""Fused Pallas CT spectrogram kernel vs. the NumPy oracle (interpreter
mode on the CPU test platform; the same kernel compiles natively on TPU).
The dense-DFT Pallas variant was retired in r4 (VERDICT r3 #6) — the CT
kernel is the sole remaining Pallas experiment."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssr_eval_tpu.dsp.spectral import StftConfig, _extend, hann_window
from tests.oracles import stft_np


def test_fused_ct_matches_oracle_via_stft_config():
    """Through the same _extend framing the engine uses (2048/441)."""
    from ssr_eval_tpu.dsp.pallas_stft import fused_ct_stft_magnitude

    cfg = StftConfig(n_fft=2048, hop=441)
    L = 30000
    rng = np.random.default_rng(0)
    t = np.arange(L) / 44100.0
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 9000 * t)
        + 0.02 * rng.standard_normal(L)
    ).astype(np.float32)
    mf = cfg.max_frames(L)
    ext = _extend(jnp.asarray(x), L, cfg.pad)
    got = np.asarray(
        fused_ct_stft_magnitude(
            ext, cfg.n_fft, cfg.hop, mf, hann_window(cfg.win), interpret=True
        )
    )
    ref = np.abs(stft_np(x.astype(np.float64), cfg.n_fft, cfg.hop)).T
    nf = ref.shape[0]
    scale = ref.max()
    assert np.abs(got[:nf] - ref).max() / scale < 5e-4


def test_fused_ct_kernel_matches_oracle():
    """The VMEM-resident Cooley-Tukey Pallas kernel (interpret mode on
    CPU) matches the float64 rFFT magnitude."""
    import numpy as np
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.pallas_stft import fused_ct_stft_magnitude
    from ssr_eval_tpu.dsp.spectral import hann_window

    n_fft, hop, mf = 2048, 441, 9
    rng = np.random.default_rng(5)
    ext = rng.standard_normal((mf - 1) * hop + n_fft).astype(np.float32)
    win = hann_window(n_fft)
    got = np.asarray(
        fused_ct_stft_magnitude(jnp.asarray(ext), n_fft, hop, mf, win, interpret=True)
    )
    fr = np.stack([ext[i * hop : i * hop + n_fft] for i in range(mf)])
    ref = np.abs(np.fft.rfft(fr * win, axis=-1))
    assert got.shape == (mf, n_fft // 2 + 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_mode_selection(monkeypatch):
    from ssr_eval_tpu.dsp.spectral import _pallas_stft_mode

    monkeypatch.delenv("SSR_EVAL_TPU_PALLAS", raising=False)
    assert _pallas_stft_mode() == ""
    monkeypatch.setenv("SSR_EVAL_TPU_PALLAS", "1")
    assert _pallas_stft_mode() == "ct"  # any truthy value -> the CT kernel
    monkeypatch.setenv("SSR_EVAL_TPU_PALLAS", "ct")
    assert _pallas_stft_mode() == "ct"
