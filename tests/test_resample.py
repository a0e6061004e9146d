"""Polyphase-matmul resampler vs. scipy.signal.resample_poly (the engine
behind the reference's subsampling degradation, lowpass.py:134-144, and
librosa's res_type='polyphase' at eval.py:144-150)."""

import numpy as np
import pytest
from scipy.signal import resample_poly as scipy_resample_poly

import jax.numpy as jnp

from ssr_eval_tpu.dsp.resample import apply_resample, resample_poly_plan


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 9000 * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)


PAIRS = [
    (48000, 44100),   # GT load path (sox replacement)
    (44100, 48000),   # output -> evaluation rate
    (44100, 8000),    # subsampling down
    (8000, 44100),    # subsampling up
    (44100, 16000),
    (22050, 44100),
]


@pytest.mark.parametrize("sr_in,sr_out", PAIRS)
def test_resample_matches_scipy(sr_in, sr_out):
    L = 20000
    x = _sig(L)
    plan = resample_poly_plan(sr_in, sr_out, L)
    ref = scipy_resample_poly(x.astype(np.float64), plan.up, plan.down)
    out_len = int(plan.out_length(L))
    assert out_len == len(ref)

    Wd = jnp.asarray(plan.Wd)
    y, n_valid = apply_resample(jnp.asarray(x), L, plan, out_len, Wd)
    assert int(n_valid) == len(ref)
    scale = np.abs(ref).max()
    err = np.abs(np.asarray(y) - ref).max() / scale
    assert err < 5e-6, f"{sr_in}->{sr_out}: rel err {err:.2e}"


def test_resample_bucketed_matches_exact():
    """Signal in a zero-padded bucket: the valid prefix is bit-comparable
    to scipy on the tight signal (upfirdn implicit zero padding)."""
    sr_in, sr_out = 44100, 48000
    L, Lmax = 17501, 32768
    x = _sig(L, seed=2)
    plan = resample_poly_plan(sr_in, sr_out, Lmax)
    out_len = int(plan.out_length(Lmax))
    xb = np.zeros(Lmax, dtype=np.float32)
    xb[:L] = x
    Wd = jnp.asarray(plan.Wd)
    y, n_valid = apply_resample(jnp.asarray(xb), L, plan, out_len, Wd)
    ref = scipy_resample_poly(x.astype(np.float64), plan.up, plan.down)
    nv = int(n_valid)
    assert nv == len(ref)
    np.testing.assert_allclose(np.asarray(y)[:nv], ref, atol=5e-6 * np.abs(ref).max())
    assert np.abs(np.asarray(y)[nv:]).max() == 0.0


def test_identity_rate():
    plan = resample_poly_plan(44100, 44100, 1000)
    x = _sig(1000)
    y, n = apply_resample(jnp.asarray(x), 1000, plan, 1000, jnp.asarray(plan.Wd))
    np.testing.assert_array_equal(np.asarray(y), x)
    assert int(n) == 1000


def test_round_trip_subsampling():
    """Down-then-up (the reference 'subsampling' degradation) length math."""
    L = 12000
    x = _sig(L, seed=7)
    for low_sr in [4000, 8000, 16000]:
        p1 = resample_poly_plan(44100, low_sr, L)
        o1 = int(p1.out_length(L))
        y1, n1 = apply_resample(jnp.asarray(x), L, p1, o1, jnp.asarray(p1.Wd))
        p2 = resample_poly_plan(low_sr, 44100, o1)
        o2 = int(p2.out_length(o1))
        y2, n2 = apply_resample(y1, n1, p2, o2, jnp.asarray(p2.Wd))
        ref1 = scipy_resample_poly(x.astype(np.float64), p1.up, p1.down)
        ref2 = scipy_resample_poly(ref1, p2.up, p2.down)
        nv = int(n2)
        assert nv == len(ref2)
        assert np.abs(np.asarray(y2)[:nv] - ref2).max() / np.abs(ref2).max() < 1e-5


def test_windowed_sinc_plan_properties():
    """kaiser_best-parameterized bank: unit DC gain per phase (up to
    rolloff droop), linearity, and exact output-length math."""
    from ssr_eval_tpu.dsp.resample import windowed_sinc_plan

    plan = windowed_sinc_plan(48000, 44100, 20000)
    assert plan.up == 147 and plan.down == 160
    # passband: resampling a pure DC signal must preserve it closely
    L = 20000
    x = np.ones(L, np.float32)
    out_len = int(plan.out_length(L))
    y, n = apply_resample(jnp.asarray(x), L, plan, out_len, jnp.asarray(plan.Wd))
    mid = np.asarray(y)[200 : int(n) - 200]
    np.testing.assert_allclose(mid, 1.0, atol=5e-4)


def test_windowed_sinc_tone_preservation():
    """A mid-band tone survives 48k->44.1k with the right frequency."""
    from ssr_eval_tpu.dsp.resample import windowed_sinc_plan

    L = 48000
    t = np.arange(L) / 48000.0
    f0 = 3000.0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    plan = windowed_sinc_plan(48000, 44100, L)
    out_len = int(plan.out_length(L))
    y, n = apply_resample(jnp.asarray(x), L, plan, out_len, jnp.asarray(plan.Wd))
    y = np.asarray(y)[500 : int(n) - 500]
    t2 = (np.arange(len(y)) + 500) / 44100.0
    ref = np.sin(2 * np.pi * f0 * t2)
    assert np.abs(y - ref).max() < 2e-3


def test_windowed_sinc_matches_scipy_closely():
    """Both high-quality designs agree in the passband (sanity cross-check
    between two independent filter constructions)."""
    from ssr_eval_tpu.dsp.resample import windowed_sinc_plan
    from scipy.signal import resample_poly as scipy_rp

    L = 24000
    # in-passband content only: the two designs legitimately differ in
    # their transition bands, so broadband noise is out of scope here.
    t = np.arange(L) / 48000.0
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 5000 * t + 1.0)
        + 0.2 * np.sin(2 * np.pi * 12000 * t + 2.0)
    ).astype(np.float32)
    plan = windowed_sinc_plan(48000, 44100, L)
    out_len = int(plan.out_length(L))
    y, n = apply_resample(jnp.asarray(x), L, plan, out_len, jnp.asarray(plan.Wd))
    ref = scipy_rp(x.astype(np.float64), 147, 160)
    nv = min(int(n), len(ref))
    a, b = 2000, nv - 2000
    err = np.abs(np.asarray(y)[a:b] - ref[a:b]).max() / np.abs(ref).max()
    assert err < 2e-3, err
