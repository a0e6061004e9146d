"""Zero-phase IIR kernel vs. scipy.signal.sosfiltfilt (the reference's
engine at lowpass.py:125), including the bucketed dynamic-length path."""

import numpy as np
import pytest
from scipy.signal import sosfiltfilt as scipy_sosfiltfilt

import jax.numpy as jnp

from ssr_eval_tpu.dsp.filters import (
    design_lowpass_sos,
    make_filtfilt_plan,
    plan_device_arrays,
    sosfiltfilt,
)


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    x = (
        0.4 * np.sin(2 * np.pi * 300 * t)
        + 0.3 * np.sin(2 * np.pi * 5000 * t + 1.0)
        + 0.2 * np.sin(2 * np.pi * 15000 * t + 2.0)
        + 0.02 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


CASES = [
    ("butter", 8, 2000.0),
    ("butter", 2, 12000.0),
    ("cheby1", 8, 4000.0),
    ("cheby2", 6, 8000.0),
    ("ellip", 10, 6000.0),
    ("bessel", 5, 1000.0),
]


@pytest.mark.parametrize("ftype,order,highcut", CASES)
def test_sosfiltfilt_matches_scipy(ftype, order, highcut):
    fs = 44100
    L = 30000
    x = _sig(L)
    sos = design_lowpass_sos(ftype, order, highcut, fs)
    ref = scipy_sosfiltfilt(sos, x.astype(np.float64))

    plan = make_filtfilt_plan(sos, L)
    H, r = plan_device_arrays(plan)
    got = np.asarray(sosfiltfilt(jnp.asarray(x), L, plan, H, r))

    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / scale
    assert err < 5e-5, f"{ftype} o{order} fc{highcut}: rel err {err:.2e}"


def test_sosfiltfilt_bucketed_matches_exact_length():
    """Zero-padded bucket + traced length == tight-buffer result."""
    fs = 44100
    L, Lmax = 20011, 32768
    x = _sig(L, seed=3)
    sos = design_lowpass_sos("cheby1", 8, 4000.0, fs)

    plan_max = make_filtfilt_plan(sos, Lmax)
    H, r = plan_device_arrays(plan_max)
    xb = np.zeros(Lmax, dtype=np.float32)
    xb[:L] = x
    got_bucket = np.asarray(sosfiltfilt(jnp.asarray(xb), L, plan_max, H, r))

    ref = scipy_sosfiltfilt(sos, x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got_bucket[:L] - ref).max() / scale < 5e-5
    assert np.abs(got_bucket[L:]).max() == 0.0


def test_order_sweep_stability():
    """All orders in the reference's clamp range [2, 10] stay accurate."""
    fs = 44100
    L = 16384
    x = _sig(L, seed=5)
    for order in [2, 4, 6, 8, 10]:
        sos = design_lowpass_sos("butter", order, 4000.0, fs)
        plan = make_filtfilt_plan(sos, L)
        H, r = plan_device_arrays(plan)
        got = np.asarray(sosfiltfilt(jnp.asarray(x), L, plan, H, r))
        ref = scipy_sosfiltfilt(sos, x.astype(np.float64))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4, order


@pytest.mark.parametrize(
    "ftype,order,highcut",
    [
        ("butter", 8, 2000.0),
        ("cheby1", 10, 1000.0),   # slow decay -> 4096 block
        ("ellip", 10, 1000.0),    # slowest sweep design -> 16384 block
        ("butter", 2, 12000.0),   # tiny response -> block floor
    ],
)
def test_sosfiltfilt_blocked_matches_scipy(ftype, order, highcut):
    """Overlap-save block convolution == scipy sosfiltfilt, bucketed
    traced-length path (the engine's IIR fast path)."""
    import jax

    from ssr_eval_tpu.dsp.filters import (
        blocked_plan_arrays,
        response_len,
        sosfiltfilt_blocked,
    )

    fs = 44100
    L, Lmax = 30011, 32768
    x = _sig(L, seed=7)
    xb = np.zeros(Lmax, dtype=np.float32)
    xb[:L] = x
    sos = design_lowpass_sos(ftype, order, highcut, fs)
    m = response_len(sos)
    block = max(1 << (m - 1).bit_length(), 512)
    plan = make_filtfilt_plan(sos, Lmax, edge_max=64)
    (Hr, Hi), r = blocked_plan_arrays(plan, block)
    got = np.asarray(
        jax.jit(
            lambda xb, n: sosfiltfilt_blocked(
                xb, n, plan.edge, (jnp.asarray(Hr), jnp.asarray(Hi)),
                jnp.asarray(r), block, 64,
            )
        )(jnp.asarray(xb), L)
    )
    ref = scipy_sosfiltfilt(sos, x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got[:L] - ref).max() / scale < 5e-5, (ftype, order)
    assert np.abs(got[L:]).max() == 0.0


def test_iir_family_key_buckets_by_block():
    """Specs whose truncated responses fit the same block share a compiled
    program; slow-decay designs get their own bucket."""
    from ssr_eval_tpu.degrade.apply import family_key
    from ssr_eval_tpu.degrade.plan import expand_settings

    specs = expand_settings(
        setting_lowpass_filtering={
            "filter": ["butter", "ellip"],
            "cutoff_freq": [2000, 16000],
            "filter_order": [8],
        },
        sr=44100,
    )
    keys = {s.key: family_key(s) for s in specs}
    assert all(k[0] == "iir" and isinstance(k[1], int) for k in keys.values())
    # butter@16k (m~100) and ellip@1k-cutoff (m~3700) must not share a key.
    blocks = sorted({k[1] for k in keys.values()})
    assert len(blocks) >= 2, keys


def test_bandpass_matches_scipy():
    """bandpass() public entry vs scipy sosfiltfilt band design
    (reference lowpass.py:54-91,199-256)."""
    from scipy.signal import sosfiltfilt as scipy_sff

    from ssr_eval_tpu.degrade.lowpass import bandpass
    from ssr_eval_tpu.dsp.filters import design_bandpass_sos

    L = 20000
    x = _sig(L, seed=12)
    got = bandpass(x, 1000, 6000, 44100, order=4, _type="butter")
    sos = design_bandpass_sos("butter", 4, 1000, 6000, 44100)
    ref = scipy_sff(sos, x.astype(np.float64))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-4


def test_profiler_trace_hook(tmp_path):
    """device_trace writes a profile when a directory is set."""
    import os

    import jax.numpy as jnp

    from ssr_eval_tpu.utils.profiling import device_trace

    d = str(tmp_path / "prof")
    with device_trace(d):
        jnp.sum(jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"
