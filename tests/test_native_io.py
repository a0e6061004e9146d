"""Native C++ codec (ssrio) cross-validated against the pure-Python codec:
each decodes what the other encodes, plus self round-trips."""

import os
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def native():
    lib = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ssr_eval_tpu", "io", "libssrio.so",
    )
    if not os.path.exists(lib):
        rc = subprocess.call(["make", "-C", NATIVE])
        if rc != 0:
            pytest.skip("native toolchain unavailable")
    from ssr_eval_tpu.io import flac_native

    return flac_native


def _sig(n, seed=0, ch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(n)).astype(
        np.float32
    )
    if ch > 1:
        x = np.stack([x, 0.5 * x], axis=1)
    return x


def _q16(x):
    return np.clip(np.round(x * 32768) / 32768, -1, 1).astype(np.float32)


def test_native_roundtrip_mono(native, tmp_path):
    x = _sig(20000, seed=1)
    p = str(tmp_path / "n.flac")
    native.encode(p, x, 48000)
    y, sr = native.decode(p)
    assert sr == 48000
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)


def test_native_roundtrip_stereo(native, tmp_path):
    x = _sig(9000, seed=2, ch=2)
    p = str(tmp_path / "s.flac")
    native.encode(p, x, 44100)
    y, sr = native.decode(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)


def test_python_decodes_native_encoding(native, tmp_path):
    from ssr_eval_tpu.io.flac_py import decode_flac

    x = _sig(15000, seed=3)
    p = str(tmp_path / "x.flac")
    native.encode(p, x, 48000)
    y, sr = decode_flac(p)
    assert sr == 48000
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)


def test_native_decodes_python_encoding(native, tmp_path):
    from ssr_eval_tpu.io.flac_py import encode_flac

    x = _sig(12345, seed=4)
    p = str(tmp_path / "y.flac")
    encode_flac(p, x, 44100)
    y, sr = native.decode(p)
    assert sr == 44100
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)


def test_native_compresses(native, tmp_path):
    """Fixed-predictor + Rice must beat verbatim on tonal audio."""
    x = _sig(48000, seed=5)
    p = str(tmp_path / "c.flac")
    native.encode(p, x, 48000)
    raw_bytes = 2 * len(x)
    assert os.path.getsize(p) < 0.9 * raw_bytes


def test_native_handles_noise_escape(native, tmp_path):
    """Full-scale noise triggers the verbatim fallback; still decodable."""
    rng = np.random.default_rng(6)
    x = (rng.uniform(-1, 1, 5000)).astype(np.float32)
    p = str(tmp_path / "noise.flac")
    native.encode(p, x, 16000)
    y, sr = native.decode(p)
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)


def test_audio_entry_prefers_native(native, tmp_path):
    from ssr_eval_tpu.io.audio import decode_audio, write_flac

    x = _sig(8000, seed=7)
    p = str(tmp_path / "e.flac")
    write_flac(p, x, 48000)
    y, sr = decode_audio(p)
    np.testing.assert_allclose(y, _q16(x), atol=1e-6)
