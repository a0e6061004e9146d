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


def test_batch_decode_matches_per_file(native, tmp_path):
    """ONE ssrio_decode_batch call (C++ worker threads) returns exactly
    what per-file decode returns, across mixed lengths, channel counts
    and int16/float paths."""
    paths = []
    for i, (n, ch) in enumerate([(5000, 1), (8000, 2), (3000, 1), (12000, 1)]):
        p = str(tmp_path / f"b{i}.flac")
        native.encode(p, _sig(n, seed=i, ch=ch), 48000)
        paths.append(p)
    batch = native.decode_batch(paths, n_threads=4)
    assert len(batch) == len(paths)
    for p, (xb, srb) in zip(paths, batch):
        x1, sr1 = native.decode_i16(p) or native.decode(p)
        assert srb == sr1
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(x1))


def test_batch_decode_error_names_file(native, tmp_path):
    good = str(tmp_path / "good.flac")
    native.encode(good, _sig(4000), 16000)
    bad = str(tmp_path / "bad.flac")
    open(bad, "wb").write(b"not a flac stream")
    with pytest.raises(ValueError, match="bad.flac"):
        native.decode_batch([good, bad])


def test_engine_native_batch_path_equivalence(native, tmp_path, monkeypatch):
    """The engine's native all-FLAC batch-decode path produces identical
    metrics to the Python thread-pool path."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_flac

    paths = []
    for i in range(5):
        p = str(tmp_path / f"u{i}.flac")
        write_flac(p, speechlike(0.3, 16000, seed=50 + i)[:, None], 16000)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=16000)

    def run():
        eng = EvalEngine(
            specs, input_sr=16000, output_sr=16000, evaluation_sr=16000,
            testee=BatchedTestee(), batch_size=2,
        )
        return eng.evaluate_files(paths)

    monkeypatch.setenv("SSR_EVAL_TPU_NATIVE_BATCH", "1")
    r_native = run()
    monkeypatch.setenv("SSR_EVAL_TPU_NATIVE_BATCH", "0")
    r_python = run()
    for p in paths:
        for key in r_python[p]:
            for m, v in r_python[p][key].items():
                assert r_native[p][key][m] == v, (p, key, m)

def test_batch_decode_wav_formats(native, tmp_path):
    """WAV containers (r4): the native batch decoder must return exactly
    what the Python reader returns for PCM16 mono/stereo, IEEE float32,
    and PCM24 — including the int16 fast path for PCM16."""
    import struct

    from ssr_eval_tpu.io.audio import read_wav, read_wav_i16, write_wav

    if not native.HAS_WAV_BATCH:
        pytest.skip("libssrio built without WAV batch support")
    x = _sig(5000, seed=7)
    paths = []
    p = str(tmp_path / "m16.wav"); write_wav(p, x, 44100); paths.append(p)
    p = str(tmp_path / "s16.wav")
    write_wav(p, np.stack([x, -0.5 * x], 1), 22050); paths.append(p)
    p = str(tmp_path / "f32.wav"); write_wav(p, x, 16000, subtype="FLOAT")
    paths.append(p)
    # PCM24 (no writer helper: hand-rolled container)
    v = np.clip((x * 8388608).astype(np.int64), -8388608, 8388607)
    u = v & 0xFFFFFF
    b = np.zeros((len(v), 3), np.uint8)
    b[:, 0], b[:, 1], b[:, 2] = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
    data = b.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(data))
    p = str(tmp_path / "p24.wav")
    open(p, "wb").write(hdr + data); paths.append(p)

    batch = native.decode_batch(paths, n_threads=2)
    for path, (arr, sr) in zip(paths, batch):
        ref = read_wav_i16(path)
        if ref is not None:
            xr, srr = ref
            assert arr.dtype == np.int16
            np.testing.assert_array_equal(np.asarray(arr), xr)
        else:
            xr, srr = read_wav(path)
            assert arr.dtype == np.float32
            np.testing.assert_allclose(np.asarray(arr), xr, atol=1e-7)
        assert sr == srr, path


def test_engine_native_batch_path_wav_and_mixed(native, tmp_path, monkeypatch):
    """All-WAV and mixed WAV+FLAC corpora ride the native batch decoder
    with metrics identical to the Python pool path."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_flac, write_wav

    if not native.HAS_WAV_BATCH:
        pytest.skip("libssrio built without WAV batch support")
    paths = []
    for i in range(5):
        x = speechlike(0.3, 16000, seed=70 + i)
        if i % 2:
            p = str(tmp_path / f"u{i}.flac")
            write_flac(p, x[:, None], 16000)
        else:
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, x, 16000)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=16000)

    def run():
        eng = EvalEngine(
            specs, input_sr=16000, output_sr=16000, evaluation_sr=16000,
            testee=BatchedTestee(), batch_size=2,
        )
        return eng.evaluate_files(paths), eng

    monkeypatch.setenv("SSR_EVAL_TPU_NATIVE_BATCH", "1")
    r_native, eng_n = run()
    monkeypatch.setenv("SSR_EVAL_TPU_NATIVE_BATCH", "0")
    r_python, _ = run()
    for p in paths:
        for key in r_python[p]:
            for m, v in r_python[p][key].items():
                assert r_native[p][key][m] == v, (p, key, m)
