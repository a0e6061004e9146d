"""Audio IO: WAV parser/writer and the FLAC codec (decode validated both on
round-trips and on an independently hand-rolled FIXED+Rice test stream)."""

import numpy as np
import pytest

from ssr_eval_tpu.io.audio import decode_audio, load, read_wav, write_wav, write_flac
from ssr_eval_tpu.io.flac_py import (
    BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _sig(n, seed=0, ch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    x = x.astype(np.float32)
    if ch > 1:
        x = np.stack([x * (0.5 + 0.5 * c) for c in range(ch)], axis=1)
    return x


def test_wav_roundtrip_pcm16(tmp_path):
    x = _sig(12345)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 48000)
    y, sr = read_wav(p)
    assert sr == 48000
    np.testing.assert_allclose(y, np.clip(np.round(x * 32768) / 32768, -1, 1), atol=1e-6)


def test_wav_roundtrip_float(tmp_path):
    x = _sig(4096, ch=2)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 44100, subtype="FLOAT")
    y, sr = read_wav(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_flac_roundtrip_mono(tmp_path):
    x = _sig(10000, seed=1)
    p = str(tmp_path / "c.flac")
    write_flac(p, x, 48000)
    y, sr = decode_audio(p)
    assert sr == 48000
    np.testing.assert_allclose(y, np.clip(np.round(x * 32768) / 32768, -1, 1), atol=1e-6)


def test_flac_roundtrip_stereo(tmp_path):
    x = _sig(5000, seed=2, ch=2)
    p = str(tmp_path / "d.flac")
    write_flac(p, x, 44100)
    y, sr = decode_audio(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, np.clip(np.round(x * 32768) / 32768, -1, 1), atol=1e-6)


def _write_rice(bw, vals, param):
    for v in vals:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
        q, r = u >> param, u & ((1 << param) - 1)
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(r, param)


def _handmade_fixed_flac(path, samples, sr=8000, bps=16, order=2, param=6):
    """Independent encoder: one frame, FIXED(order) subframe, single Rice
    partition — exercises the decoder's prediction + residual paths."""
    n = len(samples)
    bw = BitWriter()
    bw.write(0x664C6143, 32)
    bw.write(0x80, 8)
    bw.write(34, 24)
    bw.write(n, 16)
    bw.write(n, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sr, 20)
    bw.write(0, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)
    stream = bytearray(bw.bytes())

    fw = BitWriter()
    fw.write(0x3FFE, 14)
    fw.write(0, 2)
    fw.write(7, 4)       # 16-bit blocksize follows
    fw.write(0, 4)       # sr from streaminfo
    fw.write(0, 4)       # 1 channel
    fw.write(4, 3)       # 16 bps
    fw.write(0, 1)
    for b in _utf8_number(0):
        fw.write(b, 8)
    fw.write(n - 1, 16)
    fw.align()
    head = fw.bytes()
    head += bytes([_crc8(head)])

    sub = BitWriter()
    sub.write(0, 1)
    sub.write(8 | order, 6)  # FIXED(order)
    sub.write(0, 1)
    x = samples.astype(np.int64)
    for i in range(order):
        sub.write(int(x[i]), bps)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    sub.write(0, 2)   # rice method 0
    sub.write(0, 4)   # partition order 0
    sub.write(param, 4)
    _write_rice(sub, res, param)
    sub.align()
    body = sub.bytes()
    frame = head + body
    crc = _crc16(frame)
    stream += frame + bytes([crc >> 8, crc & 0xFF])
    with open(path, "wb") as f:
        f.write(bytes(stream))


def test_flac_fixed_rice_decode(tmp_path):
    rng = np.random.default_rng(3)
    # Smooth signal so order-2 residuals are small
    t = np.arange(2000) / 8000.0
    x = np.round(3000 * np.sin(2 * np.pi * 200 * t)).astype(np.int64)
    p = str(tmp_path / "fixed.flac")
    _handmade_fixed_flac(p, x, order=2, param=8)
    y, sr = decode_flac(p)
    assert sr == 8000
    np.testing.assert_array_equal(np.round(y * 32768).astype(np.int64), x)


def test_load_resamples(tmp_path):
    x = _sig(48000, seed=5)
    p = str(tmp_path / "e.wav")
    write_wav(p, x, 48000)
    y, sr = load(p, sr=44100)
    assert sr == 44100
    assert abs(len(y) - 44100) <= 1


def test_load_mono_mixdown(tmp_path):
    x = _sig(1000, seed=6, ch=2)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 44100, subtype="FLOAT")
    y, sr = load(p, sr=None)
    np.testing.assert_allclose(y, x.mean(axis=1), atol=1e-6)


def test_wav_pcm24_and_pcm32_read(tmp_path):
    """Hand-built 24-bit and 32-bit PCM RIFF files decode correctly."""
    import struct

    sr = 16000
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], np.int64)

    # 24-bit
    body = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    p24 = str(tmp_path / "t24.wav")
    with open(p24, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(body)) + body)
    x, got_sr = read_wav(p24)
    assert got_sr == sr
    np.testing.assert_allclose(x, vals / (1 << 23), atol=1e-7)

    # 32-bit int
    body32 = np.asarray(vals << 8, dtype="<i4").tobytes()
    p32 = str(tmp_path / "t32.wav")
    with open(p32, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body32)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(body32)) + body32)
    x32, _ = read_wav(p32)
    np.testing.assert_allclose(x32, (vals << 8) / (1 << 31), atol=1e-7)
