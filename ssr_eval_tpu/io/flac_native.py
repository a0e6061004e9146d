"""ctypes binding to the native ssrio library (native/ssrio.cpp).

Build with `make -C native` (or `python -m ssr_eval_tpu.io.build_native`);
if the shared library is absent or fails to load, importing this module
raises and ssr_eval_tpu.io.audio silently falls back to the pure-Python
codec.  Decode releases the GIL inside the C call, so the engine's decode
thread pool gets real parallelism.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libssrio.so")

_lib = ctypes.CDLL(_LIB_PATH)

_lib.ssrio_decode_flac.restype = ctypes.c_int
_lib.ssrio_decode_flac.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
]
_lib.ssrio_encode_flac.restype = ctypes.c_int
_lib.ssrio_encode_flac.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
]
_lib.ssrio_decode_flac_i16.restype = ctypes.c_int
_lib.ssrio_decode_flac_i16.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
]
_lib.ssrio_free.restype = None
_lib.ssrio_free.argtypes = [ctypes.c_void_p]
# Optional symbol: a libssrio.so built before the batch API must not
# break the per-file fast paths — only decode_batch degrades.
HAS_BATCH = hasattr(_lib, "ssrio_decode_batch")
# WAV batch decode arrived later still (r4); a FLAC-only .so keeps
# serving FLAC batches while WAV corpora fall back to the Python pool.
HAS_WAV_BATCH = HAS_BATCH and hasattr(_lib, "ssrio_batch_wav_supported")
if HAS_BATCH:
    _lib.ssrio_decode_batch.restype = ctypes.c_int
    _lib.ssrio_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]


def decode(path: str):
    """-> (float32 [n] or [n, ch] in [-1, 1], sample_rate)."""
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = _lib.ssrio_decode_flac(
        path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr)
    )
    if rc != 0:
        raise ValueError(f"ssrio: FLAC decode failed for {path} (rc={rc})")
    try:
        count = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        _lib.ssrio_free(out)
    if ch.value > 1:
        arr = arr.reshape(-1, ch.value)
    return arr, sr.value


def decode_i16(path: str):
    """16-bit fast path: -> (int16 [n] or [n, ch], sample_rate), or None
    when the stream is not 16-bit (caller falls back to float decode)."""
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = _lib.ssrio_decode_flac_i16(
        path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr)
    )
    if rc == -8:
        return None
    if rc != 0:
        raise ValueError(f"ssrio: FLAC decode failed for {path} (rc={rc})")
    try:
        count = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        _lib.ssrio_free(out)
    if ch.value > 1:
        arr = arr.reshape(-1, ch.value)
    return arr, sr.value


def decode_batch(paths, n_threads: int = 0):
    """Decode many FLAC files in ONE native call with C++ worker threads
    (no per-file Python/GIL round trips).

    -> list of (array, sample_rate) — int16 for 16-bit streams, float32
    otherwise, [n] mono or [n, ch]; a failed file raises ValueError
    naming it.  n_threads=0 uses the hardware concurrency."""
    if not HAS_BATCH:
        raise RuntimeError(
            "libssrio.so predates ssrio_decode_batch; rebuild with "
            "`make -C native`"
        )
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.c_void_p * n)()
    lens = (ctypes.c_int64 * n)()
    chans = (ctypes.c_int * n)()
    srs = (ctypes.c_int * n)()
    kinds = (ctypes.c_int * n)()
    _lib.ssrio_decode_batch(c_paths, n, int(n_threads), outs, lens, chans, srs, kinds)
    results = []
    try:
        for i in range(n):
            if kinds[i] < 0:
                raise ValueError(
                    f"ssrio: FLAC decode failed for {paths[i]} (rc={kinds[i]})"
                )
            count = lens[i] * chans[i]
            ctype = ctypes.c_int16 if kinds[i] == 0 else ctypes.c_float
            ptr = ctypes.cast(outs[i], ctypes.POINTER(ctype))
            arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
            if chans[i] > 1:
                arr = arr.reshape(-1, chans[i])
            results.append((arr, srs[i]))
    finally:
        for i in range(n):
            if outs[i]:
                _lib.ssrio_free(outs[i])
    return results


def encode(path: str, data: np.ndarray, sr: int, bps: int = 16):
    data = np.ascontiguousarray(data, dtype=np.float32)
    if data.ndim == 1:
        n, ch = data.shape[0], 1
    else:
        n, ch = data.shape
    rc = _lib.ssrio_encode_flac(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ch,
        int(sr),
        bps,
    )
    if rc != 0:
        raise ValueError(f"ssrio: FLAC encode failed for {path} (rc={rc})")
