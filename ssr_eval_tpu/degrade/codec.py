"""MP3 compression degradation — host codec edge (reference eval.py:302-325).

MP3 encode/decode is inherently host-side codec work (SURVEY §2.3); the
reference shells out to sox per file.  Here the preferred backend is the
system LAME library bound in-process (`io/mp3_lame.py` — the same encoder
sox wraps, minus the subprocess + temp-file round trip per utterance),
falling back to sox / ffmpeg CLIs when the library is absent.  The
decode-side alignment (cross-correlation argmax shift, eval.py:319-320)
runs on device via the FFT correlator, and the aligned result is cached
as FLAC next to the source exactly like the reference (eval.py:321).

Without any codec on the machine this raises `CodecUnavailableError` with
a clear message instead of silently corrupting the run (the reference
never checked `os.system` return codes — SURVEY §5 'failure detection').
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

import jax.numpy as jnp

from ssr_eval_tpu.dsp.correlate import align_by_correlation
from ssr_eval_tpu.io.audio import decode_audio, load, write_flac, write_wav


class CodecUnavailableError(RuntimeError):
    pass


# (sr, kbps) combinations LAME has deterministically rejected this
# process — cached so repeated utterances of a doomed spec skip straight
# to the CLI fallback instead of re-paying the failed LAME attempt
# (ADVICE r3 #2).
_lame_rejections: set = set()

# Error-message markers of LAME's deterministic (sr, kbps) rejections, as
# raised by io/mp3_lame.py.  Anything else (allocation failures like
# lame_init/hip_decode_init) is transient and must surface loudly rather
# than silently rerouting to a slower codec.
_REJECTION_MARKERS = ("lame_init_params rejected", "Hz audio for a")


def _cli_backend():
    """CLI codec priority chain (shared by detection and LAME fallback)."""
    if shutil.which("sox"):
        return "sox"
    if shutil.which("ffmpeg"):
        return "ffmpeg"
    return None


def detect_backend():
    from ssr_eval_tpu.io import mp3_lame

    if mp3_lame.available():
        return "lame"
    return _cli_backend()


def _encode_decode_mp3(src_wav: str, kbps: int, backend: str, workdir: str) -> str:
    mp3 = os.path.join(workdir, "enc.mp3")
    out = os.path.join(workdir, "dec.wav")
    if backend == "sox":
        subprocess.run(["sox", src_wav, "-C", str(kbps), mp3], check=True)
        subprocess.run(["sox", mp3, out], check=True)
    elif backend == "ffmpeg":
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i", src_wav, "-b:a", f"{kbps}k", mp3],
            check=True,
        )
        subprocess.run(["ffmpeg", "-y", "-loglevel", "error", "-i", mp3, out], check=True)
    else:
        raise CodecUnavailableError(backend)
    return out


def unify_length(x: np.ndarray, target: np.ndarray):
    """Crop or zero-pad x to len(target) (reference eval.py:292-300)."""
    if x.shape[0] == target.shape[0]:
        return x, target
    if x.shape[0] > target.shape[0]:
        return x[: target.shape[0]], target
    out = np.zeros_like(target)
    out[: x.shape[0]] = x
    return out, target


def mp3_degrade(file: str, x: np.ndarray, sr: int, kbps: int, cache_path: str | None = None):
    """Encode->decode->align one utterance; returns aligned float32 [len(x)].

    Mirrors reference mp3_encoding (eval.py:302-325): round-trip through
    the codec at `kbps`, load at `sr`, unify length against `x`, shift by
    the cross-correlation argmax, optionally cache as FLAC, and assert the
    result differs from the input.
    """
    backend = detect_backend()
    if backend is None:
        raise CodecUnavailableError(
            "MP3 degradation requires a host codec (the LAME library, sox, "
            "or ffmpeg); none was found. Install one or drop "
            "setting_mp3_compression."
        )
    if backend == "lame" and (sr, kbps) in _lame_rejections:
        # Known-doomed combination: skip the LAME attempt entirely.
        backend = _cli_backend()
        if backend is None:
            raise CodecUnavailableError(
                f"LAME failed (rejects sr={sr} kbps={kbps}) and no "
                "sox/ffmpeg CLI is available to fall back to"
            )
    if backend == "lame":
        try:
            from ssr_eval_tpu.io.mp3_lame import decode_mp3, encode_mp3

            # encode_mp3 pins the MP3 rate to sr, so dec_sr == sr always;
            # the guard keeps a library that refuses the pin from
            # corrupting shapes.
            y, dec_sr = decode_mp3(encode_mp3(x, sr, kbps))
            if dec_sr != sr:
                raise RuntimeError(
                    f"LAME produced {dec_sr} Hz audio for a {sr} Hz request"
                )
        except RuntimeError as lame_err:
            # LAME rejects non-MPEG rate / bitrate combinations that the
            # CLI codecs handle by resampling internally — retry there
            # (and cache the per-(sr, kbps) verdict so later utterances
            # skip the doomed attempt).  Transient LAME failures are NOT
            # rejections and re-raise loudly (ADVICE r3 #2).
            if not any(m in str(lame_err) for m in _REJECTION_MARKERS):
                raise
            _lame_rejections.add((sr, kbps))
            backend = _cli_backend()
            if backend is None:
                raise CodecUnavailableError(
                    f"LAME failed ({lame_err}) and no sox/ffmpeg CLI is "
                    "available to fall back to"
                ) from lame_err
    if backend != "lame":  # CLI backends (and test stubs) round-trip via files
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "src.wav")
            write_wav(src, x, sr)
            dec = _encode_decode_mp3(src, kbps, backend, td)
            y, _ = load(dec, sr=sr)
    y, x = unify_length(y.astype(np.float32), x)
    shifted = np.asarray(align_by_correlation(jnp.asarray(y), jnp.asarray(x)))
    if cache_path is not None:
        write_flac(cache_path, shifted[..., None], sr)
    assert shifted.shape == x.shape, str((shifted.shape, x.shape))
    assert float(np.sum(shifted - x)) != 0.0
    return shifted
