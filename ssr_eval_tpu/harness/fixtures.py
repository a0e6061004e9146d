"""Offline synthetic stand-in for the VCTK 8-speaker test set.

The reference auto-downloads `vctk_test_48k.tar` from Zenodo
(eval.py:102-119); in zero-egress environments we synthesize a set with
the same layout — speakers {p360, p361, p362, p363, p364, p374, p376, s5},
48 kHz FLAC files named `<speaker>_<idx>_mic1.flac` — from deterministic
speech-like signals (pitch-contoured harmonic stacks + filtered noise).
Used by tests and bench.py; real-VCTK runs work unchanged when the tar is
available.
"""

from __future__ import annotations

import os

import numpy as np

SPEAKERS = ["p360", "p361", "p362", "p363", "p364", "p374", "p376", "s5"]


def speechlike(duration_s: float, sr: int, seed: int) -> np.ndarray:
    """Deterministic speech-like signal: voiced harmonic stack with a
    wandering f0 and spectral tilt, plus breathy high-band noise."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n) / sr
    f0 = 120.0 + 40.0 * np.sin(2 * np.pi * (0.7 + 0.3 * rng.random()) * t) + 20 * rng.random()
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros(n)
    for h in range(1, 40):
        # ~ -6 dB/oct tilt with formant-ish bumps
        amp = 1.0 / h
        for fc, bw, g in ((500, 120, 2.0), (1500, 200, 1.2), (2500, 300, 0.8)):
            fh = h * np.mean(f0)
            amp *= 1.0 + g * np.exp(-0.5 * ((fh - fc) / bw) ** 2)
        x += amp * np.sin(h * phase + rng.random() * 6.28)
    # breath noise shaped toward high band
    noise = rng.standard_normal(n)
    noise = np.diff(noise, prepend=0.0)  # +6dB/oct
    x = x / np.abs(x).max() * 0.6 + 0.01 * noise / max(1e-9, np.abs(noise).max())
    # amplitude envelope with syllabic modulation
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t + rng.random() * 6.28)
    x = (x * env).astype(np.float32)
    return np.clip(x, -0.99, 0.99)


def ensure_synthetic_vctk(
    root: str,
    files_per_speaker: int = 2,
    sr: int = 48000,
    min_s: float = 0.6,
    max_s: float = 1.4,
) -> str:
    """Create the synthetic set under `root` if absent; returns `root`."""
    from ssr_eval_tpu.io.audio import write_flac

    if os.path.isdir(os.path.join(root, "s5")):
        return root
    os.makedirs(root, exist_ok=True)
    for si, spk in enumerate(SPEAKERS):
        d = os.path.join(root, spk)
        os.makedirs(d, exist_ok=True)
        for fi in range(files_per_speaker):
            seed = si * 1000 + fi
            dur = min_s + (max_s - min_s) * ((seed * 2654435761 % 97) / 96.0)
            x = speechlike(dur, sr, seed)
            write_flac(os.path.join(d, f"{spk}_{fi:03d}_mic1.flac"), x, sr)
    return root
