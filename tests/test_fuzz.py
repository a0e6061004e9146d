"""Randomized end-to-end property tests: the engine must match the
float64 oracle pipeline for arbitrary (length, cutoff, rate) combos, and
results must be invariant to batch composition."""

import os

import numpy as np
import pytest
from scipy.signal import resample_poly

import jax.numpy as jnp

from ssr_eval_tpu.degrade.plan import expand_settings
from ssr_eval_tpu.harness.engine import EvalEngine
from ssr_eval_tpu.harness.fixtures import speechlike
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.io.audio import write_wav
from tests.oracles import istft_np, lsd_np, ssim_np, stft_np


NOISE_AMP = 1e-3


def _noise(n, seed=777):
    """Deterministic broadband floor added by the test testee: keeps est
    spectra well above f32 rounding floors in masked bands, so LSD
    agreement is a real correctness probe rather than a floor comparison
    (PARITY.md deviation 4)."""
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def _oracle(x, nat, input_sr, eval_sr, cutoff):
    import math

    x = x.astype(np.float64)
    g1 = math.gcd(nat, input_sr)
    x_in = x if nat == input_sr else resample_poly(x, input_sr // g1, nat // g1)
    g2 = math.gcd(nat, eval_sr)
    tgt = x if nat == eval_sr else resample_poly(x, eval_sr // g2, nat // g2)
    Z = stft_np(x_in, 2048, 441)
    Z[int(1025 * (cutoff / int(input_sr / 2))):, :] = 0.0
    deg = istft_np(Z, 2048, 441, length=len(x_in))
    base = _noise(1 << 17).astype(np.float64)
    idx = np.arange(len(deg)) % base.shape[0]
    deg = deg + NOISE_AMP * base[idx]
    g3 = math.gcd(input_sr, eval_sr)
    est = deg if input_sr == eval_sr else resample_poly(deg, eval_sr // g3, input_sr // g3)
    m = min(len(est), len(tgt))
    hop, n_fft = int(eval_sr / 100), int(2048 / (44100 / eval_sr))
    es = np.abs(stft_np(est[:m], n_fft, hop)).T
    ts = np.abs(stft_np(tgt[:m], n_fft, hop)).T
    return lsd_np(es, ts), ssim_np(es, ts)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_matches_oracle_random_configs(seed, tmp_path):
    rng = np.random.default_rng(seed)
    nat = int(rng.choice([16000, 44100, 48000]))
    input_sr = int(rng.choice([16000, 44100]))
    eval_sr = int(rng.choice([16000, 44100, 48000]))
    cutoff = int(rng.choice([1000, 2000, 4000]))
    cutoff = min(cutoff, input_sr // 4)
    n = int(rng.integers(2, 5))
    lens = rng.integers(int(0.3 * nat), int(0.9 * nat), size=n)

    paths, audio = [], []
    for i, L in enumerate(lens):
        x = speechlike(L / nat, nat, seed=100 * seed + i)[:L]
        p = str(tmp_path / f"u{seed}_{i}.wav")
        write_wav(p, x, nat)
        paths.append(p)
        # decode-equivalent (16-bit quantized) for the oracle
        audio.append(np.clip(np.round(x * 32768) / 32768, -1, 1).astype(np.float32))

    class NoisyTestee(BatchedTestee):
        """Adds a fixed broadband floor (device state) to its input."""

        def device_state(self):
            return jnp.asarray(NOISE_AMP * _noise(1 << 17))

        def infer_batch(self, x, lengths, state=None):
            idx = jnp.arange(x.shape[1]) % state.shape[0]
            mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None]).astype(x.dtype)
            return x + state[idx][None, :] * mask, lengths

    specs = expand_settings(setting_fft={"cutoff_freq": [2 * cutoff]}, sr=input_sr)
    eng = EvalEngine(specs, input_sr, input_sr, eval_sr, NoisyTestee(), batch_size=2)
    r = eng.evaluate_files(paths)

    key = f"proc_fft_{2 * cutoff}_{input_sr}"
    for p, x in zip(paths, audio):
        lsd_ref, ssim_ref = _oracle(x, nat, input_sr, eval_sr, cutoff)
        got = r[p][key]
        cfg = (nat, input_sr, eval_sr, cutoff, len(x))
        assert abs(got["ssim"] - ssim_ref) < 5e-3, (cfg, got["ssim"], ssim_ref)
        assert abs(got["lsd"] - lsd_ref) < max(2e-3 * lsd_ref, 2e-3), (
            cfg, got["lsd"], lsd_ref,
        )


def test_batch_composition_invariance(tmp_path):
    """Same file evaluated alone vs inside a mixed batch: identical."""
    paths = []
    for i, dur in enumerate([0.4, 0.7, 0.9]):
        x = speechlike(dur, 44100, seed=40 + i)
        p = str(tmp_path / f"b{i}.wav")
        write_wav(p, x, 44100)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    eng_all = EvalEngine(specs, 44100, 44100, 44100, BatchedTestee(), batch_size=3)
    eng_one = EvalEngine(specs, 44100, 44100, 44100, BatchedTestee(), batch_size=1)
    r_all = eng_all.evaluate_files(paths)
    for p in paths:
        r_one = eng_one.evaluate_files([p])
        for m in ("lsd", "log_sispec", "sispec", "ssim"):
            a = r_all[p]["proc_fft_8000_44100"][m]
            b = r_one[p]["proc_fft_8000_44100"][m]
            assert abs(a - b) < 1e-5, (p, m, a, b)
