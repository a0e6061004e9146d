"""Training data pipeline: HR audio -> (LR mel, HR mel) pairs on device.

The reference never trains (SURVEY §2.1 C13 — lightning is only a base
class), but NVSR-style models are trained on mel pairs produced by the
same degradations the evaluator applies.  This pipeline reuses the
framework's degradation + STFT kernels to synthesize training batches
entirely on device:

    hr wav [B, L] --degrade(random spec)--> lr wav
                  --STFT(2048/441) + mel fbanks--> (mel_lr, mel_hr)

Crops are fixed-size (static shapes), degradation specs are sampled per
batch from the sweep grid, and everything jits once per (crop, spec
family).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.degrade.apply import build_family_degrader, family_key, spec_params
from ssr_eval_tpu.degrade.plan import DegradationSpec
from ssr_eval_tpu.dsp.spectral import stft_magnitude
from ssr_eval_tpu.models.mel import MelScale
from ssr_eval_tpu.models.nvsr import NVSR_STFT


class MelPairPipeline:
    """Degrade-and-melify batches for generator training."""

    def __init__(self, sr=44100, crop_seconds=1.0, n_mels=128, cutoffs=(2000, 4000, 8000, 12000)):
        self.sr = sr
        self.crop = int(crop_seconds * sr)
        self.specs = [
            DegradationSpec(f"train_fft_{c}", "fft", None, 2 * c, 1, sr) for c in cutoffs
        ]
        self.mel = MelScale(n_mels=n_mels, sample_rate=sr, n_stft=NVSR_STFT.n_bins)
        self._fns = {}

    def _batch_fn(self, fkey):
        if fkey in self._fns:
            return self._fns[fkey]
        deg = build_family_degrader(fkey, self.crop)
        mf = NVSR_STFT.max_frames(self.crop)
        mel = self.mel

        @jax.jit
        def run(wav, params):
            # wav: [B, crop] HR audio
            def one(x):
                lr = deg(x, self.crop, params)
                sp_hr = stft_magnitude(x, self.crop, NVSR_STFT, mf, eps=1e-8)
                sp_lr = stft_magnitude(lr, self.crop, NVSR_STFT, mf, eps=1e-8)
                return mel(sp_lr), mel(sp_hr)

            return jax.vmap(one)(wav)

        self._fns[fkey] = run
        return run

    def make_pair(self, wav_batch: np.ndarray, spec_idx: int):
        """wav_batch [B, crop] float32 -> (mel_lr, mel_hr) [B, T, M]."""
        spec = self.specs[spec_idx % len(self.specs)]
        fn = self._batch_fn(family_key(spec))
        return fn(jnp.asarray(wav_batch), spec_params(spec, self.crop))

    def random_crops(self, audios, rng: np.random.Generator, batch: int):
        """Sample fixed-size crops from variable-length host audio."""
        out = np.zeros((batch, self.crop), np.float32)
        for i in range(batch):
            x = audios[rng.integers(len(audios))]
            if len(x) <= self.crop:
                out[i, : len(x)] = x
            else:
                s = rng.integers(len(x) - self.crop)
                out[i] = x[s : s + self.crop]
        return out
