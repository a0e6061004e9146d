"""NVSR — mel-domain speech super-resolution (reference examples/NVSR/
nvsr_unet.py) as Flax modules over the framework's own DSP.

Pipeline (reference nvsr_unet.py:71-127, main.py:96-109):
    wav --STFT(2048/441, eps 1e-8)--> |sp| --mel fbanks--> mel
    mel --Generator: analysis(to_log(mel)) + to_log(mel)--> log-mel
    from_log --> vocoder --> wav, trim_center to input length

Generator variants match the reference's registry (nvsr_unet.py:185-236):
'unet' / 'unet_small' (the 99M UNetRes), 'bigru' (BN -> Linear -> 2-layer
BiGRU -> MLP head), 'dnn' (MLP stack with BN).  to_log clips at 1e-8 and
from_log clips the exponent at +5 (nvsr_unet.py:130-139).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ssr_eval_tpu.dsp.spectral import StftConfig, stft_magnitude
from ssr_eval_tpu.models.mel import MelScale
from ssr_eval_tpu.models.unet import UNetRes
from ssr_eval_tpu.models.vocoder import HiFiGANVocoder, TFGANConfig, Vocoder

NVSR_STFT = StftConfig(n_fft=2048, hop=441)


def to_log(x):
    return jnp.log10(jnp.clip(x, min=1e-8))


def from_log(x):
    return jnp.power(10.0, jnp.clip(x, max=5.0))


class BNGRU(nn.Module):
    """BatchNorm over a single pseudo-channel + stacked bidirectional GRU
    (reference nvsr_unet.py:18-58)."""

    hidden: int
    layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, F]
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="bn")(
            x[..., None]
        )[..., 0]
        for l in range(self.layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden), name=f"gru_fwd_{l}")
            bwd = nn.RNN(nn.GRUCell(self.hidden), name=f"gru_bwd_{l}")
            a = fwd(h)
            b = jnp.flip(bwd(jnp.flip(h, axis=1)), axis=1)
            h = jnp.concatenate([a, b], axis=-1)
        return h


class Generator(nn.Module):
    """Residual-in-log-mel-space generator (nvsr_unet.py:185-236)."""

    model_name: str = "unet"
    n_mels: int = 128
    dtype: object = None  # computation dtype; params stay float32
    fold_bn: bool = False  # inference-only folded form (models/fold_bn.py)

    @nn.compact
    def __call__(self, mel_orig, train: bool = False):
        # mel_orig: [B, T, M] linear-scale mel
        if self.fold_bn and train:
            raise ValueError("fold_bn is an inference-only transform")
        log_mel = to_log(mel_orig)
        if self.model_name in ("unet", "unet_small"):
            # unet_small's blocks are structurally identical in the
            # reference (components/unet_small.py is a class-rename of
            # unet.py); both use the 4-block residual groups.
            out = UNetRes(channels=1, dtype=self.dtype, fold_bn=self.fold_bn,
                          name="analysis_module")(
                log_mel[..., None], train
            )["mel"][..., 0]
        elif self.model_name == "bigru":
            m = self.n_mels
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="bn0")(
                log_mel[..., None]
            )[..., 0]
            h = nn.Dense(m * 2, name="linear_in")(h)
            h = BNGRU(m * 2, layers=2, name="bngru")(h, train)
            h = nn.relu(h)
            h = nn.Dense(m * 2, name="linear_mid")(h)
            h = nn.relu(h)
            out = nn.Dense(m, name="linear_out")(h)
        elif self.model_name == "dnn":
            m = self.n_mels
            h = log_mel
            for i, width in enumerate((m * 2, m * 4, m * 4)):
                h = nn.Dense(width, name=f"dense_{i}")(h)
                h = nn.relu(h)
                # bn_i sits directly before dense_{i+1} (relu is BEFORE
                # it), so with fold_bn its scalar affine lives inside the
                # next Dense's kernel/bias (models/fold_bn.py).
                if not self.fold_bn:
                    h = nn.BatchNorm(
                        use_running_average=not train, momentum=0.99,
                        name=f"bn_{i}"
                    )(h[..., None])[..., 0]
            h = nn.Dense(m * 2, name="dense_3")(h)
            h = nn.relu(h)
            out = nn.Dense(m, name="dense_4")(h)
        else:
            raise ValueError(f"unknown generator {self.model_name!r}")
        return {"mel": out + log_mel}


class NVSR(nn.Module):
    """Full NVSR: generator + native vocoder; `pre` maps wav -> mel."""

    model_name: str = "unet"
    n_mels: int = 128
    sample_rate: int = 44100
    dtype: object = None  # model computation dtype (e.g. jnp.bfloat16)
    # "tfgan": voicefixer-structure vocoder (reference parity, converted
    # checkpoints land here); "hifigan": the framework's native generator.
    vocoder_name: str = "tfgan"
    # Explicit tfgan hyperparameters; None -> the 44.1 kHz preset.  Set
    # (e.g. via convert.infer_vocoder_config) when grafting a checkpoint
    # whose shapes differ from the reconstruction.
    vocoder_cfg: TFGANConfig | None = None
    # Inference-only BN-folded generator (models/fold_bn.py transforms an
    # unfolded variables tree into this module's shape).
    fold_bn: bool = False

    def setup(self):
        if self.fold_bn and self.model_name == "bigru":
            raise ValueError(
                "fold_bn supports the unet/unet_small/dnn generators "
                "(bigru's BNs feed recurrent cells; fold unimplemented)"
            )
        self.generator = Generator(self.model_name, self.n_mels,
                                   dtype=self.dtype, fold_bn=self.fold_bn)
        if self.vocoder_name == "tfgan":
            cfg = self.vocoder_cfg or TFGANConfig(n_mels=self.n_mels)
            self.vocoder = Vocoder(cfg, dtype=self.dtype)
        elif self.vocoder_name == "hifigan":
            self.vocoder = HiFiGANVocoder(n_mels=self.n_mels, dtype=self.dtype)
        else:
            raise ValueError(f"unknown vocoder {self.vocoder_name!r}")
        self._mel = MelScale(
            n_mels=self.n_mels, sample_rate=self.sample_rate, n_stft=NVSR_STFT.n_bins
        )

    def pre(self, wav, length, max_frames):
        """wav [Lmax] (true `length`) -> (sp [T,F], mel [T,M]).

        Magnitude floor matches FDomainHelper's eps=1e-8 power clamp
        (reference dsp.py:72-74 via :83-105)."""
        sp = stft_magnitude(wav, length, NVSR_STFT, max_frames, eps=1e-8)
        mel = self._mel(sp)
        return sp, mel

    def __call__(self, mel_orig, train: bool = False):
        return self.generator(mel_orig, train)

    def synthesize(self, log_mel):
        """Denoised log-mel [B, T, M] -> waveform [B, T*hop]."""
        return self.vocoder(from_log(log_mel))

    def init_all(self, mel_orig, train: bool = False):
        """Trace both generator and vocoder so `init` creates every param."""
        out = self.generator(mel_orig, train)
        return self.vocoder(from_log(out["mel"]))


def trim_center(est, ref_len):
    """Center-trim est [L] to ref_len (reference main.py:22-35).

    Static-shape variant: est's length is compile-time; ref_len may be
    traced.  One traced-offset dynamic slice (a full-length take here is
    a gather — ~20 ms per 8x266k batch on TPU), then a mask to ref_len."""
    L = est.shape[-1]
    diff = L - ref_len
    start = jnp.where(diff > 0, diff // 2, 0)
    rolled = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([est, jnp.zeros_like(est)], axis=-1), start, L, axis=-1
    )
    mask = jnp.arange(L) < ref_len
    return jnp.where(mask, rolled, 0.0)


# Reference-name alias (nvsr_unet.py:18 exposes BN_GRU).
BN_GRU = BNGRU


def get_n_params(model_or_variables):
    """Total parameter count (reference nvsr_unet.py:61-68 counts torch
    params; here: leaves of a flax variables tree, or of its 'params'
    collection when given full variables)."""
    tree = model_or_variables
    if isinstance(tree, dict) and "params" in tree:
        tree = tree["params"]
    return int(
        sum(np.prod(np.asarray(l).shape) for l in jax.tree_util.tree_leaves(tree))
    )
