"""TPU-native neural vocoders: mel [B, T, 128] -> waveform [B, T*441].

The reference NVSR relies on voicefixer's pretrained 44.1 kHz vocoder
(reference examples/NVSR/nvsr_unet.py:84, requirements.txt pins
voicefixer==0.0.17; a pip-only torch package).  Two generators live here:

- `TFGANGenerator` / `Vocoder`: a Flax port of the voicefixer vocoder's
  *structure* — a TFGAN/MelGAN-family generator: weight-normed Conv1d
  prenet, four ConvTranspose1d upsampling stages factorizing the
  441-sample hop (441 = 7*7*3*3, each trimmed to exactly L*r as
  voicefixer's UpsampleNet does), a dilated residual stack after each
  stage, and a tanh'd Conv1d head.  Weight norm is fused at conversion
  time (models/convert.py: vocoder_state_dict_to_flax) so the TPU program
  sees plain convs.  The structure is reconstructed from the voicefixer
  architecture family (the package has no JAX equivalent and its source
  is unavailable offline); channel widths / dilations are config so the
  name map adapts if the real checkpoint's shapes differ — see PARITY.md
  deviation 3.
- `HiFiGANVocoder`: the framework's own native option (HiFiGAN-style MRF
  generator), kept for training-from-scratch use.

Both are XLA-first: big 1-D convs (MXU-friendly), static shapes, no
runtime reparameterization.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class TFGANConfig:
    """voicefixer-structure vocoder hyperparameters (44.1 kHz preset).

    The mel front-end constants follow the tacotron-style normalization
    voicefixer applies before its generator (amp->db, clip to
    [-max_abs, max_abs]); they are data-independent scalars, safe to
    adjust when the real checkpoint's config is inspected.
    """

    n_mels: int = 128
    channels: int = 512
    ratios: Sequence[int] = (7, 7, 3, 3)
    res_dilations: Sequence[int] = (1, 3, 9)
    # Per-upsample-stage output widths; None = halve each stage (the
    # voicefixer/MelGAN convention).  Set when a real checkpoint's widths
    # deviate — convert.infer_vocoder_config fills this from shapes.
    stage_channels: Sequence[int] | None = None
    pre_kernel: int = 7
    post_kernel: int = 7
    res_kernel: int = 3
    leaky: float = 0.2
    # mel normalization (voicefixer vocoder front end)
    min_db: float = -115.0
    max_abs: float = 4.0
    ref_db: float = 20.0

    def stage_width(self, i: int) -> int:
        if self.stage_channels is not None:
            return int(self.stage_channels[i])
        return self.channels >> (i + 1)


def normalize_mel(mel, cfg: TFGANConfig):
    """Linear mel -> normalized generator conditioning (amp->db->[-A, A])."""
    db = 20.0 * jnp.log10(jnp.clip(mel, min=1e-5)) - cfg.ref_db
    s = (2.0 * cfg.max_abs) * ((db - cfg.min_db) / (-cfg.min_db)) - cfg.max_abs
    return jnp.clip(s, -cfg.max_abs, cfg.max_abs)


class TFGANGenerator(nn.Module):
    """Conditioning [B, T, n_mels] -> waveform [B, T * prod(ratios)].

    Module names (`pre`, `up_i`, `res_i_j_d`, `res_i_j_p`, `post`) are the
    contract with convert.vocoder_name_map — the torch Sequential indices
    of the voicefixer generator map onto them 1:1.
    """

    cfg: TFGANConfig = TFGANConfig()
    dtype: object = None  # computation dtype; params stay float32

    @nn.compact
    def __call__(self, cond):
        cfg = self.cfg
        a = cfg.leaky
        x = nn.Conv(cfg.channels, (cfg.pre_kernel,), padding="SAME",
                    dtype=self.dtype, name="pre")(cond)
        for i, r in enumerate(cfg.ratios):
            ch = cfg.stage_width(i)
            x = nn.leaky_relu(x, negative_slope=a)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2) trims
            # r//2 from both ends of the VALID output; UpsampleNet then
            # cuts to exactly L*r.  Together: VALID output[p : p + L*r].
            L = x.shape[1]
            p = r // 2
            x = nn.ConvTranspose(
                ch, (2 * r,), strides=(r,), padding="VALID",
                dtype=self.dtype, name=f"up_{i}",
            )(x)[:, p : p + L * r, :]
            for j, d in enumerate(cfg.res_dilations):
                pd = d * (cfg.res_kernel // 2)
                h = nn.leaky_relu(x, negative_slope=a)
                h = jnp.pad(h, ((0, 0), (pd, pd), (0, 0)), mode="reflect")
                h = nn.Conv(ch, (cfg.res_kernel,), kernel_dilation=(d,),
                            padding="VALID", dtype=self.dtype,
                            name=f"res_{i}_{j}_d")(h)
                h = nn.leaky_relu(h, negative_slope=a)
                h = nn.Conv(ch, (1,), dtype=self.dtype, name=f"res_{i}_{j}_p")(h)
                x = x + h
        x = nn.leaky_relu(x, negative_slope=a)
        x = nn.Conv(1, (cfg.post_kernel,), padding="SAME", dtype=self.dtype,
                    name="post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


class Vocoder(nn.Module):
    """voicefixer-shaped wrapper: linear mel in, waveform out.

    Mirrors voicefixer's `Vocoder.forward` (normalize mel, then the
    generator under the `model` attribute — kept as the flax submodule
    name so converted checkpoints land in the same tree position).
    """

    cfg: TFGANConfig = TFGANConfig()
    dtype: object = None

    @nn.compact
    def __call__(self, mel):
        cond = normalize_mel(mel, self.cfg)
        return TFGANGenerator(self.cfg, dtype=self.dtype, name="model")(cond)


class ResBlock1(nn.Module):
    """HiFiGAN MRF residual block: dilated conv pairs with leaky relu."""

    channels: int
    kernel: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, negative_slope=0.1)
            h = nn.Conv(
                self.channels, (self.kernel,), kernel_dilation=(d,),
                padding="SAME", dtype=self.dtype, name=f"conv1_{i}",
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.1)
            h = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv2_{i}")(h)
            x = x + h
        return x


class HiFiGANVocoder(nn.Module):
    """mel [B, T, n_mels] -> wav [B, T * prod(upsample_rates)]."""

    n_mels: int = 128
    base_channels: int = 512
    upsample_rates: Sequence[int] = (7, 7, 3, 3)
    upsample_kernels: Sequence[int] = (14, 14, 6, 6)
    resblock_kernels: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dtype: object = None  # computation dtype; params stay float32

    @nn.compact
    def __call__(self, mel):
        h = nn.Conv(self.base_channels, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(mel)
        ch = self.base_channels
        for i, (r, k) in enumerate(zip(self.upsample_rates, self.upsample_kernels)):
            ch //= 2
            h = nn.leaky_relu(h, negative_slope=0.1)
            h = nn.ConvTranspose(
                ch, (k,), strides=(r,), padding="SAME", dtype=self.dtype,
                name=f"up_{i}",
            )(h)
            # Multi-receptive-field fusion: mean of parallel resblocks.
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernels, self.resblock_dilations)
            ):
                b = ResBlock1(ch, rk, rd, dtype=self.dtype, name=f"res_{i}_{j}")(h)
                acc = b if acc is None else acc + b
            h = acc / len(self.resblock_kernels)
        h = nn.leaky_relu(h, negative_slope=0.1)
        h = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype, name="conv_post")(h)
        return jnp.tanh(h.astype(jnp.float32))[..., 0]
