"""TPU-native neural vocoder: mel [B, T, 128] -> waveform [B, T*441].

The reference NVSR relies on voicefixer's pretrained 44.1 kHz vocoder
(nvsr_unet.py:84; a pip-only torch package).  This module provides the
framework's native vocoder as a HiFiGAN-style generator whose upsampling
factorizes the 441-sample hop (441 = 7*7*3*3), designed for XLA: big
dilated 1-D convs (MXU-friendly), static shapes, no weight-norm runtime
reparameterization (weights are pre-fused at conversion time).

Weight-porting note (PARITY.md): reproducing the reference's exact 0.84
LSD row additionally requires converting the voicefixer vocoder
checkpoint; `models/convert.py` handles arbitrary torch->flax conv
mappings once that state dict is supplied.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


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
