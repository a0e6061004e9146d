"""Flax re-design of the NVSR analysis UNet (99 M params).

Architecture spec extracted from reference examples/NVSR/components/unet.py
(UNetResComplex_100Mb, :414-590): 6 encoder groups of 4 pre-activation
residual conv blocks + 2x2 avg-pool (channels 32/64/128/256/384/384), a
center residual block, 6 mirrored decoder groups (BN->ReLU->3x3 stride-2
transposed conv, time-pruned, skip-concat, 4 residual blocks), a final
residual block and a 1x1 head; input time axis padded to a multiple of
2^6 and the last frequency bin dropped/re-padded (:552-559,585-587).

TPU-first differences from the torch original:
- NHWC layout (XLA/TPU-native conv layout) — the weight converter
  (models/convert.py) transposes OIHW->HWIO when importing checkpoints.
- A single `UNetRes` parameterized by `blocks_per_group` serves both
  'unet' and 'unet_small' (in the reference, unet_small.py's *Res1B
  classes are byte-identical in structure to *Res4B — the two files
  differ only in class names, so both map to blocks_per_group=4).
- Pure functions of (params, batch_stats); no module mutation.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


class ConvBlockRes(nn.Module):
    """Pre-activation residual block (reference unet.py:289-352):
    BN -> leaky_relu(0.01) -> 3x3 conv -> BN -> leaky_relu -> 3x3 conv,
    with a biased 1x1 shortcut when channel counts differ.

    `dtype` is the computation dtype (params stay float32): bfloat16
    roughly doubles conv throughput on the MXU for inference.

    `fold_bn=True` is the inference-only folded form: bn2 — the one BN
    adjacent to a conv with no nonlinearity between (conv1 -> bn2) — is
    folded into conv1's weights+bias at parameter-transform time
    (models/fold_bn.py), so the module runs one fewer elementwise pass
    per block.  bn1 cannot fold (leaky_relu sits between it and conv1)."""

    out_ch: int
    dtype: object = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=self.dtype, name="bn1")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        if self.fold_bn:
            h = nn.Conv(self.out_ch, (3, 3), use_bias=True, dtype=self.dtype,
                        name="conv1")(h)
        else:
            h = nn.Conv(self.out_ch, (3, 3), use_bias=False, dtype=self.dtype,
                        name="conv1")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=self.dtype, name="bn2")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(self.out_ch, (3, 3), use_bias=False, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class EncoderGroup(nn.Module):
    out_ch: int
    blocks: int = 4
    dtype: object = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.blocks):
            x = ConvBlockRes(self.out_ch, dtype=self.dtype, fold_bn=self.fold_bn,
                             name=f"conv_block{i + 1}")(x, train)
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return pooled, x


class DecoderGroup(nn.Module):
    """BN -> ReLU -> stride-2 3x3 transposed conv -> prune last time row ->
    concat skip -> residual blocks (reference unet.py:235-287)."""

    out_ch: int
    blocks: int = 4
    dtype: object = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=self.dtype, name="bn1")(x)
        h = nn.relu(h)
        h = nn.ConvTranspose(
            self.out_ch, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv1",
        )(h)
        h = h[:, :-1, :, :]  # prune: (T-1)*2+3 -> 2T (time); freq 2F+1 matches skip
        h = jnp.concatenate([h, skip], axis=-1)
        for i in range(self.blocks):
            h = ConvBlockRes(self.out_ch, dtype=self.dtype, fold_bn=self.fold_bn,
                             name=f"conv_block{i + 2}")(h, train)
        return h


class UNetRes(nn.Module):
    """channels-last UNet over [B, T, F, C] log-mel images.

    `remat=True` rematerializes each encoder/decoder group under autodiff
    (jax.checkpoint), trading ~2x group FLOPs for not holding 26 residual
    blocks' activations — the standard HBM lever for training long
    spectrogram batches."""

    channels: int = 1
    widths: Sequence[int] = (32, 64, 128, 256, 384, 384)
    blocks_per_group: int = 4
    remat: bool = False
    dtype: object = None  # computation dtype (e.g. jnp.bfloat16); params f32
    fold_bn: bool = False  # inference-only folded form (models/fold_bn.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, F, C]
        if self.remat:
            Enc = nn.remat(EncoderGroup, static_argnums=(2,))
            Dec = nn.remat(DecoderGroup, static_argnums=(3,))
        else:
            Enc, Dec = EncoderGroup, DecoderGroup
        origin_len = x.shape[1]
        ratio = 2 ** len(self.widths)
        pad_len = int(np.ceil(origin_len / ratio)) * ratio - origin_len
        x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0), (0, 0)))
        x = x[:, :, : x.shape[2] - 1, :]  # drop last freq bin (128 -> 127)

        skips = []
        h = x
        for i, w in enumerate(self.widths):
            h, skip = Enc(w, self.blocks_per_group, dtype=self.dtype,
                          fold_bn=self.fold_bn,
                          name=f"encoder_block{i + 1}")(h, train)
            skips.append(skip)
        h = ConvBlockRes(self.widths[-1], dtype=self.dtype, fold_bn=self.fold_bn,
                         name="conv_block7")(h, train)
        dec_widths = list(self.widths[::-1])  # 384,384,256,128,64,32
        for i, w in enumerate(dec_widths):
            h = Dec(w, self.blocks_per_group, dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name=f"decoder_block{i + 1}")(h, skips[-(i + 1)], train)
        h = ConvBlockRes(self.widths[0], dtype=self.dtype, fold_bn=self.fold_bn,
                         name="after_conv_block1")(h, train)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="after_conv2")(h)
        h = h.astype(jnp.float32)

        h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 0)))  # restore freq bin
        h = h[:, :origin_len, :, :]
        return {"mel": h}


def UNetResComplex_100Mb(channels: int = 1, **kw):
    """Reference-named constructor (examples/NVSR/components/unet.py:414):
    the 6-level Res4B UNet with the published widths.  Returns a UNetRes
    configured identically; `unet_small`'s Res1B variant maps to the
    SAME configuration (the reference's unet_small.py is a class-rename
    of unet.py — see the module docstring; structural equality asserted
    by tests/test_examples.py)."""
    return UNetRes(channels=channels, **kw)
