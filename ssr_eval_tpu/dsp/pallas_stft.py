"""Pallas TPU kernel: fused window + DFT-matmul + magnitude.

The metric/degradation spectrogram is the hottest op in the pipeline
(SURVEY §3.5: 3+ STFTs per (file, setting) pair).  The XLA path computes
real and imag DFT matmuls as separate HBM-resident intermediates before
the magnitude; this kernel fuses the whole transform per tile:

    grid (frame_tiles, freq_tiles):
      out[ft, fq] <- | (frames[ft] * window) @ Wr[:, fq] ,
                      (frames[ft] * window) @ Wi[:, fq] |     (MXU)

so real/imag never round-trip through HBM and the window multiply fuses
into the matmul operand load.  The DFT-as-matmul form rides the MXU for
any n_fft (incl. non-power-of-2 metric sizes like 2229 @48 kHz) with f32
HIGHEST accumulation; frequency tiles stream the DFT matrices through
VMEM in FREQ_TILE columns.

Framing itself stays outside the kernels as static slab slices
(dsp.spectral.frame_slabs): Mosaic requires lane-aligned vector loads
and 1024-tiled DMA offsets, and a 441-sample hop satisfies neither.

Two kernels live here: the dense-DFT `fused_stft_magnitude` (any n_fft)
and the Cooley-Tukey `fused_ct_stft_magnitude` (power-of-2, VMEM
butterflies).  Correctness is tested in interpreter mode on CPU; both
compile natively on TPU and are selectable via SSR_EVAL_TPU_PALLAS
(see dsp.spectral._pallas_stft_mode — default off since round 2, when
the XLA CT path started measuring faster; bench.py keeps the A/B).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_TILE = 128
FREQ_TILE = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _padded_dft(n_fft: int, n_bins_pad: int):
    """Real/imag rDFT matrices zero-padded to a lane-aligned bin count."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    wr = np.zeros((n_fft, n_bins_pad), np.float32)
    wi = np.zeros((n_fft, n_bins_pad), np.float32)
    wr[:, : k.shape[1]] = np.cos(ang)
    wi[:, : k.shape[1]] = np.sin(ang)
    return wr, wi


def _kernel(frames_ref, win_ref, wr_ref, wi_ref, out_ref):
    fr = frames_ref[:] * win_ref[:]
    real = jnp.dot(
        fr, wr_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    imag = jnp.dot(
        fr, wi_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.sqrt(real * real + imag * imag)


def _ct_kernel(leaves_ref, cr_ref, ci_ref, *rest):
    """Base-DFT matmul + L radix-2 butterfly levels + magnitude, all in
    VMEM (one HBM read of the leaves, one write of the magnitudes).

    Butterfly pairs live in adjacent 128-aligned lane blocks, so each
    level is static lane slices + elementwise complex math + a lane
    concat — every shape Mosaic supports.  rest = L x (twiddle_re [1,P],
    twiddle_im [1,P]) inputs, then the output ref."""
    tw_refs = rest[:-1]
    out_ref = rest[-1]
    L = len(tw_refs) // 2
    lv = leaves_ref[:]  # [T, G, M]
    T, G, M = lv.shape
    x2 = lv.reshape(T * G, M)
    re = jnp.dot(x2, cr_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(x2, ci_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    re = re.reshape(T, G * M)
    im = im.reshape(T, G * M)
    g, p = G, M
    for lev in range(L):
        twr = tw_refs[2 * lev][:]
        twi = tw_refs[2 * lev + 1][:]
        res_re, res_im = [], []
        for j in range(g // 2):
            e_re = re[:, (2 * j) * p : (2 * j + 1) * p]
            o_re = re[:, (2 * j + 1) * p : (2 * j + 2) * p]
            e_im = im[:, (2 * j) * p : (2 * j + 1) * p]
            o_im = im[:, (2 * j + 1) * p : (2 * j + 2) * p]
            t_re = twr * o_re - twi * o_im
            t_im = twr * o_im + twi * o_re
            res_re += [e_re + t_re, e_re - t_re]
            res_im += [e_im + t_im, e_im - t_im]
        re = jnp.concatenate(res_re, axis=1)
        im = jnp.concatenate(res_im, axis=1)
        g //= 2
        p *= 2
    out_ref[:] = jnp.sqrt(re * re + im * im)


def fused_ct_stft_magnitude(
    ext: jnp.ndarray,
    n_fft: int,
    hop: int,
    max_frames: int,
    window,
    interpret: bool = False,
) -> jnp.ndarray:
    """|STFT| via the Cooley-Tukey Pallas kernel (power-of-2 n_fft with
    n_fft = 2^L * 128, n_fft <= 4096 for VMEM headroom).

    Framing/window/leaf-permutation stay XLA (slab slices + a minor-dim
    transpose); the transform itself runs in one VMEM-resident kernel.
    Measured on v5e: ~3.5 ms per 8x604-frame batch for the kernel body —
    competitive with, but not faster than, the fused-by-XLA CT path
    (dsp/fft_matmul.py); kept as a selectable mode
    (SSR_EVAL_TPU_PALLAS=ct) and an A/B reference.
    """
    import numpy as np_

    from ssr_eval_tpu.dsp import fft_matmul as FM
    from ssr_eval_tpu.dsp.spectral import frame_slabs

    L = FM.ct_levels(n_fft)
    assert L is not None and n_fft <= 4096, n_fft
    M = n_fft >> L
    G = 1 << L
    T = FRAME_TILE
    mf_pad = _round_up(max_frames, T)
    frames = frame_slabs(ext, hop, n_fft, mf_pad) * jnp.asarray(
        window.astype(np_.float32)
    )
    leaves = jnp.take(
        jnp.swapaxes(frames.reshape(mf_pad, M, G), 1, 2),
        jnp.asarray(FM._bitrev(L)),
        axis=1,
    )  # [mf_pad, G, M]
    cr, ci = FM._base_dft(M)
    tw = []
    for lev in range(L):
        twr, twi = FM._twiddle(M << lev)
        tw += [jnp.asarray(twr[None, :]), jnp.asarray(twi[None, :])]
    out = pl.pallas_call(
        _ct_kernel,
        grid=(mf_pad // T,),
        in_specs=[
            pl.BlockSpec((T, G, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L),
        out_specs=pl.BlockSpec((T, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mf_pad, n_fft), jnp.float32),
        interpret=interpret,
    )(leaves, jnp.asarray(cr), jnp.asarray(ci), *tw)
    return out[:max_frames, : n_fft // 2 + 1]


def fused_stft_magnitude(
    ext: jnp.ndarray,
    n_fft: int,
    hop: int,
    max_frames: int,
    window: np.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """|STFT| of an already reflect-extended signal [Lext].

    Frames beyond `max_frames` are garbage and the caller's to mask (same
    contract as dsp.spectral.stft_real_imag).
    Returns [max_frames, n_bins], n_bins = n_fft//2 + 1.
    """
    from ssr_eval_tpu.dsp.spectral import frame_slabs

    n_bins = n_fft // 2 + 1
    n_bins_pad = _round_up(n_bins, FREQ_TILE)
    mf_pad = _round_up(max_frames, FRAME_TILE)
    frames = frame_slabs(ext, hop, n_fft, mf_pad)  # static slices, no gather

    wr, wi = _padded_dft(n_fft, n_bins_pad)
    out = pl.pallas_call(
        _kernel,
        grid=(mf_pad // FRAME_TILE, n_bins_pad // FREQ_TILE),
        in_specs=[
            pl.BlockSpec((FRAME_TILE, n_fft), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window [1, n_fft]
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_TILE, FREQ_TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mf_pad, n_bins_pad), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(window.astype(np.float32)[None, :]), jnp.asarray(wr), jnp.asarray(wi))
    return out[:max_frames, :n_bins]
