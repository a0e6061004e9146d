"""Pallas TPU kernel: fused window + DFT-matmul + magnitude.

The metric/degradation spectrogram is the hottest op in the pipeline
(SURVEY §3.5: 3+ STFTs per (file, setting) pair).  One kernel lives
here: the Cooley-Tukey `fused_ct_stft_magnitude` (power-of-2 n_fft, VMEM
butterflies) — base-DFT matmul on the MXU, L radix-2 butterfly levels and
the magnitude all VMEM-resident, one HBM read of the leaves and one write
of the magnitudes.

Framing itself stays outside the kernel as static slab slices
(dsp.spectral.frame_slabs): Mosaic requires lane-aligned vector loads
and 1024-tiled DMA offsets, and a 441-sample hop satisfies neither.

Status (r4): a documented EXPERIMENT, default off.  Isolated |STFT|
timing is competitive with the XLA CT path (dsp/fft_matmul.py), but
end-to-end the Mosaic call is a fusion barrier for the surrounding
masking/metric ops — measured twice (r2: 50.3 utt/s forced-on vs 82.7
XLA; r3 A/B inside tunnel noise isolated).  A second dense-DFT Pallas
kernel (any n_fft) was retired in r4 on the same evidence (VERDICT r3
#6): it duplicated the XLA dense-DFT path with the same barrier cost and
no measured win — see docs/DESIGN.md "Dead ends".  Selectable via
SSR_EVAL_TPU_PALLAS=ct (or 1); correctness is pinned in interpreter mode
on CPU (tests/test_pallas_stft.py) and bench.py records the A/B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
