"""Cooley-Tukey FFT as MXU matmuls + static butterflies (TPU-first).

XLA's generic FFT lowering is slow on TPU, and a dense rDFT matmul does
n_fft * n_bins MACs per frame (the round-1 design).  This module factors a
power-of-2 FFT as

    N = 2^L * M   (M = the MXU base width, default 512 under the HIGH
    precision policy — see _default_base for the measured
    128/256/512/1024 A/Bs at each precision era)

- the 2^L interleaved leaf sequences (bit-reversed order) go through ONE
  batched [*, M] @ [M, M] DFT matmul pair (cos/sin), a shape the 128x128
  systolic array runs at full utilization;
- L radix-2 butterfly levels with precomputed f64->f32 twiddles combine
  them — pure VPU elementwise work that XLA fuses.

FLOPs per frame drop from N*(N/2+1)*4 (dense rDFT) to N*M*4 + O(L*N):
~8x fewer at N=2048, while every matmul stays MXU-shaped.  NOTE (r5):
fewer FLOPs stopped being the right objective for the STFT sites — the
fused sweep is transform-PASS bound, and the dense rDFT (zero butterfly
/untangle passes) measured 22.6% faster end-to-end at HIGH precision
(scripts/rfftmode_ab.py), so dsp.spectral now routes STFT sizes dense
by default (_default_rfft_mode) and this module serves the FFT-conv
filter path (dsp/filters.py block transforms), the Pallas kernel's CT
plan, and the "pack"/"direct" experiment modes.

Accuracy: twiddles and base matrices are built in float64 and cast to
f32; base-matmul precision follows dsp/precision.py (benched default
HIGH = 3 bf16 passes; max |dLSD| impact 5.5e-5 vs HIGHEST's 2.0e-6 —
scripts/fftprec_ab.py).  Agreement with np.fft.rfft is ~1e-7 relative
in f32-exact mode (tests/test_spectral.py::test_ct_fft_*).

Scope: measured on v5e, CT wins decisively at STFT sizes (n_fft=2048:
0.44 ms vs 2.6 ms XLA rfft per 8x604-frame batch) but LOSES at very
large N where the L butterfly HBM passes dominate (N=2^20: 11.4 ms vs
6.8 ms XLA) — the FFT-convolution filter path (dsp/filters.py)
deliberately keeps jnp.fft for its ~1M-point transforms.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ssr_eval_tpu.dsp.precision import dsp_precision


def _default_base() -> int:
    """MXU base-DFT width: each radix-2 level above the base is one full
    re+im HBM read+write pass over the frame block, so a wider base
    trades (cheap, MXU) matmul FLOPs for (scarce) HBM passes.  The
    optimum depends on the matmul PRECISION policy (dsp/precision.py):
    every halving of the bf16 pass count re-prices the trade, so the
    base is re-adjudicated whenever the precision default moves
    (scripts/ctbase_ab.py, interleaved on-chip, fused headline program):
    - Precision.HIGHEST era (r4, 6 passes): 128->140, 256->131,
      512->185, 1024->155 ms/call — 256 won.
    - Precision.HIGH default (r5, 3 passes): 128->81.8, 256->79.1,
      512->**75.6**, 1024->84.3 ms/batch marginal — halved matmul cost
      buys one more saved butterfly pass; 512 won (-4.5%), accuracy
      gate equal to 256 vs the f64 oracle (scripts/ctbase_acc.py:
      lsd 5.6e-5 vs 5.5e-5, ssim 2.1e-6 vs 2.3e-6).
    - Dense-rDFT era (r5 late): the rfft-mode flip routed the STFT
      sites around CT entirely, so the base's remaining hot user is
      the IIR filter path's 2/4k-point overlap-save block FFTs — a
      much smaller transform where butterfly passes are few and the
      base matmul's O(base) FLOPs dominate.  Re-adjudicated THERE
      (scripts/ctbase_iir_ab.py, butter+cheby1 order-8 sweep,
      interleaved, stable over 4 reps): 128->**132.2**, 256->140.5,
      512->146.7, 1024->178.0 ms/sweep-pass — **128 is the default**;
      waveform accuracy gate vs f64 scipy sosfiltfilt equal at the f32
      floor (6.8e-5 vs 6.1e-5 rel, scripts/ctbase_iir_acc.py).  If
      SSR_EVAL_TPU_RFFT_MODE is flipped back to pack/direct, 512 was
      the STFT-site optimum — re-run ctbase_ab under that mode.
    SSR_EVAL_TPU_CT_BASE overrides for A/B."""
    try:
        b = int(os.environ.get("SSR_EVAL_TPU_CT_BASE", "128") or "128")
    except ValueError:
        b = 128
    return b if b in (128, 256, 512, 1024) else 128


_BASE = _default_base()


def _default_rfft_mode() -> str:
    """How the real-input forward/inverse transforms are factored:

    - "pack": half-size complex CT + Hermitian untangle (r4 default).
      Halves every butterfly level, but the untangle's mirror is a
      lane-axis `reverse` — a retiling-slow op on TPU (~1.3 ms per
      [16,744,1152] flip, device trace r5).
    - "direct": full-size CT with real leaves (forward) / Hermitian
      extension (inverse).  No untangle; at base 512 the forward has a
      single radix-4 butterfly level.  The inverse still pays extension
      reverses.
    - "dense": no CT at all at the STFT sites — the dense rDFT matmul
      pair (the same path non-power-of-2 sizes use, spectral.py).  4x
      the matmul FLOPs of direct at n_fft=2048/base=512, but ZERO
      butterfly/untangle/extension passes AND none of the CT leaf
      retilings that dominated the trace's copy/reshape bucket;
      spectral.stft/istft route around CT when this mode is set (capped
      at n_fft <= 4096 — dense is O(N^2)).  Direct rfft_ct/irfft_ct
      callers (the FFT-conv filter path) keep the pack form under it.

    The trade is era-dependent, exactly like the CT base width, and was
    re-adjudicated on-chip at base 512 / HIGH (scripts/rfftmode_ab.py,
    interleaved, fused headline program): pack 75.5, direct 85.0,
    **dense 58.4 ms/batch marginal (-22.6%)** — the fused sweep is
    transform-PASS bound, and at HIGH precision the MXU eats the extra
    dense FLOPs for free.  Accuracy gate (scripts/rfftmode_acc.py, f64
    oracle): dense is slightly MORE accurate than pack (lsd 4.77e-5 vs
    5.65e-5 — fewer sequential rounding stages).

    The default is "auto": dense on TPU, pack on CPU.  Dense is NOT the
    CPU default because dnnl GEMM results depend on the M (row-count)
    shape — the same frame rows transform to values differing at ~3e-6
    when the bucket/batch changes GEMM M, which breaks batch-composition
    invariance at the masked-stopband floor (0.1-0.5 LSD swings; caught
    by tests/test_fuzz.py::test_batch_composition_invariance).  The TPU
    MXU's K-accumulation is M-independent — measured invariant on-chip
    (delta <= 5e-7 on the same fuzz setup).  Re-run the A/B scripts
    whenever base/precision move."""
    v = os.environ.get("SSR_EVAL_TPU_RFFT_MODE", "").strip().lower()
    return v if v in ("pack", "direct", "dense", "auto") else "auto"


_RFFT_MODE = _default_rfft_mode()


def ct_levels(n_fft: int, base: int | None = None):
    """Number of radix-2 levels L with n_fft = 2^L * base, or None if the
    factorization does not apply (non-pow2 or n_fft < base).

    base=None resolves the module default at CALL time (not def time), so
    tests and A/B harnesses can flip `fft_matmul._BASE` between traces."""
    if base is None:
        base = _BASE
    if 128 <= n_fft < base and (n_fft & (n_fft - 1)) == 0:
        base = n_fft  # small pow2: one base matmul, no levels
    L = 0
    n = n_fft
    while n > base and n % 2 == 0:
        n //= 2
        L += 1
    return L if n == base else None


@functools.lru_cache(maxsize=8)
def _bitrev(L: int) -> np.ndarray:
    n = 1 << L
    out = np.zeros(n, np.int32)
    for s in range(n):
        r, v = 0, s
        for _ in range(L):
            r = (r << 1) | (v & 1)
            v >>= 1
        out[s] = r
    return out


@functools.lru_cache(maxsize=8)
def _base_dft(M: int) -> tuple[np.ndarray, np.ndarray]:
    """Full complex DFT matrices [M, M] (e^{-2*pi*i*n*k/M}), f64 -> f32."""
    n = np.arange(M, dtype=np.float64)[:, None]
    k = np.arange(M, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / M
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _twiddle(P: int) -> tuple[np.ndarray, np.ndarray]:
    """e^{-2*pi*i*k/(2P)} for k in [0, P), f64 -> f32."""
    k = np.arange(P, dtype=np.float64)
    ang = -np.pi * k / P
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _leaves(x: jnp.ndarray, L: int, M: int) -> jnp.ndarray:
    """[..., N] -> [..., 2^L, M] leaf sequences in NATURAL order.

    Leaf g holds x[g::2^L].  The classic iterative radix-2 DIT gathers
    leaves into bit-reversed order so every level combines adjacent
    pairs; `_combine` instead pairs groups by major-half slicing
    ((g, g+G/2) at each level), which is the same butterfly tree without
    the bitrev gather — a measured 3.7 ms/call of pure data movement in
    the fused headline program (device trace, r4)."""
    G = 1 << L
    lead = x.shape[:-1]
    xt = x.reshape(*lead, M, G)
    return jnp.swapaxes(xt, -1, -2)  # [..., G, M], axis -2 indexed by g


def _combine(re, im, L: int, M: int):
    """L butterfly levels over [..., 2^L, M] (natural leaf order) -> [..., N].

    Levels run radix-4 (two radix-2 levels fused algebraically) while at
    least two remain, then one radix-2 for odd L.  Each level is a full
    re+im HBM read+write pass over the frame block and the fused sweep is
    transform-pass bound (drain split, BENCH_DETAIL), so halving the
    level count halves the dominant traffic term; FLOPs are unchanged
    (VPU elementwise either way).  With natural-order leaves each level
    pairs (g, g+G/2) — major-half plane slices, no bitrev gather — and a
    radix-4 level consumes the quad (g, g+G/4, g+G/2, g+3G/4) as planes
    (0, 2, 1, 3) of the [4, G/4, P] major split:
      X[0:P]=a+w2a*c, X[P:2P]=b+w2b*d, X[2P:3P]=a-w2a*c, X[3P:4P]=b-w2b*d
    with a,b = l0 +- w1*l1 and c,d = l2 +- w1*l3 (w1 over P, w2 over 2P),
    l0..l3 = leaves (g, g+G/2, g+G/4, g+3G/4).
    """
    G, P = 1 << L, M
    lead = re.shape[:-2]
    while G >= 4:
        re = re.reshape(*lead, 4, G // 4, P)
        im = im.reshape(*lead, 4, G // 4, P)
        l0r, l1r, l2r, l3r = (re[..., j, :, :] for j in (0, 2, 1, 3))
        l0i, l1i, l2i, l3i = (im[..., j, :, :] for j in (0, 2, 1, 3))
        w1r_np, w1i_np = _twiddle(P)
        w2r_np, w2i_np = _twiddle(2 * P)
        w1r, w1i = jnp.asarray(w1r_np), jnp.asarray(w1i_np)
        w2ar, w2ai = jnp.asarray(w2r_np[:P]), jnp.asarray(w2i_np[:P])
        w2br, w2bi = jnp.asarray(w2r_np[P:]), jnp.asarray(w2i_np[P:])
        t1r = w1r * l1r - w1i * l1i
        t1i = w1r * l1i + w1i * l1r
        t3r = w1r * l3r - w1i * l3i
        t3i = w1r * l3i + w1i * l3r
        ar, ai = l0r + t1r, l0i + t1i
        br, bi = l0r - t1r, l0i - t1i
        cr, ci = l2r + t3r, l2i + t3i
        dr, di = l2r - t3r, l2i - t3i
        ur = w2ar * cr - w2ai * ci
        ui = w2ar * ci + w2ai * cr
        vr = w2br * dr - w2bi * di
        vi = w2br * di + w2bi * dr
        re = jnp.concatenate([ar + ur, br + vr, ar - ur, br - vr], axis=-1)
        im = jnp.concatenate([ai + ui, bi + vi, ai - ui, bi - vi], axis=-1)
        G //= 4
        P *= 4
    if G == 2:
        re = re.reshape(*lead, 1, 2, P)
        im = im.reshape(*lead, 1, 2, P)
        e_re, o_re = re[..., 0, :], re[..., 1, :]
        e_im, o_im = im[..., 0, :], im[..., 1, :]
        twr_np, twi_np = _twiddle(P)
        twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
        t_re = twr * o_re - twi * o_im
        t_im = twr * o_im + twi * o_re
        re = jnp.concatenate([e_re + t_re, e_re - t_re], axis=-1)
        im = jnp.concatenate([e_im + t_im, e_im - t_im], axis=-1)
        P *= 2
    return re.reshape(*lead, P), im.reshape(*lead, P)


def _fft_from_leaves(lr, li, L: int, M: int):
    """Base-DFT matmuls + combine over prebuilt [..., 2^L, M] leaves
    (natural order; li=None for real leaves)."""
    cr_np, ci_np = _base_dft(M)
    cr, ci = jnp.asarray(cr_np), jnp.asarray(ci_np)
    _hi = dsp_precision()
    if li is None:
        re = jnp.dot(lr, cr, preferred_element_type=jnp.float32, precision=_hi)
        im = jnp.dot(lr, ci, preferred_element_type=jnp.float32, precision=_hi)
    else:
        re = jnp.dot(lr, cr, preferred_element_type=jnp.float32, precision=_hi) - jnp.dot(
            li, ci, preferred_element_type=jnp.float32, precision=_hi
        )
        im = jnp.dot(lr, ci, preferred_element_type=jnp.float32, precision=_hi) + jnp.dot(
            li, cr, preferred_element_type=jnp.float32, precision=_hi
        )
    return _combine(re, im, L, M)


def fft_ct(zr: jnp.ndarray, zi, n_fft: int, base: int | None = None):
    """Forward complex FFT of [..., n_fft] -> (real, imag) [..., n_fft].

    zi=None treats the input as real (halves the base matmuls)."""
    L = ct_levels(n_fft, base)
    assert L is not None, n_fft
    M = n_fft >> L
    lr = _leaves(zr, L, M)
    li = None if zi is None else _leaves(zi, L, M)
    return _fft_from_leaves(lr, li, L, M)


@functools.lru_cache(maxsize=16)
def _pack_twiddle(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """W[k] = e^{-2*pi*i*k/n_fft} for k in [0, n_fft/2], f64 -> f32."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = -2.0 * np.pi * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rfft_ct(x: jnp.ndarray, n_fft: int, base: int | None = None):
    """Real-input FFT -> (real, imag) [..., n_fft//2 + 1].

    Real inputs pack into an n_fft/2-point COMPLEX transform
    (z[n] = x[2n] + i*x[2n+1]) plus an O(N) untangle — halving every
    butterfly level's HBM pass relative to the real-as-complex full
    transform (measured r4: the fused sweep's drain is transform-pass
    bound).  Falls back to the full transform when n_fft/2 does not
    factor as 2^L * base."""
    half = n_fft // 2
    # "dense" routes the STFT sites around CT in spectral.py; direct CT
    # callers (the FFT-conv filter path) keep the pack form under it —
    # only the explicit "direct" experiment flips them.
    if n_fft % 2 or ct_levels(half, base) is None or _RFFT_MODE == "direct":
        re, im = fft_ct(x, None, n_fft, base)
        nb = n_fft // 2 + 1
        return re[..., :nb], im[..., :nb]
    # Dead end (r4): folding this even/odd pack into the leaves reshape
    # (one [..., M, 2G] view, even/odd planes of the second-minor axis
    # instead of lane-strided slices) measured +3.3 ms/call SLOWER on the
    # fused headline program — XLA already fuses the lane-strided slices
    # into the framing pass, and the plane-sliced layout fuses worse.
    Zr, Zi = fft_ct(x[..., 0::2], x[..., 1::2], half, base)
    # k = 0..half with Z[half] == Z[0]; Z_f := conj(Z[half - k])
    Zr_e = jnp.concatenate([Zr, Zr[..., :1]], axis=-1)
    Zi_e = jnp.concatenate([Zi, Zi[..., :1]], axis=-1)
    Zr_f = Zr_e[..., ::-1]
    Zi_f = -Zi_e[..., ::-1]
    ar = 0.5 * (Zr_e + Zr_f)
    ai = 0.5 * (Zi_e + Zi_f)
    dr = Zr_e - Zr_f
    di = Zi_e - Zi_f
    br = 0.5 * di   # B = -i/2 * d
    bi = -0.5 * dr
    wr_np, wi_np = _pack_twiddle(n_fft)
    wr, wi = jnp.asarray(wr_np), jnp.asarray(wi_np)
    return ar + wr * br - wi * bi, ai + wr * bi + wi * br


def irfft_ct(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, base: int | None = None):
    """Inverse of rfft_ct: hermitian half-spectrum [..., n_fft//2+1] ->
    real signal [..., n_fft].

    Inverse pack trick (see rfft_ct): untangle to the n_fft/2-point
    complex spectrum, one half-size inverse transform (via
    ifft(Z) = conj(fft(conj(Z)))/M), interleave.  Fallback: the
    hermitian extension + full-length transform."""
    half = n_fft // 2
    if n_fft % 2 or ct_levels(half, base) is None or _RFFT_MODE == "direct":
        ext_re = jnp.concatenate([real, real[..., -2:0:-1]], axis=-1)
        ext_im = jnp.concatenate([-imag, imag[..., -2:0:-1]], axis=-1)
        yr, _ = fft_ct(ext_re, ext_im, n_fft, base)
        return yr / n_fft
    # X_f := conj(X[half - k]) on k = 0..half
    Xr_f = real[..., ::-1]
    Xi_f = -imag[..., ::-1]
    ar = 0.5 * (real + Xr_f)
    ai = 0.5 * (imag + Xi_f)
    dr = real - Xr_f
    di = imag - Xi_f
    wr_np, wi_np = _pack_twiddle(n_fft)
    wr, wi = jnp.asarray(wr_np), jnp.asarray(wi_np)
    br = 0.5 * (dr * wr + di * wi)  # B = d * conj(W) / 2
    bi = 0.5 * (di * wr - dr * wi)
    # Z = A + i*B, keep k = 0..half-1
    Zr = (ar - bi)[..., :half]
    Zi = (ai + br)[..., :half]
    yr, yi = fft_ct(Zr, -Zi, half, base)
    zre = yr / half
    zim = -yi / half
    # interleave: x[2n] = Re(z[n]), x[2n+1] = Im(z[n])
    out = jnp.stack([zre, zim], axis=-1)
    return out.reshape(*zre.shape[:-1], n_fft)
