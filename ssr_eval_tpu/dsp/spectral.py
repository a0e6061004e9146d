"""STFT / iSTFT kernels with librosa & torchlibrosa semantics, TPU-first.

The reference computes STFTs three different ways (librosa in metrics
(metrics.py:27) and BasicTestee (eval.py:29,37-40); torchlibrosa conv1d inside
FDomainHelper (dsp.py:21-39)); all share the same math: periodic Hann window,
``center=True`` reflect padding, ``win_length == n_fft``.  Here there is ONE
implementation, designed for XLA:

- **Static shapes**: signals live in fixed-size buckets ``[B, Lmax]`` with a
  per-utterance true length ``L``.  Reflect padding for arbitrary traced ``L``
  is a vectorized index computation (no data-dependent control flow), so a
  single compiled kernel serves every utterance length in a bucket —
  replacing the reference's per-file Python loop.
- **MXU-friendly transform**: the DFT is a dense f32 matmul against
  precomputed rDFT matrices — systolic-array work instead of a slow generic
  FFT — for non-power-of-2 sizes (the reference's metric STFT uses
  n_fft=2229 at 48 kHz, metrics.py:19) AND, since r5 on TPU, for power-of-2
  STFT sizes too (benched −22.6% vs the Cooley-Tukey factorization on the
  fused sweep; `_dense_pow2` — CPU stays on pack-CT for batch-composition
  invariance, see fft_matmul._default_rfft_mode).  CT (fft_matmul.py)
  remains the option and the path for direct callers.
- **Batch-first**: everything vmaps over the utterance axis; the harness
  shards that axis over the device mesh.

iSTFT uses overlap-add with the window-sum-square normalization (librosa
semantics, which torchlibrosa's ISTFT follows), implemented as K static
shifted adds rather than a scatter.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _default_wss_mode() -> str:
    """iSTFT window-sum-square masking form: "slice" subtracts a
    per-utterance full-length dynamic_slice of the shifted constant
    (r4 closed form); "patch" divides by the broadcast constant W and
    exactly recomputes the one static-size window where the shifted term
    is nonzero AND the output is kept — the vmapped full-length slice
    lowers to a sequential per-row copy loop (~4 ms/call, device trace
    r5), the patch is ~100x smaller.  Bit-identical outputs (the guarded
    division sees the same values either way; tests pin it).

    Adjudicated on-chip (scripts/wsspatch_ab.py, interleaved, under the
    dense-rDFT default): patch 57.2 vs slice 58.6 ms/batch marginal —
    a stable but small −2.5%, BELOW the repo's 5% default-flip bar
    (fold_bn precedent), and the raw cross-mode metric delta on-chip is
    1.2e-3 (XLA fuses the two division structures differently; never
    oracle-gated).  Default stays "slice"; the patch form is kept as a
    measured option."""
    v = os.environ.get("SSR_EVAL_TPU_WSS", "").strip().lower()
    return v if v in ("slice", "patch") else "slice"


_WSS_MODE = _default_wss_mode()


def _default_dense_fold() -> bool:
    """Fold the Hann window (forward) and window+hermitian-scale+1/N
    (inverse) into the dense rDFT constant matrices, removing the
    separate elementwise passes over the [frames, n_fft] slabs from the
    transform-pass-bound fused program.  Exact fold: the products are
    formed in float64 at matrix build time and cast once to f32 (the
    unfolded path rounds the window to f32 first, so the folded values
    are if anything closer to the f64 reference).

    Default pending the on-chip adjudication (scripts/densefold_ab.py,
    interleaved, same protocol as the rfft-mode A/B);
    SSR_EVAL_TPU_DENSE_FOLD selects explicitly."""
    return os.environ.get("SSR_EVAL_TPU_DENSE_FOLD", "0").strip().lower() not in (
        "0",
        "false",
    )


_DENSE_FOLD = _default_dense_fold()


class StftConfig(NamedTuple):
    """Hashable STFT configuration (static jit argument).

    Mirrors the two configurations used by the reference:
    - degradation STFT: n_fft=2048, hop=441  (reference dsp.py:7-10)
    - metric STFT: hop=int(rate/100), n_fft=int(2048/(44100/rate))
      (reference metrics.py:17-19)
    - librosa defaults (BasicTestee.postprocessing): n_fft=2048, hop=512
    """

    n_fft: int
    hop: int
    win_length: Optional[int] = None  # None -> n_fft
    center: bool = True
    pad_mode: str = "reflect"

    @property
    def win(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    @property
    def pad(self) -> int:
        return self.n_fft // 2 if self.center else 0

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def max_frames(self, max_len: int) -> int:
        """Frame count for the longest signal in a bucket (static)."""
        return max(1, 1 + (max_len + 2 * self.pad - self.n_fft) // self.hop)


def n_frames_for_length(cfg: StftConfig, length) -> jnp.ndarray:
    """Number of valid STFT frames for a (possibly traced) signal length."""
    return jnp.maximum(1, 1 + (length + 2 * cfg.pad - cfg.n_fft) // cfg.hop)


@functools.lru_cache(maxsize=32)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic ('fftbins') Hann window, float64 host-side; cast at use site."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


@functools.lru_cache(maxsize=16)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rDFT matrices [n_fft, n_bins], float32, built in f64."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _padded_window64(n_fft: int, win_length: int) -> np.ndarray:
    """Analysis/synthesis window center-padded to n_fft, float64
    (librosa util.pad_center semantics, reference dsp.py:21-39)."""
    win = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    return win


@functools.lru_cache(maxsize=16)
def _dft_matrices_windowed(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward rDFT matrices with the analysis window folded into the
    rows: (frames * win) @ W == frames @ (diag(win) @ W).  Built in
    float64, cast once to f32 — saves the per-call elementwise window
    pass over the [frames, n_fft] slab (see _default_dense_fold)."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = _padded_window64(n_fft, win_length)[:, None]
    return (win * np.cos(ang)).astype(np.float32), (win * np.sin(ang)).astype(
        np.float32
    )


@functools.lru_cache(maxsize=16)
def _idft_matrices_windowed(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT matrices [n_bins, n_fft] with the hermitian scale,
    1/N normalization AND the synthesis window all folded in:

        frames = real @ A_r + imag @ A_i
               == (irDFT(real, imag)) * win          (exactly, in f64)

    replacing two matmuls + three elementwise passes (scale, 1/N, win)
    with two matmuls.  A_r[k, n] = s_k * cos(-2*pi*n*k/N) * win[n] / N,
    A_i likewise with sin (forward used ang = -theta, so wi = -sin(theta)
    and x[n] = sum_k s_k (Re cos - Im sin) matches istft's unfolded
    expression term for term)."""
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
    ang = -2.0 * np.pi * n * k / n_fft
    scale = np.full((n_fft // 2 + 1, 1), 2.0)
    scale[0, 0] = 1.0
    if n_fft % 2 == 0:
        scale[-1, 0] = 1.0
    win = _padded_window64(n_fft, win_length)[None, :]
    a_r = scale * np.cos(ang) * win / n_fft
    a_i = scale * np.sin(ang) * win / n_fft
    return a_r.astype(np.float32), a_i.astype(np.float32)


def _use_matmul_dft(n_fft: int) -> bool:
    """Non-power-of-2 FFTs go through the MXU as dense DFT matmuls."""
    return (n_fft & (n_fft - 1)) != 0


def _dense_pow2(n_fft: int) -> bool:
    """Power-of-2 STFT sizes ALSO take the dense rDFT path under the
    benched TPU default (r5): the fused sweep is transform-pass bound
    and dense has zero butterfly/untangle passes (-22.6% marginal,
    scripts/rfftmode_ab.py).  Capped at 4096 — dense is O(N^2), and
    beyond STFT sizes CT/jnp.fft win (the FFT-conv filter path's
    ~1M-point transforms never route here).

    Mode "auto" (the default) resolves per backend at trace time: dense
    on TPU, pack on CPU — CPU dnnl GEMMs are M-shape-dependent and break
    batch-composition invariance at the stopband floor (see
    fft_matmul._default_rfft_mode); explicit "dense" forces it anywhere."""
    from ssr_eval_tpu.dsp import fft_matmul as _fm

    if n_fft > 4096:
        return False
    mode = _fm._RFFT_MODE
    if mode == "auto":
        import jax

        mode = "pack" if jax.default_backend() == "cpu" else "dense"
    return mode == "dense"


def _reflect_index(v, length):
    """Reflect (no edge repeat) virtual index `v` into [0, length).

    Matches np.pad(mode='reflect'): period 2*(L-1); indices may be any
    integer.  Fully vectorized; `length` may be traced.
    """
    period = jnp.maximum(2 * (length - 1), 1)
    m = jnp.mod(v, period)
    return jnp.minimum(m, period - m)


def _extend(x: jnp.ndarray, length, pad: int) -> jnp.ndarray:
    """Reflect-extended signal buffer: ext[v] = x[reflect(v - pad, L)].

    x: [Lmax] zero-padded buffer holding a signal of true length `length`.
    Returns [Lmax + 2*pad].  Positions in [L + 2*pad, Lmax + 2*pad) hold
    x's zero padding (harmless; no valid frame reads past L + 2*pad and
    invalid frames are masked downstream).

    The body is a contiguous copy; only the two `pad`-sized reflected
    edges gather (2*pad elements per signal).  A full elementwise gather
    here measured ~20 ms per 8x266k batch on TPU — 90% of the whole STFT
    — because hop-irregular 1-D gathers bypass the vector memory path.
    """
    if pad == 0:
        return x
    vl = jnp.arange(-pad, 0, dtype=jnp.int32)
    left = x[_reflect_index(vl, length)]
    vr = length + jnp.arange(pad, dtype=jnp.int32)
    right = x[_reflect_index(vr, length)]
    ext = jnp.concatenate([left, x, jnp.zeros(pad, x.dtype)])
    return jax.lax.dynamic_update_slice(ext, right, (pad + length,))


def frame_slabs(ext: jnp.ndarray, hop: int, n_fft: int, max_frames: int) -> jnp.ndarray:
    """Hop-strided framing as K = ceil(n_fft/hop) static slices + reshapes
    (no gather): slab k holds sample k*hop+j of every frame, so
    ext[k*hop : k*hop + mf*hop].reshape(mf, hop) is column block k.
    Measured ~2.3x faster than the index-gather on TPU (hop-strided
    gathers are scalar-ish memory traffic; slabs are contiguous copies).
    """
    K = -(-n_fft // hop)
    need = max_frames * hop + K * hop
    if ext.shape[0] < need:
        ext = jnp.pad(ext, (0, need - ext.shape[0]))
    cols = [
        jax.lax.slice_in_dim(ext, k * hop, k * hop + max_frames * hop).reshape(
            max_frames, hop
        )
        for k in range(K)
    ]
    return jnp.concatenate(cols, axis=1)[:, :n_fft]


def _frames(
    x: jnp.ndarray, length, cfg: StftConfig, max_frames: int, window: bool = True
) -> jnp.ndarray:
    """Windowed frames [max_frames, n_fft] of one signal.

    Framing slices the (dynamically) reflect-extended buffer, so a single
    compiled kernel is shared by every utterance length.  ``window=False``
    returns raw frames for the dense-fold path, which carries the window
    inside the DFT matrices instead (_dft_matrices_windowed).
    """
    if cfg.center:
        ext = _extend(x, length, cfg.pad)
    else:
        ext = x
    fr = frame_slabs(ext, cfg.hop, cfg.n_fft, max_frames)
    if not window:
        return fr
    win = _padded_window64(cfg.n_fft, cfg.win).astype(np.float32)
    return fr * jnp.asarray(win)


def stft_real_imag(
    x: jnp.ndarray, length, cfg: StftConfig, max_frames: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT of a single buffered signal -> (real, imag), each [max_frames, n_bins].

    Frames at index >= n_frames_for_length(cfg, length) are garbage and must
    be masked by the caller (the metric/degradation layers carry frame masks).
    """
    from ssr_eval_tpu.dsp.fft_matmul import ct_levels, rfft_ct

    use_ct = ct_levels(cfg.n_fft) is not None and not _dense_pow2(cfg.n_fft)
    use_dense = not use_ct and (_use_matmul_dft(cfg.n_fft) or _dense_pow2(cfg.n_fft))
    fold = use_dense and _DENSE_FOLD
    fr = _frames(x, length, cfg, max_frames, window=not fold)
    if use_ct:
        # power-of-2 CT: MXU base matmuls + butterflies (~8x fewer FLOPs
        # than the dense rDFT; mode option, see _dense_pow2).
        real, imag = rfft_ct(fr, cfg.n_fft)
    elif use_dense:
        from ssr_eval_tpu.dsp.precision import dsp_precision

        if fold:
            wr, wi = _dft_matrices_windowed(cfg.n_fft, cfg.win)
        else:
            wr, wi = _dft_matrices(cfg.n_fft)
        _hi = dsp_precision()
        real = jnp.dot(fr, jnp.asarray(wr), preferred_element_type=jnp.float32, precision=_hi)
        imag = jnp.dot(fr, jnp.asarray(wi), preferred_element_type=jnp.float32, precision=_hi)
    else:
        z = jnp.fft.rfft(fr, n=cfg.n_fft, axis=-1)
        real, imag = jnp.real(z), jnp.imag(z)
    return real, imag


def _pallas_stft_mode() -> str:
    """Pallas spectrogram kernel selection via SSR_EVAL_TPU_PALLAS:
    "" / "0" / "false" — the XLA path (CT matmul FFT for power-of-2,
    dense DFT otherwise); any other value — the fused Cooley-Tukey Pallas
    kernel (VMEM-resident butterflies).

    Default is the XLA path: isolated kernel A/Bs sit inside tunnel noise
    (ct 4.17 vs xla 4.71 ms one run, xla 5.12 vs ct 7.46 another, per
    8x266k-batch |STFT|), and end-to-end the Mosaic call is a fusion
    barrier for the surrounding mask/metric ops (r2: 50.3 utt/s forced-on
    vs 82.7 XLA).  The dense-DFT Pallas variant was retired in r4 on that
    evidence (VERDICT r3 #6) — it duplicated the XLA dense path with the
    same barrier cost; the CT kernel stays as the sole documented
    experiment.  Shapes it can't take (non-power-of-2, n_fft > 4096,
    win != n_fft) fall through to the XLA path."""
    import os

    flag = os.environ.get("SSR_EVAL_TPU_PALLAS", "0")
    if flag in ("0", "false", ""):
        return ""
    return "ct"


def stft_magnitude(
    x: jnp.ndarray, length, cfg: StftConfig, max_frames: int, eps: float = 0.0
) -> jnp.ndarray:
    """|STFT| [max_frames, n_bins]; eps matches FDomainHelper.spectrogram's
    clamp (reference dsp.py:72-74) when nonzero."""
    mode = _pallas_stft_mode()
    if cfg.center and cfg.win == cfg.n_fft and mode:
        from ssr_eval_tpu.dsp import fft_matmul as _fm
        from ssr_eval_tpu.dsp.pallas_stft import fused_ct_stft_magnitude

        ct_ok = _fm.ct_levels(cfg.n_fft) is not None and cfg.n_fft <= 4096
        if not ct_ok:
            mag = None  # fall through to the XLA path below
        else:
            ext = _extend(x, length, cfg.pad)
            mag = fused_ct_stft_magnitude(
                ext, cfg.n_fft, cfg.hop, max_frames, hann_window(cfg.win)
            )
        if mag is not None:
            if eps:
                mag = jnp.sqrt(jnp.maximum(mag * mag, eps))
            return mag
    real, imag = stft_real_imag(x, length, cfg, max_frames)
    power = real * real + imag * imag
    if eps:
        power = jnp.maximum(power, eps)
    return jnp.sqrt(power)


def _default_ola_mode() -> str:
    """OLA lowering form: "dus" (r1 form) accumulates the K hop-column
    segments with sequential ``.at[].add`` updates — K read-modify-write
    passes over the output buffer; "padsum" statically zero-pads each
    segment to the full buffer and sums — one elementwise fusion reading
    the K segments once (adding zeros is exact, so the two forms are
    bitwise identical).  Adjudicated on-chip with the dense fold
    (scripts/densefold_ab.py protocol); SSR_EVAL_TPU_OLA overrides."""
    v = os.environ.get("SSR_EVAL_TPU_OLA", "").strip().lower()
    return v if v in ("dus", "padsum") else "dus"


_OLA_MODE = _default_ola_mode()


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of [F, n_fft] frames at stride `hop` -> [hop*(F-1) + n_fft].

    Implemented as K = ceil(n_fft/hop) static shifted adds (no scatter):
    frames are split into K hop-sized columns; column k of all frames lands
    contiguously at offset k*hop.  Two lowering forms, see
    _default_ola_mode.
    """
    F, n_fft = frames.shape
    K = -(-n_fft // hop)
    padded = jnp.pad(frames, ((0, 0), (0, K * hop - n_fft)))
    cols = padded.reshape(F, K, hop)
    total = hop * (F - 1) + n_fft
    full = hop * (F - 1) + K * hop
    if _OLA_MODE == "padsum":
        out = None
        for k in range(K):
            seg = jnp.pad(
                cols[:, k, :].reshape(F * hop), (k * hop, full - k * hop - F * hop)
            )
            out = seg if out is None else out + seg
        return out[:total]
    out = jnp.zeros(full, dtype=frames.dtype)
    for k in range(K):
        seg = cols[:, k, :].reshape(F * hop)
        out = out.at[k * hop : k * hop + F * hop].add(seg)
    return out[:total]


@functools.lru_cache(maxsize=32)
def _wss_semi_infinite(n_fft: int, hop: int, win_len: int, total: int) -> np.ndarray:
    """W[u] = sum_{f>=0} win2[u - f*hop] over u in [0, total), f64 -> f32.

    Enough frames are summed that no frame starting beyond `total` is
    truncated, so for any valid-frame count nf the exact masked
    window-sum-square of the OLA buffer is the two-term difference
        wss[j] = W[j] - W[j - nf*hop]   (second term 0 for j < nf*hop):
    the subtraction cancels every frame f >= nf exactly.  This replaces
    materializing + overlap-adding a [max_frames, n_fft] mask*win2 block
    per iSTFT call (a full extra pass over frame-block-sized data in a
    transform-pass-bound program) with two reads of a [total] constant.
    """
    win = hann_window(win_len).astype(np.float64)
    if win_len < n_fft:
        lpad = (n_fft - win_len) // 2
        win = np.pad(win, (lpad, n_fft - win_len - lpad))
    w2 = win * win
    W = np.zeros(total, dtype=np.float64)
    for f in range(-(-total // hop) + 1):
        lo = f * hop
        if lo >= total:
            break
        hi = min(lo + n_fft, total)
        W[lo:hi] += w2[: hi - lo]
    return W.astype(np.float32)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    length,
    cfg: StftConfig,
    out_len: int,
) -> jnp.ndarray:
    """Inverse STFT -> [out_len] buffer; samples beyond `length` are zeroed.

    Matches librosa.istft / torchlibrosa ISTFT: inverse transform each
    frame, window, overlap-add, divide by window-sum-square, trim `pad`
    and cut to `length`.

    real/imag: [max_frames, n_bins].  Caller must zero invalid frames
    (beyond n_frames_for_length) — they would otherwise bleed into the
    tail of valid audio. `out_len` is the static bucket length (Lmax).
    """
    from ssr_eval_tpu.dsp.fft_matmul import ct_levels, irfft_ct

    max_frames = real.shape[0]
    use_ct = ct_levels(cfg.n_fft) is not None and not _dense_pow2(cfg.n_fft)
    use_dense = not use_ct and (_use_matmul_dft(cfg.n_fft) or _dense_pow2(cfg.n_fft))
    fold = use_dense and _DENSE_FOLD
    if use_ct:
        fr = irfft_ct(real, imag, cfg.n_fft)
    elif fold:
        # Hermitian scale, 1/N and the synthesis window all live inside
        # the constant matrices (_idft_matrices_windowed) — two matmuls
        # replace two matmuls + three elementwise slab passes.
        from ssr_eval_tpu.dsp.precision import dsp_precision

        a_r, a_i = _idft_matrices_windowed(cfg.n_fft, cfg.win)
        _hi = dsp_precision()
        fr = jnp.dot(
            real, jnp.asarray(a_r), preferred_element_type=jnp.float32, precision=_hi
        ) + jnp.dot(
            imag, jnp.asarray(a_i), preferred_element_type=jnp.float32, precision=_hi
        )
    elif use_dense:
        wr, wi = _dft_matrices(cfg.n_fft)
        # Inverse rDFT via hermitian symmetry. Forward used ang = -2*pi*n*k/N,
        # so wr = cos(theta), wi = -sin(theta); x[n] = (1/N) * sum_k s_k *
        # (Re X_k cos(theta) - Im X_k sin(theta)) = (re*s) @ wr.T + (im*s) @ wi.T.
        scale = np.ones(cfg.n_bins, dtype=np.float32) * 2.0
        scale[0] = 1.0
        if cfg.n_fft % 2 == 0:
            scale[-1] = 1.0
        from ssr_eval_tpu.dsp.precision import dsp_precision

        _hi = dsp_precision()
        fr = (
            jnp.dot(real * jnp.asarray(scale), jnp.asarray(wr.T), preferred_element_type=jnp.float32, precision=_hi)
            + jnp.dot(imag * jnp.asarray(scale), jnp.asarray(wi.T), preferred_element_type=jnp.float32, precision=_hi)
        ) / cfg.n_fft
    else:
        fr = jnp.fft.irfft(real + 1j * imag, n=cfg.n_fft, axis=-1)
    if not fold:
        win = _padded_window64(cfg.n_fft, cfg.win)
        fr = fr * jnp.asarray(win.astype(np.float32))
    ola = _overlap_add(fr, cfg.hop)
    # Window-sum-square must count only the valid frames (< nf) or the tail
    # of a bucketed signal is normalized as if ghost frames contributed.
    # Closed form (see _wss_semi_infinite): wss = W - shift(W, nf*hop).
    nf = n_frames_for_length(cfg, length)
    total = int(ola.shape[0])
    Wnp = _wss_semi_infinite(cfg.n_fft, cfg.hop, cfg.win, total)
    W = jnp.asarray(Wnp)
    if _WSS_MODE == "slice":
        Wpad = jnp.asarray(np.concatenate([np.zeros(total, np.float32), Wnp]))
        shift = total - nf * cfg.hop
        wss = W - jax.lax.dynamic_slice(Wpad, (shift,), (total,))
        ola = jnp.where(wss > 1e-10, ola / jnp.where(wss > 1e-10, wss, 1.0), ola)
    else:
        # "patch": the subtracted term W[j - nf*hop] is zero for
        # j < nf*hop, and every output sample the caller keeps satisfies
        # pad + length - 1 < nf*hop + n_fft (nf > (length + 2*pad -
        # n_fft)/hop), so the full-buffer wss differs from the constant W
        # only on the static-size window [nf*hop, nf*hop + n_fft).
        # Divide by broadcast-constant W everywhere (fuses into the OLA
        # pass), then recompute that one window exactly — turning the
        # vmapped per-utterance [total] dynamic_slice (a sequential
        # 16-trip full-length copy loop on TPU, ~4 ms/call in the r5
        # device trace) into a patch 100x smaller.
        win_len = min(cfg.n_fft + cfg.hop, total)
        off = jnp.minimum(nf * cfg.hop, total - win_len)
        ola0 = jnp.where(W > 1e-10, ola / jnp.where(W > 1e-10, W, 1.0), ola)
        # Window values W[off + u], u in [0, win_len); zero-pad beyond total.
        Wext = jnp.asarray(np.concatenate([Wnp, np.zeros(win_len, np.float32)]))
        W_win = jax.lax.dynamic_slice(Wext, (off,), (win_len,))
        # Subtracted term at j = off + u is W[j - nf*hop] = Wnp[u - delta]
        # (zero for u < delta), delta := nf*hop - off.  delta == 0 except
        # when off clamps at total - win_len, where delta <= 2*hop (nf <=
        # max_frames); a 2*hop zero apron makes the shifted slice exact.
        apron = 2 * cfg.hop
        Zext = jnp.asarray(
            np.concatenate([np.zeros(apron, np.float32), Wnp[:win_len]])
        )
        delta = nf * cfg.hop - off
        sub = jax.lax.dynamic_slice(Zext, (apron - delta,), (win_len,))
        wss_win = W_win - sub
        ola_win = jax.lax.dynamic_slice(ola, (off,), (win_len,))
        patch = jnp.where(wss_win > 1e-10, ola_win / jnp.where(wss_win > 1e-10, wss_win, 1.0), ola_win)
        ola = jax.lax.dynamic_update_slice(ola0, patch, (off,))
    y = ola[cfg.pad : cfg.pad + out_len]
    if y.shape[0] < out_len:
        y = jnp.pad(y, (0, out_len - y.shape[0]))
    mask = jnp.arange(out_len) < length
    return jnp.where(mask, y, 0.0)
