"""Lossless host->device wire codec for int16 audio batches.

Why: through a tunneled TPU runtime the evaluation sweep is HOST->DEVICE
WIRE-BOUND, not execution-bound — the fused headline program runs at
~85 ms/batch device-side while shipping its [B, 264600] int16 batch
costs several hundred ms of tunnel time (measured r4: 12 pipelined
fused calls on device-resident args take ~1.05 s vs ~1.9 s best /
3-6 s typical for the same pass with per-batch H2D; the raw PCM is
zlib-incompressible so the link cannot be compressing it).  Measured
disposition (r4, on-chip interleaved A/Bs — DESIGN.md dead ends):
DEFAULT OFF.  Near-full-scale material needs 15-bit residuals (outlier
samples dominate the batch-global width) and ships raw; quiet material
packs at 0.875x but the host-side pack (~0.31 s/batch) runs SERIAL on
the 1-core bench host and dwarfs the wire saving.  The codec is
correct, bit-exact, and cheap to refuse everywhere; enable it only on
a multi-core host (pack overlaps decode/dispatch) feeding a
high-latency link with quiet material, and measure.

Scheme (classic lossless-audio, FLAC-style, but TPU-decodable): the host
applies a fixed linear predictor (order 0/1/2 difference) and packs the
residuals at a fixed per-batch bit width chosen from the batch's max
|residual|; the device undoes the packing with STATIC-pattern word
shifts (32 samples pack into exactly `bits` uint32 words, so every lane
has a compile-time (word, shift) location — no gathers, which are
catastrophically slow on TPU for 1-D indexing) and undoes the predictor
with exact int32 cumulative sums.  Bit-exact: the unpacked float32
batch equals the raw int16 wire's `x / 32768` conversion bit for bit
(tests/test_wirecodec.py), so every downstream metric is unchanged.

Residuals beyond each row's true length are zeroed at pack time and the
reconstruction is re-masked after every cumsum, which (a) keeps the
order-2 integer path inside int32 (an unmasked constant tail would grow
linearly to ~2^31 at bench lengths) and (b) ships padding as zeros
regardless of the row's trailing sample.

Speech-shaped audio fits 12-14 bits after a 1st/2nd-order difference
(the 6 s bench fixture: 13 bits, a 0.8125x wire), quiet material less;
a batch whose residuals need >=15 bits ships raw (plan_for -> None).

The reference has no analogue (it never leaves the host); this replaces
nothing and changes nothing observable.  Engine wiring:
harness/engine.py dispatches packed batches when `wire_codec` is
enabled and `plan_for` finds a win.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_LANES = 32  # samples per pack group: 32 * bits == bits uint32 words


@dataclasses.dataclass(frozen=True)
class WirePlan:
    """Per-batch packing decision (static in the XLA program key)."""

    bits: int  # residual field width, 2..14
    order: int  # fixed-predictor order, 0..2
    length: int  # bucket length L (unpacked samples per row)

    @property
    def padded_length(self) -> int:
        return -(-self.length // _LANES) * _LANES

    @property
    def words_per_row(self) -> int:
        return (self.padded_length // _LANES) * self.bits

    @property
    def wire_ratio(self) -> float:
        """Packed bytes / raw int16 bytes (per padded row)."""
        return (self.words_per_row * 4) / (self.length * 2)


def _dead_mask(x: np.ndarray, lens) -> np.ndarray | None:
    if lens is None:
        return None
    return np.arange(x.shape[1])[None, :] >= np.asarray(lens)[:, None]


def _residuals(x: np.ndarray, lens, order: int) -> np.ndarray:
    """Order-`order` difference residuals, zeroed at/after each row's
    true length (the close-out spikes a zero-padded diff would create at
    the data->padding boundary must not inflate the bit width).

    Masking after EVERY diff is equivalent to masking once at the end
    for the live region (a live index only reads live neighbours) and
    both leave the dead region at exactly zero, so pack / plan_for /
    fits all agree on the same residual values."""
    dead = _dead_mask(x, lens)
    r = x.astype(np.int32)
    if dead is not None:
        r = np.where(dead, 0, r)
    for _ in range(order):
        r = np.diff(r, axis=1, prepend=0)
        if dead is not None:
            r = np.where(dead, 0, r)
    return r


def _bits_for(r: np.ndarray) -> int:
    m = int(np.abs(r).max(initial=0))
    # two's-complement range [-2^(b-1), 2^(b-1)-1]; +1 covers m == 2^k
    b = int(np.ceil(np.log2(m + 1))) + 1 if m else 2
    return max(2, b)


def plan_for(
    x: np.ndarray, lens=None, max_bits: int = 14, even_bits: bool = False
) -> WirePlan | None:
    """Pick (order, bits) minimizing wire bytes for an int16 batch, or
    None when no order beats the raw int16 wire (bits > max_bits).

    `even_bits` rounds the width UP to the next even value: each
    (bits, order) pair is a distinct XLA program (~30 s per compile on a
    tunneled runtime), so callers serving many batches ladder the widths
    to bound how many packed-entry programs a sweep can compile (the
    engine pairs this with a sticky per-bucket plan — see
    harness/engine.py _wire_plan_for)."""
    assert x.dtype == np.int16, x.dtype
    dead = _dead_mask(x, lens)
    r = x.astype(np.int32)
    if dead is not None:
        r = np.where(dead, 0, r)
    best = None
    for order in (0, 1, 2):
        if order:  # incremental: order-k residuals diff the order-(k-1)
            r = np.diff(r, axis=1, prepend=0)
            if dead is not None:
                r = np.where(dead, 0, r)
        b = _bits_for(r)
        if even_bits:
            b += b & 1
        if best is None or b < best[0]:
            best = (b, order)
    if best[0] > max_bits:
        return None
    return WirePlan(bits=best[0], order=best[1], length=int(x.shape[1]))


def fits(x: np.ndarray, lens, plan: WirePlan) -> bool:
    """True when `x`'s residuals under `plan.order` fit `plan.bits`
    (i.e. packing with the existing plan is exact — no new program)."""
    return (
        x.shape[1] == plan.length
        and _bits_for(_residuals(x, lens, plan.order)) <= plan.bits
    )


def pack(x: np.ndarray, lens, plan: WirePlan) -> np.ndarray:
    """int16 [B, L] -> packed uint32 [B, words_per_row]."""
    assert x.dtype == np.int16 and x.shape[1] == plan.length
    bits = plan.bits
    r = _residuals(x, lens, plan.order)
    offset = 1 << (bits - 1)
    u = (r + offset).astype(np.uint32)
    assert u.max(initial=0) < (1 << bits), "plan bits too small for batch"
    B = x.shape[0]
    Lp = plan.padded_length
    if Lp != plan.length:
        u = np.pad(u, ((0, 0), (0, Lp - plan.length)), constant_values=offset)
    G = Lp // _LANES
    u = u.reshape(B, G, _LANES)
    W = np.zeros((B, G, bits), np.uint32)
    for s in range(_LANES):
        bit0 = s * bits
        w0, sh = bit0 >> 5, bit0 & 31
        v = u[:, :, s]
        W[:, :, w0] |= (v << np.uint32(sh)).astype(np.uint32)
        if sh + bits > 32:
            W[:, :, w0 + 1] |= (v >> np.uint32(32 - sh)).astype(np.uint32)
    return W.reshape(B, G * bits)


def unpack_jax(packed, lens, plan: WirePlan):
    """packed uint32 [B, words_per_row] -> float32 [B, length], equal to
    the raw wire's `int16 / 32768` bit for bit (padding ships as 0).

    Pure static slices + elementwise integer ops + `order` exact int32
    cumsums; traced inside the fused evaluation program so XLA fuses the
    unpack into the pipeline's first passes.
    """
    import jax.numpy as jnp

    bits, order = plan.bits, plan.order
    B = packed.shape[0]
    G = plan.padded_length // _LANES
    W = packed.reshape(B, G, bits)
    mask = np.uint32((1 << bits) - 1)
    lanes = []
    for s in range(_LANES):
        bit0 = s * bits
        w0, sh = bit0 >> 5, bit0 & 31
        v = W[..., w0] >> np.uint32(sh)
        if sh + bits > 32:
            v = v | (W[..., w0 + 1] << np.uint32(32 - sh))
        lanes.append(v & mask)
    u = jnp.stack(lanes, axis=-1).reshape(B, G * _LANES)
    r = u.astype(jnp.int32) - (1 << (bits - 1))
    live = jnp.arange(G * _LANES)[None, :] < lens[:, None]
    for _ in range(order):
        # Re-mask after every cumsum: keeps the order-2 integer tail
        # from growing linearly past int32 AND ships padding as zeros.
        r = jnp.where(live, jnp.cumsum(r, axis=-1), 0)
    if order == 0:
        r = jnp.where(live, r, 0)
    x = r.astype(jnp.float32) * np.float32(1.0 / 32768.0)
    return x[:, : plan.length]


def unpack_np(packed: np.ndarray, lens, plan: WirePlan) -> np.ndarray:
    """NumPy mirror of unpack_jax (test oracle / host-side debugging)."""
    bits, order = plan.bits, plan.order
    B = packed.shape[0]
    G = plan.padded_length // _LANES
    W = packed.reshape(B, G, bits)
    mask = np.uint32((1 << bits) - 1)
    u = np.zeros((B, G, _LANES), np.uint32)
    for s in range(_LANES):
        bit0 = s * bits
        w0, sh = bit0 >> 5, bit0 & 31
        v = W[:, :, w0] >> np.uint32(sh)
        if sh + bits > 32:
            v = v | (W[:, :, w0 + 1] << np.uint32(32 - sh))
        u[:, :, s] = v & mask
    r = u.reshape(B, G * _LANES).astype(np.int32) - (1 << (bits - 1))
    live = np.arange(G * _LANES)[None, :] < np.asarray(lens)[:, None]
    for _ in range(order):
        r = np.where(live, np.cumsum(r, axis=-1), 0)
    if order == 0:
        r = np.where(live, r, 0)
    return (r.astype(np.float32) / 32768.0)[:, : plan.length]
