"""On-chip A/B: UNet generator conv layout — NHWC (shipped) vs NCHW.

VERDICT r4 #4: the UNet stage runs at 42% MFU and no conv-layout
experiment had been attempted.  The physically-motivated candidate is
NCHW: the model's early levels are lane-starved in NHWC (C = 1 -> 32 in
the minor dim), while its frequency axis is 127-128 wide — exactly the
TPU lane width — so an NCHW layout (F minor) should fill the vector
lanes on the stem and first encoder levels.

This script builds an NCHW *pure-function* forward of UNetRes that
consumes the SAME variables tree as the shipped NHWC module (kernels
stay HWIO; lax.conv_general_dilated takes ("NCHW", "HWIO", "NCHW")
dimension numbers), verifies output equality off-chip, then times both
at the benched folded shapes ([112, 604, 128] mel rows, bf16)
interleaved in ONE process.  Prints a JSON summary.

Usage: python scripts/unet_layout_ab.py [rows t_frames] (default 112 604)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


# ---------------------------------------------------------------------------
# NCHW pure-function forward over the shipped NHWC variables tree
# ---------------------------------------------------------------------------

def _bn(x_nchw, stats, scale, bias, dtype, eps=1e-5):
    """Eval-mode BatchNorm over the channel axis (axis 1 in NCHW), with
    flax's dtype semantics (inputs cast to the computation dtype; the
    rsqrt itself on f32 stats, like flax's promote-then-cast)."""
    mean = stats["mean"].reshape(1, -1, 1, 1)
    var = stats["var"].reshape(1, -1, 1, 1)
    s = scale.reshape(1, -1, 1, 1)
    b = bias.reshape(1, -1, 1, 1)
    inv = (s * lax.rsqrt(var + eps)).astype(dtype)
    return (x_nchw.astype(dtype) - mean.astype(dtype)) * inv + b.astype(dtype)


def _conv(x_nchw, kernel_hwio, stride=(1, 1), padding="SAME", bias=None):
    y = lax.conv_general_dilated(
        x_nchw, kernel_hwio, window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1)
    return y


def _conv_transpose(x_nchw, kernel_hwio, stride=(2, 2), padding="VALID"):
    return lax.conv_transpose(
        x_nchw, kernel_hwio, strides=stride, padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )


def _block(x, p, s, dtype):
    """ConvBlockRes (unet.py): BN -> leaky -> conv1 -> BN -> leaky -> conv2
    (+ 1x1 shortcut when widths change)."""
    h = _bn(x, s["bn1"], p["bn1"]["scale"], p["bn1"]["bias"], dtype)
    h = jax.nn.leaky_relu(h, 0.01)
    h = _conv(h, p["conv1"]["kernel"].astype(dtype))
    h = _bn(h, s["bn2"], p["bn2"]["scale"], p["bn2"]["bias"], dtype)
    h = jax.nn.leaky_relu(h, 0.01)
    h = _conv(h, p["conv2"]["kernel"].astype(dtype))
    if "shortcut" in p:
        x = _conv(x.astype(dtype), p["shortcut"]["kernel"].astype(dtype),
                  bias=p["shortcut"]["bias"].astype(dtype))
    return x.astype(dtype) + h


def _avg_pool(x):
    zero = jnp.zeros((), x.dtype)
    return lax.reduce_window(
        x, zero, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) * jnp.asarray(0.25, x.dtype)


def unet_nchw_apply(variables, x_btfc, widths=(32, 64, 128, 256, 384, 384),
                    blocks=4, dtype=jnp.bfloat16):
    """NCHW forward matching UNetRes.__call__ (eval mode) bit-for-bit in
    math; input/output stay [B, T, F, C] at the boundary."""
    p = variables["params"]
    s = variables["batch_stats"]
    if "analysis_module" in p:  # nested under Generator
        p = p["analysis_module"]
        s = s["analysis_module"]
    origin_len = x_btfc.shape[1]
    ratio = 2 ** len(widths)
    pad_len = -origin_len % ratio
    x = jnp.pad(x_btfc, ((0, 0), (0, pad_len), (0, 0), (0, 0)))
    x = x[:, :, : x.shape[2] - 1, :]
    h = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW (T=H, F=W)

    skips = []
    for i in range(len(widths)):
        g = f"encoder_block{i + 1}"
        for j in range(blocks):
            h = _block(h, p[g][f"conv_block{j + 1}"], s[g][f"conv_block{j + 1}"], dtype)
        skips.append(h)
        h = _avg_pool(h)
    h = _block(h, p["conv_block7"], s["conv_block7"], dtype)
    for i in range(len(widths)):
        g = f"decoder_block{i + 1}"
        hb = _bn(h, s[g]["bn1"], p[g]["bn1"]["scale"],
                 p[g]["bn1"]["bias"], dtype)
        hb = jax.nn.relu(hb)
        hb = _conv_transpose(hb, p[g]["conv1"]["kernel"].astype(dtype))
        hb = hb[:, :, :-1, :]  # prune last time row (axis 2 = T in NCHW)
        h = jnp.concatenate([hb, skips[-(i + 1)]], axis=1)
        for j in range(blocks):
            h = _block(h, p[g][f"conv_block{j + 2}"], s[g][f"conv_block{j + 2}"], dtype)
    h = _block(h, p["after_conv_block1"], s["after_conv_block1"], dtype)
    h = _conv(h, p["after_conv2"]["kernel"].astype(dtype),
              bias=p["after_conv2"]["bias"].astype(dtype))
    h = h.astype(jnp.float32)
    h = jnp.transpose(h, (0, 2, 3, 1))  # back to [B, T, F, C]
    h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return h[:, :origin_len, :, :]


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 112
    t_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 604
    from ssr_eval_tpu.models.unet import UNetRes

    dtype = jnp.bfloat16
    model = UNetRes(channels=1, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        small = jax.random.normal(rng, (2, 36, 128, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), small, False)

        # equality check off-chip (small shape)
        ref = model.apply(variables, small, False)["mel"]
        got = unet_nchw_apply(variables, small, dtype=dtype)
        d = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
    print(f"[check] max |NCHW - NHWC| = {d:.3e} (max |ref| {scale:.3e})",
          flush=True)
    assert d <= 5e-2 * max(scale, 1.0), "layout variant diverges"

    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    x = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((rows, t_frames, 128, 1))
        .astype(np.float32),
        dev,
    )

    fns = {
        "nhwc": jax.jit(lambda v, xx: model.apply(v, xx, False)["mel"]),
        "nchw": jax.jit(functools.partial(unet_nchw_apply, dtype=dtype)),
    }
    for name, fn in fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(variables, x)[0, 0, 0])
        print(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    K = 6
    t1 = {n: None for n in fns}
    tK = {n: None for n in fns}
    for rep in range(4):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(variables, x)[0, 0, 0])
            dt = time.perf_counter() - t0
            t1[name] = dt if t1[name] is None else min(t1[name], dt)
            t0 = time.perf_counter()
            outs = [fn(variables, x) for _ in range(K)]
            np.asarray(outs[-1][0, 0, 0])
            dt = time.perf_counter() - t0
            tK[name] = dt if tK[name] is None else min(tK[name], dt)
        print(
            f"[rep {rep}] marginal ms/call: "
            + ", ".join(
                f"{n}={(tK[n] - t1[n]) / (K - 1) * 1e3:.1f}" for n in fns
            ),
            flush=True,
        )

    marg = {n: round((tK[n] - t1[n]) / (K - 1) * 1e3, 2) for n in fns}
    out = {
        "shape": [rows, t_frames, 128, 1],
        "dtype": "bf16",
        "one_call_ms": {n: round(t1[n] * 1e3, 2) for n in fns},
        "pipelined_marginal_ms_per_call": marg,
        "nchw_speedup": round(marg["nhwc"] / marg["nchw"], 4),
        "k": K,
        "max_abs_delta_small_shape": d,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
