"""Exact compiled-program cost accounting (FLOPs / bytes) for MFU and
roofline reporting.

The task's perf bar is a hardware denominator, not a NumPy one: "is this
fast?" needs TFLOP/s against chip peak and GB/s against HBM peak.  XLA
already knows the exact per-call FLOP and HBM-traffic numbers for every
compiled program — `jit(f).lower(args).compile().cost_analysis()` — so no
hand model is needed.  `EvalEngine` records the abstract arg shapes of
every program it dispatches; `engine_program_costs` re-lowers them (a
cache hit with the persistent compilation cache) and returns the costs,
and `chip_peaks` maps the local device kind to datasheet peaks.

Used by bench.py to emit {flops_per_utt, tflops_per_s, mfu_vs_peak,
hbm_gbps, pct_of_hbm_peak} next to every throughput number
(VERDICT r2 next-round #1).
"""

from __future__ import annotations

import jax


def abstractify(tree):
    """Pytree of arrays -> pytree of ShapeDtypeStructs (no buffer refs)."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )


def compiled_cost(jitted, args) -> dict:
    """{"flops": float, "bytes_accessed": float} for ONE call of `jitted`
    with abstract `args` (a tuple).  Missing keys report -1.0."""
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", -1.0)),
        "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
    }


# Datasheet peaks per chip: (dense bf16 TFLOP/s, HBM GB/s).  float32
# has no MXU datasheet number — XLA runs f32 matmuls as bf16 multi-pass
# (this repo's FFT/DFT matmuls request the benched default HIGH = 3
# passes, other DSP matmuls HIGHEST = 6; dsp/precision.py), so MFU is
# reported against the bf16 peak for every dtype: it is the one
# well-defined hardware ceiling.
_PEAKS = {
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v5": (459.0, 1228.0),       # v5p
    "TPU v5p": (459.0, 1228.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v6 lite": (918.0, 1640.0),
    "TPU v6e": (918.0, 1640.0),
    "TPU v3": (123.0, 900.0),
}


def chip_peaks(device=None) -> dict:
    """{"device_kind", "bf16_tflops", "hbm_gbps"} for the local chip
    (unknown kinds report peaks as None rather than guessing)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "unknown")
    tf, bw = _PEAKS.get(kind, (None, None))
    return {"device_kind": kind, "bf16_tflops": tf, "hbm_gbps": bw}


def engine_program_costs(engine) -> dict:
    """Per-program costs for every device program an EvalEngine has
    dispatched: {label: {"flops", "bytes_accessed", "calls"}}."""
    out = {}
    for key, (fn, args) in getattr(engine, "_cost_args", {}).items():
        # Full key in the label: distinct programs (per native_sr/bucket)
        # must not collapse onto one entry.
        label = "_".join(str(p) for p in key)
        c = compiled_cost(fn, args)
        c["calls"] = engine._cost_calls.get(key, 0)
        out[label] = c
    return out


def utilization(flops_per_call, bytes_per_call, calls_per_s, peaks) -> dict:
    """Throughput + peaks -> {tflops_per_s, mfu_vs_bf16_peak, hbm_gbps,
    pct_of_hbm_peak} (None entries where the peak is unknown)."""
    tflops = flops_per_call * calls_per_s / 1e12
    gbps = bytes_per_call * calls_per_s / 1e9
    out = {"tflops_per_s": round(tflops, 3), "hbm_gbps": round(gbps, 2)}
    if peaks.get("bf16_tflops"):
        out["mfu_vs_bf16_peak"] = round(tflops / peaks["bf16_tflops"], 4)
    if peaks.get("hbm_gbps"):
        out["pct_of_hbm_peak"] = round(100.0 * gbps / peaks["hbm_gbps"], 2)
    return out
