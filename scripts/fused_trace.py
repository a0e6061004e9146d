"""Capture + aggregate a device trace of the headline fused program.

Re-runnable version of the r4 ad-hoc leaf-op analysis (DESIGN.md
"Device trace"): jax.profiler.trace around K warm fused calls on
device-resident args, then parse the XPlane protobuf (TF's
tsl.profiler protos, present in this image) and sum leaf-op durations
on the TPU device plane's "XLA Ops" line.  The leaf sum should match
the drain-split pipelined marginal — that equality is what proved the
marginal is device EXECUTION, not RPC floor.

Buckets mirror the DESIGN.md table so eras are comparable:
fusion / reduce_window / copy-reshape-DUS / reverse / rest.

Usage: python scripts/fused_trace.py [K, default 5]
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ssr_eval_tpu.degrade.plan import expand_settings  # noqa: E402
from ssr_eval_tpu.harness.testee import BatchedTestee  # noqa: E402


def _fused_program(eng):
    entries = [(k, v) for k, v in eng._cost_args.items() if k and k[0] == "fused"]
    assert len(entries) == 1, [k for k, _ in entries]
    _, (fn, aargs) = entries[0]
    args = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aargs)
    return fn, args


def _force(o):
    m = o[0] if isinstance(o, tuple) else o
    return np.asarray(m)


def _is_parent_span(name: str) -> bool:
    """while/conditional events on the "XLA Ops" line are PARENT spans whose
    duration already covers every op executed inside their body (the body ops
    appear as separate events on the same line) — summing them double-counts.
    The r5 single-fused-loop program puts ~90% of the call under one %while,
    which is how this surfaced (leaf sum 148 ms vs marginal 76)."""
    n = name.lower()
    return n.startswith("%while") or " while(" in n or n.startswith("%conditional")


def _short(name: str, limit: int = 160) -> str:
    """Trim an HLO long-name to something readable (the full while-op
    signature is ~2 KB of tuple shapes)."""
    return name if len(name) <= limit else name[:limit] + "..."


def _bucket(name: str) -> str:
    # Leaf metadata names are full HLO text ("%fusion.132 = f32[...]
    # fusion(...)"): normalize to the bare op name so the startswith
    # checks actually fire (r5 fix — '%'-prefixed fusions/reverses were
    # silently landing in "rest").
    n = name.lower().lstrip("%").split(" = ")[0]
    if "reduce-window" in n or "reduce_window" in n:
        return "reduce_window"
    if n.startswith("copy") or "copy-done" in n or n.startswith("reshape") or (
        "dynamic-update-slice" in n
    ) or n.startswith("bitcast"):
        return "copy/reshape/DUS"
    if n.startswith("reverse"):
        return "reverse"
    if n.startswith("fusion") or ".fusion" in n or n.startswith("loop_"):
        return "fusion"
    if n.startswith("convolution") or n.startswith("dot"):
        return "matmul/conv"
    return "rest"


def aggregate(xspace_path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xs.ParseFromString(f.read())
    out = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op = collections.Counter()
            for ev in line.events:
                per_op[meta.get(ev.metadata_id, "?")] += ev.duration_ps
            out[plane.name] = per_op
    return out


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    tmp = tempfile.mkdtemp(prefix="ssr_fused_trace_")
    paths = bench._make_dataset(tmp, bench.BATCH)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    eng = bench._engine(specs, BatchedTestee())
    eng.evaluate_files(paths)
    fn, args = _fused_program(eng)
    _force(fn(*args))  # warm

    # Marginal for the cross-check (same protocol as the drain split).
    t0 = time.perf_counter()
    _force(fn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(12)]
    _force(outs[-1])
    marginal_ms = (time.perf_counter() - t0 - t1) / 11 * 1e3

    trace_dir = tempfile.mkdtemp(prefix="ssr_trace_out_")
    with jax.profiler.trace(trace_dir):
        outs = [fn(*args) for _ in range(K)]
        _force(outs[-1])

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert pbs, f"no xplane.pb under {trace_dir}"
    per_plane = aggregate(pbs[0])
    assert per_plane, "no TPU plane with an 'XLA Ops' line found"
    (plane_name, per_op), = per_plane.items() if len(per_plane) == 1 else [
        max(per_plane.items(), key=lambda kv: sum(kv[1].values()))
    ]

    buckets = collections.Counter()
    parent_ms = 0.0
    leaf_ps = 0
    for name, ps in per_op.items():
        if _is_parent_span(name):
            parent_ms += ps / 1e9
            continue
        leaf_ps += ps
        buckets[_bucket(name)] += ps
    report = {
        "plane": plane_name,
        "k_calls": K,
        "leaf_sum_ms_per_call": round(leaf_ps / 1e9 / K, 2),
        "parent_while_spans_ms_per_call": round(parent_ms / K, 2),
        "pipelined_marginal_ms_per_call": round(marginal_ms, 2),
        "buckets_ms_per_call": {
            b: round(ps / 1e9 / K, 2) for b, ps in buckets.most_common()
        },
        "top_ops_ms_per_call": {
            _short(n): round(ps / 1e9 / K, 2)
            for n, ps in per_op.most_common(40)
            if not _is_parent_span(n)
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
