"""On-chip A/B: packed wire codec vs raw int16 H2D on the headline sweep.

Interleaves raw/wire timed passes in ONE process (cross-process timing
through the tunnel is weather-dominated — CLAUDE.md), same dataset, same
engines-warm protocol as bench.py's headline.  Prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import bench  # noqa: E402  (constants + dataset/engine builders)
from ssr_eval_tpu.degrade.plan import expand_settings  # noqa: E402
from ssr_eval_tpu.harness.testee import BatchedTestee  # noqa: E402


def _make_dataset_gain(root, n, gain):
    """bench fixture at a headroom gain (real recordings sit well below
    full scale; the stock fixture is near-full-scale and needs 15-bit
    residuals, so it never packs)."""
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav

    paths = []
    for i in range(n):
        x = gain * speechlike(bench.UTT_SECONDS, bench.SR, seed=1000 + i)
        p = os.path.join(root, f"utt_{i:03d}.wav")
        write_wav(p, x, bench.SR)
        paths.append(p)
    return paths


def main():
    gain = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    tmp = tempfile.mkdtemp(prefix="ssr_wire_ab_")
    paths = _make_dataset_gain(tmp, bench.N_UTTS, gain)
    print(f"[dataset] gain {gain}", flush=True)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in bench.CUTOFFS]}, sr=bench.SR
    )
    engines = {
        "raw": bench._engine(specs, BatchedTestee(), wire_codec=False),
        "wire": bench._engine(specs, BatchedTestee(), wire_codec=True),
    }
    results = {}
    for name, eng in engines.items():
        t0 = time.perf_counter()
        results[name] = eng.evaluate_files(paths[: bench.BATCH])  # compile
        print(f"[{name}] warm {time.perf_counter() - t0:.1f}s", flush=True)

    # bit-identical check on the warm batch
    for p in paths[: bench.BATCH]:
        for key in results["raw"][p]:
            for m in results["raw"][p][key]:
                assert results["raw"][p][key][m] == results["wire"][p][key][m], (
                    p, key, m,
                )
    print("[check] wire metrics BIT-IDENTICAL to raw", flush=True)

    times = {"raw": [], "wire": []}
    stages = {}
    n_pass = 6
    for i in range(n_pass):
        for name, eng in engines.items():
            before = dict(eng.stats.seconds)
            t0 = time.perf_counter()
            eng.evaluate_files(paths)
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            if not times[name] or dt <= min(times[name]):
                after = dict(eng.stats.seconds)
                stages[name] = {
                    k: round(after.get(k, 0.0) - before.get(k, 0.0), 3)
                    for k in after
                }
            print(f"[pass {i}] {name}: {dt:.3f}s", flush=True)

    from ssr_eval_tpu.harness.engine import fused_key_has_wire

    wire_keys = [
        k for k in engines["wire"]._cost_args
        if k and k[0] == "fused" and fused_key_has_wire(k)
    ]
    wireplans = {
        str(k): v for k, v in engines["wire"]._compiled.items()
        if isinstance(k, tuple) and k and k[0] == "wireplan"
    }
    out = {
        "raw_s": times["raw"],
        "wire_s": times["wire"],
        "best_raw_s": min(times["raw"]),
        "best_wire_s": min(times["wire"]),
        "raw_utt_s": round(bench.N_UTTS / min(times["raw"]), 2),
        "wire_utt_s": round(bench.N_UTTS / min(times["wire"]), 2),
        "stages": stages,
        "packed_program_keys": [str(k) for k in wire_keys],
        "wire_plans": {
            k: {"bits": v.bits, "order": v.order,
                "wire_ratio": round(v.wire_ratio, 4)}
            for k, v in wireplans.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
