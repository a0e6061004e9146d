"""Benchmark: utterance-evaluation throughput on the VCTK LSD sweep.

Runs the full evaluation pipeline (decode -> degrade(fft sweep) ->
testee -> metrics x4) on real hardware through the public harness and
compares against a float64 NumPy/SciPy implementation of the reference
pipeline (what upstream ssr_eval does via librosa/scipy/torch on CPU —
deliberately conservative: the actual upstream additionally pays a sox
subprocess per file and a per-channel Python SSIM loop).

Prints ONE compact JSON line (the driver parses the last stdout line, so
it must stay short — r2's full-detail line overflowed the driver's parse
buffer):
  {"metric": "utterances/sec/chip (VCTK fft-sweep eval)",
   "value": ..., "unit": "utt/s/chip", "vs_baseline": ..., "detail": {...
   headline essentials ...}, "detail_file": "BENCH_DETAIL.json"}
and writes the FULL detail to BENCH_DETAIL.json next to this file.

Sections recorded in the detail file (VERDICT r1 tasks 2/3/4/6/9 + r2
next-round #1/#5/#6):
- headline: identity testee, FULL 2-32 kHz input-rate sweep (cutoffs
  1/2/4/6/8/12/16 kHz), best-of-N passes, disjoint per-stage seconds
  (decode / compile / dispatch / drain sum to ~the pass wall time).
- accuracy: per-cutoff |dLSD| across the full sweep with a
  well-conditioned (broadband-noise) testee vs the float64 oracle, plus
  a device-vs-host_float64 engine cross-check.
- nvsr: flagship-model line (random weights) — utt/s/chip + per-cutoff
  mean LSD through the fused engine.
- iir_subsampling_matrix: mixed-family sweep throughput (default-on).
- pallas_ab: |STFT| timing, ms per 8x266k batch — default XLA path
  (dense rDFT since the r5 rfft-mode flip) vs the selectable Pallas
  VMEM-butterfly CT kernel (the dense-DFT Pallas variant was retired
  in r4, VERDICT r3 #6).
- v5e8_extrapolated: vs_baseline x 8. Utterance-sweep evaluation is
  embarrassingly parallel over the 'data' mesh axis (no cross-chip
  collectives in the compiled program); the 8-way sharded path is
  validated on the virtual CPU mesh (tests/test_parallel.py) and by the
  driver's dryrun_multichip.
- utilization: exact FLOPs/bytes per compiled program (XLA
  cost_analysis via utils.flops) x measured calls/s -> TFLOP/s, MFU vs
  the chip's bf16 peak, and HBM GB/s vs peak — the hardware denominator
  for every throughput line (headline + NVSR f32/bf16).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

N_UTTS = 192
UTT_SECONDS = 6.0
SR = 44100
# Reference sweep (README.md:111 / BASELINE.md): input rates 2-32 kHz,
# i.e. cutoffs 1-16 kHz at 44.1 kHz.
CUTOFFS = [1000, 2000, 4000, 6000, 8000, 12000, 16000]
BATCH = 16
PASSES = 5
N_BASE = 6  # CPU-baseline / accuracy subsample

# SSR_BENCH_QUICK=1: tiny shapes for validating the bench *machinery*
# (output schema, cost accounting) — numbers are meaningless.
QUICK = os.environ.get("SSR_BENCH_QUICK", "0") not in ("0", "false", "")
if QUICK:
    N_UTTS, UTT_SECONDS, BATCH, PASSES, N_BASE = 8, 2.0, 4, 2, 2
    CUTOFFS = [2000, 8000]


def _make_dataset(root, n):
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav

    paths = []
    for i in range(n):
        x = speechlike(UTT_SECONDS, SR, seed=1000 + i)
        p = os.path.join(root, f"utt_{i:03d}.wav")
        write_wav(p, x, SR)
        paths.append(p)
    return paths


def _f64_pipeline_one(path, cutoffs, noise=None):
    """The reference pipeline for one utterance in float64 (oracle)."""
    from oracles import istft_np, lsd_np, sispec_np, ssim_np, stft_np

    from ssr_eval_tpu.io.audio import decode_audio

    x, _ = decode_audio(path)
    x = x.astype(np.float64)
    hop, n_fft = int(SR / 100), int(2048 / (44100 / SR))
    tgt_sp = np.abs(stft_np(x, n_fft, hop)).T
    out = {}
    for c in cutoffs:
        Z = stft_np(x, 2048, 441)
        Z[int(1025 * (c / int(SR / 2))) :, :] = 0.0
        est = istft_np(Z, 2048, 441, length=len(x))
        if noise is not None:
            est = est + noise.astype(np.float64)[np.arange(len(est)) % noise.shape[0]]
        est_sp = np.abs(stft_np(est, n_fft, hop)).T
        out[f"proc_fft_{2 * c}_{SR}"] = {
            "lsd": lsd_np(est_sp, tgt_sp),
            "log_sispec": sispec_np(
                np.log10(est_sp + 1e-12), np.log10(tgt_sp + 1e-12)
            ),
            "sispec": sispec_np(est_sp, tgt_sp),
            "ssim": ssim_np(est_sp, tgt_sp),
        }
    return out


def _make_noisy_testee(noise):
    import jax.numpy as jnp

    from ssr_eval_tpu.harness.testee import BatchedTestee

    class NoisyTestee(BatchedTestee):
        """Broadband-floor testee: est spectra sit far above any rounding
        floor, so dLSD vs the f64 oracle is correctness-meaningful
        (PARITY.md deviation 4)."""

        def device_state(self):
            return jnp.asarray(noise)

        def infer_batch(self, x, lengths, state=None):
            idx = jnp.arange(x.shape[1]) % state.shape[0]
            mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None]).astype(
                jnp.float32
            )
            return x.astype(jnp.float32) + state[idx][None, :] * mask, lengths

    return NoisyTestee()


def _engine(specs, testee, batch=BATCH, **kw):
    from ssr_eval_tpu.harness.engine import EvalEngine

    return EvalEngine(
        specs, input_sr=SR, output_sr=SR, evaluation_sr=SR,
        testee=testee, batch_size=batch, **kw,
    )


def _timed_passes(engine, paths, passes=PASSES):
    """Warm once, then best-of-N wall times + the best pass's stage delta.

    Warm-up compiles every program a timed pass will dispatch: one
    single-batch run forces the standalone per-batch fused program (also
    the cost-accounting / drain-split reference), then a full run
    compiles the K-stacked mega program when mega dispatch applies."""
    engine.evaluate_files(paths[: engine.batch_size])  # per-batch program
    engine.evaluate_files(paths)  # mega program (when applicable)
    best, best_stages, runs = None, None, []
    for _ in range(passes):
        before = dict(engine.stats.seconds)
        t0 = time.perf_counter()
        engine.evaluate_files(paths)
        dt = time.perf_counter() - t0
        runs.append(round(dt, 3))
        if best is None or dt < best:
            best = dt
            after = dict(engine.stats.seconds)
            best_stages = {
                k: round(after.get(k, 0.0) - before.get(k, 0.0), 4) for k in after
            }
    return best, best_stages, runs


def _pallas_ab():
    """ms per 8x266k-batch |STFT|: Pallas CT kernel vs the default XLA
    path (dense rDFT since r5; spectral._dense_pow2)."""
    import jax
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.spectral import StftConfig, stft_magnitude

    B, L, mf = 8, 266240, 604
    cfg = StftConfig(n_fft=2048, hop=441)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, L)).astype(np.float32)
    )
    n = jnp.full((B,), 264600, np.int32)
    R = 10

    def build():
        @jax.jit
        def run(x, n):
            acc = jnp.float32(0)
            for _ in range(R):
                sp = jax.vmap(
                    lambda xi, ni: stft_magnitude(xi + acc * 1e-20, ni, cfg, mf)
                )(x, n)
                acc = acc + sp[0, 0, 0]
            return acc

        return run

    out = {}
    for name, flag in (
        ("xla_default", "0"),
        ("pallas_ct", "ct"),
    ):
        os.environ["SSR_EVAL_TPU_PALLAS"] = flag
        f = build()
        np.asarray(f(x, n))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(x, n))
        out[name + "_ms"] = round((time.perf_counter() - t0) / 3 / R * 1e3, 2)
    os.environ.pop("SSR_EVAL_TPU_PALLAS", None)
    return out


def _drain_split(eng, peaks):
    """Split the headline drain into device-busy vs tunnel-wait
    (VERDICT r3 #1): time 1 blocked call vs K pipelined calls of the REAL
    compiled fused program on zero-filled args of the recorded shapes.

    marginal = (t_K - t_1) / (K - 1) is the per-call steady-state cost —
    device time if the device is the bottleneck, the per-call RPC floor
    if the tunnel is.  Compared against the roofline-ideal ms from the
    compiled cost model: marginal >> ideal ==> the residual drain is
    dispatch/RPC, not device work."""
    import jax
    import jax.numpy as jnp

    from ssr_eval_tpu.utils.flops import compiled_cost

    entries = [
        (k, v) for k, v in getattr(eng, "_cost_args", {}).items()
        if k and k[0] == "fused"
    ]
    if len(entries) != 1:
        return {"error": f"{len(entries)} fused programs (expected 1)"}
    key, (fn, aargs) = entries[0]
    args = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), aargs
    )

    def _force(o):
        m = o[0] if isinstance(o, tuple) else o
        return np.asarray(m)  # small [S,4,B] block; forces completion

    _force(fn(*args))  # warm (already compiled in the timed passes)
    t1 = None
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args))
        dt = time.perf_counter() - t0
        t1 = dt if t1 is None else min(t1, dt)
    K = 12
    tK = None
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(K)]
        _force(outs[-1])  # device streams are ordered: last waits for all
        dt = time.perf_counter() - t0
        tK = dt if tK is None else min(tK, dt)
    marginal_ms = (tK - t1) / (K - 1) * 1e3
    cost = compiled_cost(fn, aargs)
    ideal_ms = None
    if peaks.get("hbm_gbps") and cost["bytes_accessed"] > 0:
        ideal_ms = max(
            cost["bytes_accessed"] / (peaks["hbm_gbps"] * 1e9),
            cost["flops"] / (peaks["bf16_tflops"] * 1e12),
        ) * 1e3
    out = {
        "one_call_ms": round(t1 * 1e3, 2),
        "pipelined_marginal_ms_per_call": round(marginal_ms, 2),
        "roofline_ideal_ms_per_call": round(ideal_ms, 2) if ideal_ms else None,
        "k": K,
        "note": (
            "args are device-resident zeros, so the pipelined marginal IS "
            "program execution (r4: confirmed by the device trace, whose "
            "leaf-op sum matches it exactly); one_call - marginal is the "
            "per-dispatch tunnel latency overlapped away by async dispatch; "
            "marginal vs ideal is the effective-bandwidth gap of "
            "transform-pass-shaped traffic"
        ),
    }
    # Mega program (K batches per call): one call replaces K per-batch
    # RPCs, so its per-batch ms against the fused marginal above IS the
    # measured value of mega dispatch.
    mega = [
        (k, v) for k, v in getattr(eng, "_cost_args", {}).items()
        if k and k[0] == "mega"
    ]
    if len(mega) == 1:
        mkey, (mfn, maargs) = mega[0]
        margs = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), maargs
        )
        np.asarray(mfn(*margs))  # warm
        tm = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(mfn(*margs))
            dt = time.perf_counter() - t0
            tm = dt if tm is None else min(tm, dt)
        mk = int(mkey[-1])
        out["mega"] = {
            "one_call_ms": round(tm * 1e3, 2),
            "k_batches": mk,
            "ms_per_batch": round(tm / mk * 1e3, 2),
        }
    return out


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _dsp_precision_name() -> str:
    from ssr_eval_tpu.dsp.precision import dsp_precision

    return str(dsp_precision()).split(".")[-1].lower()


def main():
    if os.environ.get("SSR_BENCH_CPU", "0") not in ("0", "false", ""):
        # Machinery validation off-chip (pairs with SSR_BENCH_QUICK; the
        # env var JAX_PLATFORMS is ignored on this machine — CLAUDE.md).
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.testee import BatchedTestee

    n_chips = len(jax.devices())
    tmp = tempfile.mkdtemp(prefix="ssr_bench_")
    paths = _make_dataset(tmp, N_UTTS)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2 * c for c in CUTOFFS]}, sr=SR
    )

    from ssr_eval_tpu.utils.flops import (
        chip_peaks,
        engine_program_costs,
        utilization,
    )

    peaks = chip_peaks()

    def _engine_utilization(engine, n_utts, batch, elapsed_s):
        """PER-CHIP TFLOP/s + HBM GB/s for one timed pass of `engine`
        (uniform dataset -> one fused program; exact per-call XLA cost x
        the pass's call count, divided by n_chips like every thr line)."""
        try:
            if engine.mesh is not None:
                # Re-lowering from bare ShapeDtypeStructs drops shardings
                # (a fresh unsharded compile through the tunnel); skip
                # rather than report a different program's numbers.
                return {"skipped": "mesh run; unsharded re-lower differs"}
            costs = engine_program_costs(engine)
            fused = [c for k, c in costs.items() if k.startswith("fused")]
            if len(fused) != 1:
                return {"error": f"{len(fused)} fused programs (expected 1)"}
            calls = -(-n_utts // batch)
            u = utilization(
                fused[0]["flops"] * calls,
                fused[0]["bytes_accessed"] * calls,
                1.0 / elapsed_s / n_chips,
                peaks,
            )
            u["flops_per_utt"] = round(fused[0]["flops"] / batch)
            u["bytes_per_utt"] = round(fused[0]["bytes_accessed"] / batch)
            return u
        except Exception as e:  # cost_analysis is backend-dependent
            return {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- headline: identity testee, full sweep --------------------------
    _log("headline: compiling + timing identity fft sweep")
    eng = _engine(specs, BatchedTestee())
    elapsed, stages, runs = _timed_passes(eng, paths)
    thr = N_UTTS / elapsed / n_chips
    headline_util = _engine_utilization(eng, N_UTTS, BATCH, elapsed)
    _log("headline drain split (1 vs K pipelined calls)")
    try:
        drain_split = _drain_split(eng, peaks)
    except Exception as e:
        drain_split = {"error": f"{type(e).__name__}: {e}"[:200]}
    results = eng.evaluate_files(paths[:N_BASE])  # for the oracle delta

    # ---- CPU reference baseline (float64 NumPy, same sweep) -------------
    # PINNED (VERDICT r4 #3): the baseline is a property of the reference
    # pipeline + this host, not of the current run — re-measuring it every
    # bench on a contended 1-core host made vs_baseline swing with load.
    # First run on a given config measures best-of-2 and writes
    # BASELINE_F64.json; later runs reuse it (delete the file, or set
    # SSR_BENCH_REBASELINE=1, to re-measure on an idle host).  The oracle
    # metric VALUES are still computed fresh every run (accuracy deltas
    # below) — only the seconds are pinned.
    base_cfg = {
        "n_base": N_BASE, "utt_seconds": UTT_SECONDS, "sr": SR,
        "cutoffs": CUTOFFS,
    }
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_F64.json"
    )
    pinned = None
    if os.environ.get("SSR_BENCH_REBASELINE", "0") in ("0", "false", ""):
        try:
            with open(base_path) as f:
                cand = json.load(f)
            if cand.get("config") == base_cfg:
                pinned = cand
        except (OSError, ValueError):
            pinned = None
    _log("cpu baseline oracle" + (" (seconds pinned)" if pinned else ""))
    base_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        oracle = {p: _f64_pipeline_one(p, CUTOFFS) for p in paths[:N_BASE]}
        dt = time.perf_counter() - t0
        base_best = dt if base_best is None else min(base_best, dt)
        if pinned is not None:
            break  # one pass for the oracle VALUES; seconds come pinned
    if pinned is not None:
        base_utt_per_s = float(pinned["baseline_utt_per_s"])
    else:
        base_utt_per_s = 1.0 / (base_best / N_BASE)
        if not QUICK:
            with open(base_path, "w") as f:
                json.dump(
                    {
                        "config": base_cfg,
                        "baseline_utt_per_s": round(base_utt_per_s, 4),
                        "measured_best_of": 2,
                        "note": (
                            "float64 NumPy/SciPy reference pipeline, "
                            "utt/s on this host; pinned so vs_baseline "
                            "stops moving with host load (VERDICT r4 #3)"
                        ),
                    },
                    f,
                    indent=1,
                )

    # identity-testee delta vs the f64 oracle (floor-dominated in masked
    # bands — PARITY.md deviation 4; reported for transparency).
    per_key_dlsd_id = {}
    for p in paths[:N_BASE]:
        for key, ref in oracle[p].items():
            d = abs(results[p][key]["lsd"] - ref["lsd"])
            per_key_dlsd_id[key] = round(max(per_key_dlsd_id.get(key, 0.0), d), 4)

    # ---- accuracy: well-conditioned testee, FULL sweep, ALL 4 metrics ---
    rng_noise = np.random.default_rng(777)
    noise = (1e-3 * rng_noise.standard_normal(1 << 17)).astype(np.float32)
    _log("accuracy: well-conditioned sweep")
    noisy = _make_noisy_testee(noise)
    eng_wc = _engine(specs, noisy, batch=N_BASE)
    r_wc = eng_wc.evaluate_files(paths[:N_BASE])
    metric_names = ("lsd", "log_sispec", "sispec", "ssim")
    per_key_delta_wc = {}  # {key: {metric: max|device - f64 oracle|}}
    for p in paths[:N_BASE]:
        ref = _f64_pipeline_one(p, CUTOFFS, noise=noise)
        for key in ref:
            slot = per_key_delta_wc.setdefault(key, {m: 0.0 for m in metric_names})
            for m in metric_names:
                d = abs(r_wc[p][key][m] - ref[key][m])
                slot[m] = round(max(slot[m], d), 7)
    max_delta_wc = {
        m: max(v[m] for v in per_key_delta_wc.values()) for m in metric_names
    }
    max_dlsd_wc = max_delta_wc["lsd"]

    # cross-check: the shipped float64 host metric mode on the same sweep
    _log("accuracy: host_float64 cross-check")
    eng_h64 = _engine(specs, noisy, batch=N_BASE, metrics_backend="host_float64")
    r_h64 = eng_h64.evaluate_files(paths[:N_BASE])
    dev_vs_h64 = {m: 0.0 for m in metric_names}
    for p in paths[:N_BASE]:
        for key in r_h64[p]:
            for m in metric_names:
                dev_vs_h64[m] = round(
                    max(dev_vs_h64[m], abs(r_wc[p][key][m] - r_h64[p][key][m])), 7
                )

    # ---- NVSR flagship line (random weights), f32 + bf16 ----------------
    nvsr_detail = {}
    if os.environ.get("SSR_BENCH_NVSR", "1") not in ("0", "false"):
        try:
            _log("nvsr flagship line")
            import jax.numpy as jnp

            from ssr_eval_tpu.models.testees import NVSRTestee

            n_nv = 4 if QUICK else 32
            nv_cfg_bf16 = {"batch": 2, "fold": 4} if QUICK else {"batch": 16, "fold": 112}
            nv_cfg_f32 = {"batch": 2, "fold": 4} if QUICK else {"batch": 8, "fold": 56}

            def _nvsr_run(dtype, batch, fold, passes=2, fold_bn=False,
                          marginal=False):
                # Per-dtype best measured config (6 s bucket, real chip):
                # f32 batch 8 / fold 56 (one 56-row folded model call per
                # batch; fold 112 exhausts HBM in f32), bf16 batch 16 /
                # fold 112 (half-size activations fit the bigger fold).
                # vs batch 4 / fold 32: 10.7 -> 16.7 f32, 12.5 -> 24.0 bf16.
                nv = NVSRTestee(model_name="unet", dtype=dtype, fold_bn=fold_bn)
                eng_nv = _engine(specs, nv, batch=batch, infer_fold_max=fold)
                eng_nv.evaluate_files(paths[:batch])
                e_nv, r_nv = None, None
                for _ in range(passes):
                    t0 = time.perf_counter()
                    r_nv = eng_nv.evaluate_files(paths[:n_nv])
                    dt = time.perf_counter() - t0
                    e_nv = dt if e_nv is None else min(e_nv, dt)
                per_cut = {}
                for p in paths[:n_nv]:
                    for key, m in r_nv[p].items():
                        per_cut.setdefault(key, []).append(float(m["lsd"]))
                util = _engine_utilization(eng_nv, n_nv, batch, e_nv)
                if marginal:
                    # Weather-immune per-batch cost (VERDICT r4 #3): the
                    # pipelined marginal of the compiled fused program on
                    # device-resident args, comparable round over round.
                    try:
                        util["drain_split"] = _drain_split(eng_nv, peaks)
                    except Exception as e:
                        util["drain_split"] = {
                            "error": f"{type(e).__name__}: {e}"[:200]
                        }
                return (
                    round(n_nv / e_nv / n_chips, 3),
                    {k: float(np.mean(v)) for k, v in per_cut.items()},
                    util,
                )

            # bf16 is the benched default config (VERDICT r2 #2): it is
            # the recommended production dtype on TPU (f32 kept for the
            # accuracy cross-check and as the conservative fallback).
            # fold_bn default: OFF since r5.  Adjudicated by the
            # interleaved one-process A/B (scripts/foldbn_ab.py, real
            # chip, pipelined marginal on device-resident args): folded
            # 431.3 vs unfolded 432.9 ms/call = +0.36%, NEUTRAL (r3's
            # keep-threshold is 5%; r4's sequential whole-pass A/Bs that
            # swung +31%/-13%/+5.4% were tunnel weather).  The fold stays
            # available (fold_bn=True) and exactness-tested.
            thr_bf16, lsd_bf16, util_bf16 = _nvsr_run(
                jnp.bfloat16, **nv_cfg_bf16, marginal=True
            )
            thr_f32, lsd_f32, util_f32 = _nvsr_run(None, **nv_cfg_f32)
            nvsr_detail = {
                "dtype_default": "bf16",
                "utt_per_s_per_chip_bf16": thr_bf16,
                "fold_bn": (
                    "neutral (+0.36% marginal, interleaved on-chip A/B "
                    "r5 — scripts/foldbn_ab.py); default off"
                ),
                "utt_per_s_per_chip_f32": thr_f32,
                "utilization_bf16": util_bf16,
                "utilization_f32": util_f32,
                "max_abs_dLSD_bf16_vs_f32": round(
                    max(abs(lsd_f32[k] - lsd_bf16[k]) for k in lsd_f32), 6
                ),
                "weights": "random-init (pretrained ckpt unreachable offline)",
                "lsd_per_cutoff": {k: round(v, 3) for k, v in lsd_f32.items()},
            }
        except Exception as e:  # record, never kill the headline
            nvsr_detail = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- IIR + subsampling matrix (default-on) --------------------------
    mixed = expand_settings(
        setting_lowpass_filtering={
            "filter": ["cheby", "butter"],
            "cutoff_freq": [8000, 16000],
            "filter_order": [8],
        },
        setting_subsampling={"cutoff_freq": [8000]},
        sr=SR,
    )
    _log("iir/subsampling matrix")
    eng_mx = _engine(mixed, BatchedTestee())
    e_mx, _, _ = _timed_passes(eng_mx, paths[: N_UTTS // 2], passes=2)
    iir_detail = {
        "n_specs": len(mixed),
        "utt_per_s_per_chip": round((N_UTTS // 2) / e_mx / n_chips, 3),
    }

    # ---- MP3 family (in-process LAME codec, host edge) -------------------
    mp3_detail = {}
    try:
        from ssr_eval_tpu.degrade.codec import detect_backend

        backend = detect_backend()
        if backend is None:
            mp3_detail = {"skipped": "no codec available"}
        else:
            _log(f"mp3 family ({backend})")
            mp3_specs = expand_settings(
                setting_mp3_compression={"low_kbps": [32]}, sr=SR
            )
            eng_mp3 = _engine(mp3_specs, BatchedTestee(), batch=min(8, N_UTTS))
            n_mp3 = min(16, N_UTTS)
            eng_mp3.evaluate_files(paths[: min(8, N_UTTS)])
            e_mp3 = None
            for _ in range(2):
                t0 = time.perf_counter()
                eng_mp3.evaluate_files(paths[:n_mp3])
                dt = time.perf_counter() - t0
                e_mp3 = dt if e_mp3 is None else min(e_mp3, dt)
            mp3_detail = {
                "backend": backend,
                "utt_per_s_per_chip": round(n_mp3 / e_mp3 / n_chips, 3),
                "note": (
                    "codec-bound: LAME encode on a 1-core bench host; the "
                    "engine pipelines codec jobs against device compute "
                    "(codec_wait stage), so multi-core hosts overlap fully"
                ),
            }
    except Exception as e:
        mp3_detail = {"error": f"{type(e).__name__}: {e}"[:200]}

    if QUICK:
        pallas_ab = {"skipped": "SSR_BENCH_QUICK"}
    else:
        _log("pallas A/B")
        try:
            pallas_ab = _pallas_ab()
        except Exception as e:
            pallas_ab = {"error": f"{type(e).__name__}: {e}"[:200]}

    vs_baseline = thr / base_utt_per_s
    stage_sum = round(sum(stages.values()), 3) if stages else None
    full_detail = {
        "n_utts": N_UTTS,
        "batch": BATCH,
        "sweep": [f"fft@{c}" for c in CUTOFFS],
        "elapsed_s_best": round(elapsed, 3),
        "pass_times_s": runs,
        "stage_seconds_best_pass": stages,
        "stage_sum_vs_elapsed_s": [stage_sum, round(elapsed, 3)],
        "baseline_utt_per_s": round(base_utt_per_s, 4),
        "baseline_n_utts": N_BASE,
        "v5e8_extrapolated_vs_baseline": round(vs_baseline * 8, 1),
        "v5e8_extrapolation_basis": (
            "utterance-DP is collective-free; 8-way sharding validated on "
            "the virtual mesh (tests/test_parallel.py, dryrun_multichip)"
        ),
        "chip": peaks,
        "headline_utilization": headline_util,
        "headline_drain_split": drain_split,
        "max_abs_delta_wellconditioned": max_delta_wc,
        "per_key_delta_wellconditioned": per_key_delta_wc,
        "max_abs_delta_device_vs_host_float64": dev_vs_h64,
        "per_key_dLSD_identity_floor_dominated": per_key_dlsd_id,
        "nvsr": nvsr_detail,
        "iir_subsampling_matrix": iir_detail,
        "mp3": mp3_detail,
        "pallas_ab": pallas_ab,
        # FFT/DFT matmul bf16 pass policy in effect for this run
        # (dsp/precision.py; benched default "high" — DESIGN.md A/B)
        "dsp_precision": _dsp_precision_name(),
        "n_chips": n_chips,
        "backend": jax.default_backend(),
        # Cumulative over EVERYTHING this engine ran (warmup + all timed
        # passes + the oracle-delta run) — per-pass numbers live in
        # stage_seconds_best_pass / elapsed_s_best above.
        "engine_stats_cumulative_all_passes": eng.stats.summary(),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(full_detail, f, indent=1)
    _log(f"full detail -> {detail_path}")

    # The driver parses the LAST stdout line; keep it compact (the full
    # detail is in BENCH_DETAIL.json).
    print(
        json.dumps(
            {
                "metric": "utterances/sec/chip (VCTK fft-sweep eval)",
                "value": round(thr, 3),
                "unit": "utt/s/chip",
                "vs_baseline": round(vs_baseline, 2),
                "detail": {
                    "n_utts": N_UTTS,
                    "sweep_cutoffs_khz": [c / 1000 for c in CUTOFFS],
                    "elapsed_s_best": round(elapsed, 3),
                    "baseline_utt_per_s": round(base_utt_per_s, 4),
                    "v5e8_extrapolated_vs_baseline": round(vs_baseline * 8, 1),
                    "headline_utilization": headline_util,
                    # Weather-immune trend metrics (VERDICT r4 #3):
                    # pipelined marginal ms/batch of the compiled fused
                    # programs on device-resident args — compare these
                    # across rounds, not utt/s (tunnel-weather-dominated).
                    "headline_marginal_ms_per_batch": drain_split.get(
                        "pipelined_marginal_ms_per_call"
                    ),
                    "nvsr_marginal_ms_per_batch_bf16": (
                        (nvsr_detail.get("utilization_bf16") or {})
                        .get("drain_split", {})
                        .get("pipelined_marginal_ms_per_call")
                    ),
                    "baseline_pinned": pinned is not None,
                    "max_abs_delta_wellconditioned": max_delta_wc,
                    "nvsr_utt_per_s_per_chip_bf16": nvsr_detail.get(
                        "utt_per_s_per_chip_bf16"
                    ),
                    "nvsr_utt_per_s_per_chip_f32": nvsr_detail.get(
                        "utt_per_s_per_chip_f32"
                    ),
                    "nvsr_mfu_bf16": (nvsr_detail.get("utilization_bf16") or {}).get(
                        "mfu_vs_bf16_peak"
                    ),
                    "n_chips": n_chips,
                    "backend": jax.default_backend(),
                    "device_kind": peaks.get("device_kind"),
                },
                "detail_file": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
