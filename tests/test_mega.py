"""Mega-dispatch (K batches per device call) equivalence and gating.

The mega path exists to amortize the tunneled runtime's per-call RPC
floor (bench.py headline_drain_split: ~147 ms marginal per fused call vs
~35 ms roofline-ideal device time); K same-bucket batches ride one
`lax.map`-wrapped program.  Results must be identical to the per-batch
path — same fused body, same per-batch semantics — including leftover
(< K) batches, multiple spec families per dispatch, and mixed
length-buckets buffering independently."""

import os

import numpy as np
import pytest

from ssr_eval_tpu.degrade.plan import expand_settings
from ssr_eval_tpu.harness.engine import EvalEngine
from ssr_eval_tpu.harness.fixtures import speechlike
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.io.audio import write_wav

SR = 44100


def _dataset(tmp_path, seconds_list):
    paths = []
    for i, sec in enumerate(seconds_list):
        x = speechlike(sec, SR, seed=100 + i)
        p = str(tmp_path / f"u{i:02d}.wav")
        write_wav(p, x, SR)
        paths.append(p)
    return paths


def _engine(specs, mega, **kw):
    return EvalEngine(
        specs,
        input_sr=SR,
        output_sr=SR,
        evaluation_sr=SR,
        testee=BatchedTestee(),
        batch_size=2,
        mega_batches=mega,
        **kw,
    )


def _flat(results):
    return {
        (p, k, m): v
        for p, r in results.items()
        for k, d in r.items()
        for m, v in d.items()
    }


def test_mega_equals_per_batch_with_leftover(tmp_path):
    """5 batches at K=2 -> 2 mega dispatches + 1 leftover per-batch
    dispatch; two families -> two mega calls per group.  Metrics must
    match the per-batch path exactly."""
    paths = _dataset(tmp_path, [1.0] * 9)  # 9 utts -> 5 batches (last padded)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2000, 8000]},
        setting_lowpass_filtering={
            "filter": ["butter"], "cutoff_freq": [4000], "filter_order": [6]
        },
        sr=SR,
    )
    r_plain = _flat(_engine(specs, mega=0).evaluate_files(paths))
    eng = _engine(specs, mega=2)
    r_mega = _flat(eng.evaluate_files(paths))
    assert r_plain.keys() == r_mega.keys()
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_mega[key], abs=1e-6), key
    # The mega program was actually used: cost ledger has mega entries
    # with 2 calls per family, plus the leftover's per-batch program.
    mega_keys = [k for k in eng._cost_calls if k[0] == "mega"]
    assert len(mega_keys) == 2  # fft family + lowpass family
    assert all(eng._cost_calls[k] == 2 for k in mega_keys)
    fused_keys = [k for k in eng._cost_calls if k[0] == "fused"]
    assert all(eng._cost_calls[k] == 1 for k in fused_keys)


def test_mega_mixed_buckets_buffer_independently(tmp_path):
    """Different length-buckets must never share a mega stack."""
    paths = _dataset(tmp_path, [1.0, 1.0, 1.0, 1.0, 6.0, 6.0, 6.0, 6.0])
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=SR)
    r_plain = _flat(_engine(specs, mega=0).evaluate_files(paths))
    eng = _engine(specs, mega=2)
    r_mega = _flat(eng.evaluate_files(paths))
    for key in r_plain:
        assert r_plain[key] == pytest.approx(r_mega[key], abs=1e-6), key
    mega_keys = [k for k in eng._cost_calls if k[0] == "mega"]
    assert len(mega_keys) == 2  # one program per bucket
    assert {k[2] for k in mega_keys} == {SR}


def test_mega_gating(tmp_path):
    """Mega must disable itself wherever per-batch semantics are needed."""
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=SR)
    # explicit disable
    assert _engine(specs, mega=0)._mega_k(False) == 0
    assert _engine(specs, mega=1)._mega_k(False) == 0
    # enabled
    assert _engine(specs, mega=4)._mega_k(False) == 4
    # mp3 specs present -> per-batch host prep needed
    assert _engine(specs, mega=4)._mega_k(True) == 0
    # saved audio / host_float64 ground truth need the audio outputs
    assert _engine(specs, mega=4, save_processed_result=True)._mega_k(False) == 0
    assert (
        _engine(specs, mega=4, metrics_backend="host_float64")._mega_k(False) == 0
    )
    # env applies when the ctor leaves it None; default is OFF (the
    # on-chip A/B measured mega equal per-batch and worse end-to-end —
    # docs/DESIGN.md "Dead ends")
    eng = _engine(specs, mega=None)
    old = os.environ.pop("SSR_EVAL_TPU_MEGA", None)
    try:
        assert eng._mega_k(False) == 0
        os.environ["SSR_EVAL_TPU_MEGA"] = "3"
        assert eng._mega_k(False) == 3
        os.environ["SSR_EVAL_TPU_MEGA"] = "0"
        assert eng._mega_k(False) == 0
    finally:
        if old is None:
            os.environ.pop("SSR_EVAL_TPU_MEGA", None)
        else:
            os.environ["SSR_EVAL_TPU_MEGA"] = old


def test_mega_host_float64_results_unaffected(tmp_path):
    """The host_float64 backend (mega-ineligible) still runs cleanly with
    a mega_batches setting: same result keys, finite values, and no mega
    programs dispatched.  (No numeric device-vs-f64 comparison here: the
    identity testee's LSD is floor-dominated — PARITY.md deviation 4 —
    and bench.py owns the well-conditioned accuracy sweep.)"""
    paths = _dataset(tmp_path, [1.0] * 4)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=SR)
    r_dev = _flat(_engine(specs, mega=2).evaluate_files(paths))
    eng = _engine(specs, mega=2, metrics_backend="host_float64")
    r_h64 = _flat(eng.evaluate_files(paths))
    assert r_dev.keys() == r_h64.keys()
    assert all(np.isfinite(v) for v in r_h64.values())
    assert not [k for k in eng._cost_calls if k[0] == "mega"]
