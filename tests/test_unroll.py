"""Spec-loop scan-unroll (engine `spec_unroll`) equivalence and gating.

Unrolling the fused program's spec-axis loops (`lax.scan(unroll=k)`
instead of `lax.map`) is a measured perf experiment against the loop
state-threading copies the r4 device trace books at ~25% of the fused
call (docs/DESIGN.md).  Whatever the A/B verdict, the results must be
equivalent to the lax.map path — same per-spec math, only the loop
lowering differs — including a remainder trip (S not divisible by k)."""

import pytest

from ssr_eval_tpu.degrade.plan import expand_settings
from ssr_eval_tpu.harness.engine import EvalEngine, _spec_unroll
from ssr_eval_tpu.harness.fixtures import speechlike
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.io.audio import write_wav

SR = 44100


def _dataset(tmp_path, n):
    paths = []
    for i in range(n):
        x = speechlike(1.0, SR, seed=300 + i)
        p = str(tmp_path / f"u{i:02d}.wav")
        write_wav(p, x, SR)
        paths.append(p)
    return paths


def _engine(specs, unroll, **kw):
    return EvalEngine(
        specs,
        input_sr=SR,
        output_sr=SR,
        evaluation_sr=SR,
        testee=BatchedTestee(),
        batch_size=2,
        spec_unroll=unroll,
        # pin the loop structure under test (cheap testees otherwise
        # auto-default to the single fused loop)
        spec_single=False,
        **kw,
    )


def _flat(results):
    return {
        (p, k, m): v
        for p, r in results.items()
        for k, d in r.items()
        for m, v in d.items()
    }


def test_unroll_equals_lax_map_with_remainder(tmp_path):
    """3 fft specs at unroll=2 -> one unrolled trip + a remainder trip;
    metrics must match the lax.map path (loop lowering only regroups
    fusions, so low-bit drift is the most that is tolerable)."""
    paths = _dataset(tmp_path, 3)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2000, 4000, 8000]}, sr=SR
    )
    r1 = _flat(_engine(specs, unroll=1).evaluate_files(paths))
    eng2 = _engine(specs, unroll=2)
    r2 = _flat(eng2.evaluate_files(paths))
    assert r1.keys() == r2.keys()
    for key in r1:
        assert r1[key] == pytest.approx(r2[key], abs=1e-5), key
    # the unrolled program is a distinct compile-key entry
    assert [k for k in eng2._cost_calls if k[0] == "fused" and ("unroll", 2) in k]


def test_unroll_full_and_iir_family(tmp_path):
    """Full unroll (k == S) across a stateful family (IIR lowpass uses a
    deg_pre context) must also match."""
    paths = _dataset(tmp_path, 2)
    specs = expand_settings(
        setting_lowpass_filtering={
            "filter": ["butter"], "cutoff_freq": [3000, 6000],
            "filter_order": [6],
        },
        sr=SR,
    )
    r1 = _flat(_engine(specs, unroll=1).evaluate_files(paths))
    r2 = _flat(_engine(specs, unroll=2).evaluate_files(paths))
    for key in r1:
        assert r1[key] == pytest.approx(r2[key], abs=1e-5), key


def test_unroll_default_and_env(monkeypatch):
    """Default is 1 (lax.map); ctor overrides env; env applies when the
    ctor leaves it None."""
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=SR)
    monkeypatch.delenv("SSR_EVAL_TPU_SPEC_UNROLL", raising=False)
    assert _spec_unroll() == 1
    assert _engine(specs, unroll=None).spec_unroll == 1
    assert _engine(specs, unroll=4).spec_unroll == 4
    monkeypatch.setenv("SSR_EVAL_TPU_SPEC_UNROLL", "3")
    assert _engine(specs, unroll=None).spec_unroll == 3
    assert _engine(specs, unroll=2).spec_unroll == 2
