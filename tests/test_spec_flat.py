"""Spec-axis flattening (engine `spec_flat`) equivalence and gating.

Flat mode folds the fused program's spec axis into the leading batch dim
(one [B*S]-row vmap per stage — no lax.map state threading, the r4
trace's ~25% copy/DUS share).  Whatever the on-chip A/B verdict, results
must match the lax.map path: same per-row math, only the batching
differs (fusion regrouping may move low bits).
"""

import numpy as np
import pytest

from ssr_eval_tpu.degrade.plan import expand_settings
from ssr_eval_tpu.harness.engine import EvalEngine, _spec_flat
from ssr_eval_tpu.harness.fixtures import speechlike
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.io.audio import write_wav

SR = 44100


def _dataset(tmp_path, n):
    paths = []
    for i in range(n):
        x = speechlike(1.0, SR, seed=500 + i)
        p = str(tmp_path / f"u{i:02d}.wav")
        write_wav(p, x, SR)
        paths.append(p)
    return paths


def _engine(specs, flat, **kw):
    kw.setdefault("testee", BatchedTestee())
    kw.setdefault("batch_size", 2)
    # pin the loop structure under test (cheap testees otherwise
    # auto-default to the single fused loop)
    kw.setdefault("spec_single", False)
    return EvalEngine(
        specs,
        input_sr=SR,
        output_sr=SR,
        evaluation_sr=SR,
        spec_flat=flat,
        **kw,
    )


def _flat_results(results):
    return {
        (p, k, m): v
        for p, r in results.items()
        for k, d in r.items()
        for m, v in d.items()
    }


def _assert_equivalent(r_map, r_flat, tol=1e-5):
    assert r_map.keys() == r_flat.keys()
    for key in r_map:
        assert r_map[key] == pytest.approx(r_flat[key], abs=tol), key


def test_flat_equals_lax_map_fft(tmp_path):
    paths = _dataset(tmp_path, 3)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2000, 4000, 8000]}, sr=SR
    )
    r_map = _flat_results(_engine(specs, flat=False).evaluate_files(paths))
    eng = _engine(specs, flat=True)
    r_flat = _flat_results(eng.evaluate_files(paths))
    _assert_equivalent(r_map, r_flat)
    # the flat program is a distinct compile-key entry
    assert [k for k in eng._cost_calls if k[0] == "fused" and ("flat",) in k]


def test_flat_iir_and_subsampling_families(tmp_path):
    """Stateful families: the IIR deg_pre-less filter plans and the
    subsampling resample chain must survive the [B*S] tiling."""
    paths = _dataset(tmp_path, 2)
    specs = expand_settings(
        setting_lowpass_filtering={
            "filter": ["butter"], "cutoff_freq": [3000, 6000],
            "filter_order": [6],
        },
        setting_subsampling={"cutoff_freq": [4000]},
        sr=SR,
    )
    r_map = _flat_results(_engine(specs, flat=False).evaluate_files(paths))
    r_flat = _flat_results(_engine(specs, flat=True).evaluate_files(paths))
    _assert_equivalent(r_map, r_flat)


def test_flat_fold_groups_and_remainder(tmp_path):
    """infer_fold_max below B*S forces the grouped lax.map infer path,
    with a padded remainder group (3 specs x batch 2 = 6 rows at
    fold 4 -> rows-per-group 4, groups 2, pad 2)."""
    paths = _dataset(tmp_path, 2)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2000, 4000, 8000]}, sr=SR
    )
    r_map = _flat_results(
        _engine(specs, flat=False, infer_fold_max=4).evaluate_files(paths)
    )
    r_flat = _flat_results(
        _engine(specs, flat=True, infer_fold_max=4).evaluate_files(paths)
    )
    _assert_equivalent(r_map, r_flat)


def test_flat_saved_audio_matches(tmp_path):
    """want_fused_audio path: the [S, B, Leval] reassembly from the flat
    layout must write the SAME processed wavs."""
    paths = _dataset(tmp_path, 2)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000, 8000]}, sr=SR)
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    for d in (out_a, out_b):
        d.mkdir()
    import shutil

    pa = [shutil.copy(p, out_a) for p in paths]
    pb = [shutil.copy(p, out_b) for p in paths]
    ra = _engine(specs, flat=False, save_processed_result=True,
                 test_name="t").evaluate_files(pa)
    rb = _engine(specs, flat=True, save_processed_result=True,
                 test_name="t").evaluate_files(pb)
    # same metrics (keyed by the copy-relative path pairs)
    _assert_equivalent(
        _flat_results(ra),
        {(pa[i], k, m): rb[pb[i]][k][m]
         for i in range(len(pa))
         for k in rb[pb[i]]
         for m in rb[pb[i]][k]},
    )
    from ssr_eval_tpu.io.audio import decode_audio

    for i in range(len(pa)):
        for s in specs:
            wa = pa[i] + s.key + "_processed_t.wav"
            wb = pb[i] + s.key + "_processed_t.wav"
            xa, _ = decode_audio(wa)
            xb, _ = decode_audio(wb)
            assert xa.shape == xb.shape
            np.testing.assert_allclose(xa, xb, atol=1e-5)


def test_flat_mesh_equals_unsharded(tmp_path):
    """Flat mode composes with the data mesh: the utterance-major merged
    dim keeps the sharded batch axis major, so sharded == unsharded."""
    import jax

    from ssr_eval_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    paths = _dataset(tmp_path, 4)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000, 8000]}, sr=SR)
    r_ref = _flat_results(
        _engine(specs, flat=True, batch_size=4).evaluate_files(paths)
    )
    r_mesh = _flat_results(
        _engine(
            specs, flat=True, batch_size=4, mesh=data_mesh(jax.devices()[:4])
        ).evaluate_files(paths)
    )
    _assert_equivalent(r_ref, r_mesh, tol=1e-4)


def test_single_equals_lax_map_all_families(tmp_path):
    """spec_single (one fused loop, per-spec B-row infer) must match the
    three-loop path across fft + IIR + subsampling."""
    paths = _dataset(tmp_path, 2)
    specs = expand_settings(
        setting_fft={"cutoff_freq": [2000, 8000]},
        setting_lowpass_filtering={
            "filter": ["butter"], "cutoff_freq": [6000], "filter_order": [6],
        },
        setting_subsampling={"cutoff_freq": [4000]},
        sr=SR,
    )
    r_map = _flat_results(_engine(specs, flat=False).evaluate_files(paths))
    eng = _engine(specs, flat=False, spec_single=True)
    r_one = _flat_results(eng.evaluate_files(paths))
    _assert_equivalent(r_map, r_one)
    assert [k for k in eng._cost_calls if k[0] == "fused" and ("single",) in k]


def test_single_saved_audio_and_mesh(tmp_path):
    """spec_single with saved audio (the [B, Leval] slice threads the
    loop) and under the data mesh."""
    import shutil

    import jax

    from ssr_eval_tpu.io.audio import decode_audio
    from ssr_eval_tpu.parallel.mesh import data_mesh

    paths = _dataset(tmp_path, 2)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000, 8000]}, sr=SR)
    out_a = tmp_path / "sa"
    out_b = tmp_path / "sb"
    for d in (out_a, out_b):
        d.mkdir()
    pa = [shutil.copy(p, out_a) for p in paths]
    pb = [shutil.copy(p, out_b) for p in paths]
    ra = _engine(specs, flat=False, save_processed_result=True,
                 test_name="t").evaluate_files(pa)
    rb = _engine(specs, flat=False, spec_single=True,
                 save_processed_result=True, test_name="t").evaluate_files(pb)
    for i in range(len(pa)):
        for s in specs:
            assert ra[pa[i]][s.key] == pytest.approx(
                rb[pb[i]][s.key], abs=1e-5
            )
            xa, _ = decode_audio(pa[i] + s.key + "_processed_t.wav")
            xb, _ = decode_audio(pb[i] + s.key + "_processed_t.wav")
            np.testing.assert_allclose(xa, xb, atol=1e-5)
    if len(jax.devices()) >= 2:
        r_mesh = _flat_results(
            _engine(
                specs, flat=False, spec_single=True, batch_size=2,
                mesh=data_mesh(jax.devices()[:2]),
            ).evaluate_files(paths)
        )
        _assert_equivalent(
            _flat_results(
                _engine(specs, flat=False, spec_single=True).evaluate_files(paths)
            ),
            r_mesh,
            tol=1e-4,
        )


def test_flat_default_env_and_precedence(monkeypatch):
    """Default off; env turns it on when the ctor leaves None; flat wins
    over unroll in the compile key."""
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=SR)
    monkeypatch.delenv("SSR_EVAL_TPU_SPEC_FLAT", raising=False)
    assert _spec_flat() is False
    assert _engine(specs, flat=None).spec_flat is False
    assert _engine(specs, flat=True).spec_flat is True
    monkeypatch.setenv("SSR_EVAL_TPU_SPEC_FLAT", "1")
    assert _engine(specs, flat=None).spec_flat is True
    assert _engine(specs, flat=False).spec_flat is False
    eng = _engine(specs, flat=True)
    eng.spec_unroll = 4
    key = eng._fused_key(("fft",), SR, 1024)
    assert ("flat",) in key and not any(
        isinstance(p, tuple) and p and p[0] == "unroll" for p in key
    )
    # single wins over flat and unroll in the key
    eng.spec_single = True
    key = eng._fused_key(("fft",), SR, 1024)
    assert ("single",) in key and ("flat",) not in key

    # auto default: cheap testees (identity BatchedTestee) pick the
    # single loop; model-hinted testees keep the folded-call loop; any
    # explicit structure request suppresses the auto.
    monkeypatch.delenv("SSR_EVAL_TPU_SPEC_FLAT", raising=False)
    monkeypatch.delenv("SSR_EVAL_TPU_SPEC_SINGLE", raising=False)
    auto = EvalEngine(
        specs, input_sr=SR, output_sr=SR, evaluation_sr=SR,
        testee=BatchedTestee(), batch_size=2,
    )
    assert auto.spec_single is True

    class ModelHinted(BatchedTestee):
        infer_cost_hint = "model"

    assert EvalEngine(
        specs, input_sr=SR, output_sr=SR, evaluation_sr=SR,
        testee=ModelHinted(), batch_size=2,
    ).spec_single is False
    assert _engine(specs, flat=True, spec_single=None).spec_single is False
    assert _engine(specs, flat=False, spec_unroll=2,
                   spec_single=None).spec_single is False
    monkeypatch.setenv("SSR_EVAL_TPU_SPEC_SINGLE", "0")
    auto2 = EvalEngine(
        specs, input_sr=SR, output_sr=SR, evaluation_sr=SR,
        testee=BatchedTestee(), batch_size=2,
    )
    assert auto2.spec_single is False
