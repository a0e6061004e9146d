"""End-to-end harness tests on a synthetic VCTK-layout fixture set,
validated against an independent float64 numpy/scipy pipeline that
re-implements the reference's evaluate_single path (eval.py:128-156)."""

import json
import os

import numpy as np
import pytest
from scipy.signal import resample_poly

import ssr_eval_tpu
from ssr_eval_tpu.harness.fixtures import SPEAKERS, ensure_synthetic_vctk
from ssr_eval_tpu.harness.smoke import test as smoke_test
from ssr_eval_tpu.harness.testee import BasicTestee, BatchedTestee
from ssr_eval_tpu.io.audio import decode_audio
from tests.oracles import istft_np, lsd_np, sispec_np, ssim_np, stft_np


@pytest.fixture(scope="module")
def vctk_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "vctk_test"
    ensure_synthetic_vctk(str(root), files_per_speaker=2)
    return str(root)


def _oracle_fft_eval(path, cutoff=12000, input_sr=44100, eval_sr=48000):
    """Reference pipeline in float64: load->degrade(fft)->resample->metrics."""
    x, nat = decode_audio(path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    x = x.astype(np.float64)
    x_in = resample_poly(x, input_sr // 300, nat // 300)  # gcd(44100,48000)=300
    target = x if nat == eval_sr else resample_poly(x, eval_sr, nat)
    # fft-mask degradation at ratio cutoff/ (sr/2)
    Z = stft_np(x_in, 2048, 441)
    cut = int(1025 * (cutoff / int(input_sr / 2)))
    Z[cut:, :] = 0.0
    deg = istft_np(Z, 2048, 441, length=len(x_in))
    # identity testee; output 44100 -> 48000
    est = resample_poly(deg, eval_sr // 300, input_sr // 300)
    min_len = min(len(est), len(target))
    est, target = est[:min_len], target[:min_len]
    hop, n_fft = int(eval_sr / 100), int(2048 / (44100 / eval_sr))
    est_sp = np.abs(stft_np(est, n_fft, hop)).T
    tgt_sp = np.abs(stft_np(target, n_fft, hop)).T
    return {
        "lsd": lsd_np(est_sp, tgt_sp),
        "log_sispec": sispec_np(np.log10(est_sp + 1e-12), np.log10(tgt_sp + 1e-12)),
        "sispec": sispec_np(est_sp, tgt_sp),
        "ssim": ssim_np(est_sp, tgt_sp),
    }


@pytest.fixture(scope="module")
def smoke_result(vctk_root, tmp_path_factory):
    wd = tmp_path_factory.mktemp("run")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        result = smoke_test(test_data_root=vctk_root, auto_download=False, batch_size=4)
    finally:
        os.chdir(cwd)
    return result, str(wd), vctk_root


def test_smoke_run_schema(smoke_result):
    """Result dict matches the reference JSON schema (SURVEY C20)."""
    result, wd, root = smoke_result
    for spk in SPEAKERS:
        assert spk in result
        for fname, dists in result[spk].items():
            assert fname.endswith(".flac")
            assert list(dists.keys()) == ["proc_fft_24000_44100"]
            assert set(dists["proc_fft_24000_44100"].keys()) == {
                "lsd", "log_sispec", "sispec", "ssim",
            }
    assert "each_speaker" in result and "averaged" in result
    assert "proc_fft_24000_44100" in result["averaged"]
    # a results/<timestamp>-unprocessed.json was written
    files = [
        f for f in os.listdir(os.path.join(wd, "results"))
        if f.endswith("-unprocessed.json")
    ]
    assert files  # the timestamped JSON (the journal .jsonl sits alongside)
    with open(os.path.join(wd, "results", files[0])) as f:
        j = json.load(f)
    assert j["averaged"].keys() == result["averaged"].keys()


def test_smoke_matches_float64_oracle(smoke_result):
    """Per-file metrics within tolerance of the independent f64 pipeline."""
    result, wd, root = smoke_result
    checked = 0
    for spk in SPEAKERS[:3]:
        for fname, dists in result[spk].items():
            ref = _oracle_fft_eval(os.path.join(root, spk, fname))
            got = dists["proc_fft_24000_44100"]
            assert abs(got["lsd"] - ref["lsd"]) < 5e-3, (fname, got["lsd"], ref["lsd"])
            assert abs(got["ssim"] - ref["ssim"]) < 2e-3, fname
            assert abs(got["sispec"] - ref["sispec"]) < 0.1, fname
            assert abs(got["log_sispec"] - ref["log_sispec"]) < 0.1, fname
            checked += 1
    assert checked == 6


def test_processed_results_saved(smoke_result):
    result, wd, root = smoke_result
    spk = SPEAKERS[0]
    d = os.path.join(root, spk)
    # Naming parity: <orig-path><key>_processed_<test_name>.wav (eval.py:137)
    saved = [f for f in os.listdir(d) if f.endswith("_processed_unprocessed.wav")]
    assert len(saved) == 2
    assert all("proc_fft_24000_44100" in f for f in saved)


def test_rerun_skips_processed_files(smoke_result, vctk_root):
    """Files containing 'proc' are excluded from the test list
    (reference eval.py:158-169)."""
    result, wd, root = smoke_result
    helper = ssr_eval_tpu.SSR_Eval_Helper(
        BasicTestee(),
        input_sr=44100,
        output_sr=44100,
        evaluation_sr=48000,
        test_data_root=vctk_root,
        setting_fft={"cutoff_freq": [12000]},
        auto_download=False,
    )
    files = helper.get_test_file_list(os.path.join(vctk_root, SPEAKERS[0]))
    assert len(files) == 2
    assert all("proc" not in f for f in files)


def test_batched_testee_fused_path(vctk_root, tmp_path):
    """BatchedTestee (device identity) produces the same metrics as the
    host-bridged BasicTestee."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        kwargs = dict(
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [8000]},
            auto_download=False,
            batch_size=2,
        )
        r_host = ssr_eval_tpu.SSR_Eval_Helper(
            BasicTestee(), test_name="host", **kwargs
        ).evaluate(limit_test_nums=1, limit_test_speaker=2)
        r_dev = ssr_eval_tpu.SSR_Eval_Helper(
            BatchedTestee(), test_name="dev", **kwargs
        ).evaluate(limit_test_nums=1, limit_test_speaker=2)
    finally:
        os.chdir(cwd)
    for spk in r_host:
        if spk in ("each_speaker", "averaged"):
            continue
        for f in r_host[spk]:
            for m in ("lsd", "ssim", "sispec", "log_sispec"):
                a = r_host[spk][f]["proc_fft_16000_44100"][m]
                b = r_dev[spk][f]["proc_fft_16000_44100"][m]
                assert abs(a - b) < 1e-4, (spk, f, m, a, b)


def test_limit_semantics(vctk_root, tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = ssr_eval_tpu.SSR_Eval_Helper(
            BasicTestee(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [4000]},
            auto_download=False,
            test_name="lim",
        ).evaluate(limit_test_nums=1, limit_test_speaker=3)
    finally:
        os.chdir(cwd)
    speakers = [k for k in r if k not in ("each_speaker", "averaged")]
    assert len(speakers) == 3
    assert all(len(r[s]) == 1 for s in speakers)


def test_additional_metrics_tuple_protocol(vctk_root, tmp_path):
    """infer may return (audio, dict) — extra metrics merge into results
    (reference eval.py:139-143)."""

    class Extra(BasicTestee):
        def infer(self, x):
            return x, {"my_metric": 42.0}

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = ssr_eval_tpu.SSR_Eval_Helper(
            Extra(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [4000]},
            auto_download=False,
            test_name="extra",
        ).evaluate(limit_test_nums=1, limit_test_speaker=1)
    finally:
        os.chdir(cwd)
    spk = [k for k in r if k not in ("each_speaker", "averaged")][0]
    entry = list(r[spk].values())[0]["proc_fft_8000_44100"]
    assert entry["my_metric"] == 42.0
    assert r["averaged"]["proc_fft_8000_44100"]["my_metric"] == 42.0


def test_postprocessing_splice(vctk_root):
    """BasicTestee.postprocessing splices GT low band into the output."""
    path = os.path.join(vctk_root, "p360", "p360_000_mic1.flac")
    x, sr = decode_audio(path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    x = x[:32768].astype(np.float32)
    t = BasicTestee()
    noisy = (x + 0.1 * np.random.default_rng(0).standard_normal(len(x))).astype(
        np.float32
    )
    out = t.postprocessing(x, noisy)
    assert out.shape == noisy.shape
    # low band should now be much closer to the ground truth than noisy was
    Z_out = stft_np(out.astype(np.float64), 2048, 512)
    Z_gt = stft_np(x.astype(np.float64), 2048, 512)
    Z_noisy = stft_np(noisy.astype(np.float64), 2048, 512)
    cut = t._get_cutoff_index(x)
    assert cut > 10
    low_err_out = np.abs(Z_out[: cut - 2] - Z_gt[: cut - 2]).mean()
    low_err_noisy = np.abs(Z_noisy[: cut - 2] - Z_gt[: cut - 2]).mean()
    assert low_err_out < 0.25 * low_err_noisy


def test_kaiser_best_input_path(vctk_root, tmp_path):
    """input_res_type='kaiser_best' (librosa.load parity) runs end-to-end
    and lands near the polyphase default (both are ~transparent filters)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        kwargs = dict(
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [8000]},
            auto_download=False,
        )
        r_poly = ssr_eval_tpu.SSR_Eval_Helper(
            BasicTestee(), test_name="poly", **kwargs
        ).evaluate(limit_test_nums=1, limit_test_speaker=1, verbose=False)
        r_kb = ssr_eval_tpu.SSR_Eval_Helper(
            BasicTestee(), test_name="kb", input_res_type="kaiser_best", **kwargs
        ).evaluate(limit_test_nums=1, limit_test_speaker=1, verbose=False)
    finally:
        os.chdir(cwd)
    a = r_poly["averaged"]["proc_fft_16000_44100"]
    b = r_kb["averaged"]["proc_fft_16000_44100"]
    assert abs(a["ssim"] - b["ssim"]) < 0.02
    assert abs(a["lsd"] - b["lsd"]) < 0.5


def test_leaderboard_regeneration(vctk_root, tmp_path):
    """Multi-system leaderboard (BASELINE config #5): identity +
    low-band-splice systems over a shared fft sweep -> ranked markdown."""
    from ssr_eval_tpu.harness.leaderboard import run_leaderboard

    class Splice(BasicTestee):
        def infer(self, x):
            return self.postprocessing(x, x)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rows, md = run_leaderboard(
            {"Unprocessed": BasicTestee(), "Identity+Splice": Splice()},
            test_data_root=vctk_root,
            cutoffs_khz=[4, 8],
            limit_test_nums=1,
            limit_test_speaker=2,
        )
    finally:
        os.chdir(cwd)
    assert set(rows) == {"Unprocessed", "Identity+Splice"}
    for row in rows.values():
        assert set(row) == {4, 8, "AVG"}
        assert all(np.isfinite(v) for v in row.values())
    assert md.count("|") > 10 and "AVG" in md


def test_host_float64_metrics_backend(vctk_root, tmp_path):
    """metrics_backend='host_float64' recomputes metrics in exact f64 on
    the device-produced waveforms; values match the independent oracle to
    f64 rounding (the <1e-3 BASELINE agreement by construction)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = ssr_eval_tpu.SSR_Eval_Helper(
            BatchedTestee(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=48000,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [12000]},
            auto_download=False,
            test_name="h64",
            metrics_backend="host_float64",
        ).evaluate(limit_test_nums=1, limit_test_speaker=2, verbose=False)
    finally:
        os.chdir(cwd)
    spk = [k for k in r if k not in ("each_speaker", "averaged")][0]
    fname = list(r[spk].keys())[0]
    got = r[spk][fname]["proc_fft_24000_44100"]
    ref = _oracle_fft_eval(os.path.join(vctk_root, spk, fname))
    # degradation still runs in device f32, so waveform-level diffs remain
    # ~1e-7; the metric computation itself is exact f64.
    assert abs(got["lsd"] - ref["lsd"]) < 5e-3
    assert abs(got["ssim"] - ref["ssim"]) < 1e-3


def test_full_settings_matrix(vctk_root, tmp_path):
    """The examples/test.py configuration (all device families together:
    butter lowpass + subsampling + fft) through the public helper."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = ssr_eval_tpu.SSR_Eval_Helper(
            BasicTestee(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [12000]},
            setting_lowpass_filtering={
                "filter": ["butter"],
                "cutoff_freq": [12000],
                "filter_order": [6],
            },
            setting_subsampling={"cutoff_freq": [12000]},
            auto_download=False,
            test_name="matrix",
        ).evaluate(limit_test_nums=1, limit_test_speaker=2, verbose=False)
    finally:
        os.chdir(cwd)
    keys = list(r["averaged"].keys())
    # preprocess family order: butter, subsampling, fft (eval.py:244-269)
    assert keys == [
        "proc_bw_24000_6_44100",
        "proc_subsampling_24000_44100",
        "proc_fft_24000_44100",
    ], keys
    for k in keys:
        for m in ("lsd", "log_sispec", "sispec", "ssim"):
            assert np.isfinite(r["averaged"][k][m]), (k, m)
    # mild-cutoff (12 kHz) degradations: all should score better (lower
    # lsd) than heavy degradation would; sanity-range only
    assert 0.0 < r["averaged"]["proc_bw_24000_6_44100"]["lsd"] < 10.0


def test_infer_fold_invariance(vctk_root):
    """Folding the spec axis into the testee batch (engine.infer_fold_max)
    must not change any metric: the fused program's group composition is a
    scheduling choice, not a semantic one."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine

    files = sorted(
        os.path.join(vctk_root, SPEAKERS[0], f)
        for f in os.listdir(os.path.join(vctk_root, SPEAKERS[0]))
        if f.endswith(".flac")
    )[:3]
    specs = expand_settings(
        setting_fft={"cutoff_freq": [8000, 16000, 24000]}, sr=44100
    )
    runs = {}
    for fold in (1, 64):  # 1 = one spec per model call; 64 = all at once
        eng = EvalEngine(
            specs,
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            testee=BatchedTestee(),
            batch_size=2,
            infer_fold_max=fold,
        )
        runs[fold] = eng.evaluate_files(files)
    for p in files:
        for key in runs[1][p]:
            for m, v in runs[1][p][key].items():
                assert abs(v - runs[64][p][key][m]) < 1e-5, (p, key, m)


def test_pending_window_bounds_inflight_batches(tmp_path, monkeypatch):
    """SSR_EVAL_TPU_MAX_PENDING drains the oldest dispatched batch
    mid-stream (bounding HBM pinned by async results on long sweeps)
    without changing any metric."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav

    paths = []
    for i in range(8):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, speechlike(0.3, 16000, seed=40 + i), 16000)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [4000, 6000]}, sr=16000)

    def run():
        eng = EvalEngine(
            specs, input_sr=16000, output_sr=16000, evaluation_sr=16000,
            testee=BatchedTestee(), batch_size=2,
        )
        return eng.evaluate_files(paths), eng

    r_default, _ = run()
    monkeypatch.setenv("SSR_EVAL_TPU_MAX_PENDING", "2")
    r_windowed, eng_w = run()
    # 4 batches with a 2-deep window -> at least two mid-stream drains
    assert eng_w.stats.counts["drain"] >= 3
    for p in paths:
        for key in r_default[p]:
            for m, v in r_default[p][key].items():
                assert r_windowed[p][key][m] == v, (p, key, m)


def test_mixed_native_rates_and_buckets_one_pass(tmp_path):
    """One evaluate_files call over files with DIFFERENT native rates and
    lengths streams through multiple (sr, bucket) groups — each file's
    metrics must match its own single-file evaluation (the reference
    decodes per file, so mixed-rate corpora are first-class there too)."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav

    layout = [(48000, 0.3), (44100, 0.45), (32000, 0.3), (48000, 0.9),
              (44100, 0.45)]
    paths = []
    for i, (sr, dur) in enumerate(layout):
        p = str(tmp_path / f"u{i}_{sr}.wav")
        write_wav(p, speechlike(dur, sr, seed=70 + i), sr)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)

    def engine():
        return EvalEngine(
            specs, input_sr=44100, output_sr=44100, evaluation_sr=44100,
            testee=BatchedTestee(), batch_size=2,
        )

    r_all = engine().evaluate_files(paths)
    assert set(r_all) == set(paths)
    for p in paths:
        r_one = engine().evaluate_files([p])
        for key in r_all[p]:
            for m, v in r_all[p][key].items():
                assert abs(r_one[p][key][m] - v) < 1e-6, (p, key, m)


def test_per_family_sweep_methods(vctk_root):
    """The reference's public per-family sweep methods on the helper
    (eval.py:302-421): key naming with doubled cutoffs, shape-preserving
    output, direct delegation to the lowpass op library."""
    import ssr_eval_tpu
    from ssr_eval_tpu.degrade.lowpass import lowpass as lp

    spk = sorted(
        d for d in os.listdir(vctk_root)
        if os.path.isdir(os.path.join(vctk_root, d))
    )[0]
    f = os.path.join(
        vctk_root, spk,
        sorted(os.listdir(os.path.join(vctk_root, spk)))[0],
    )
    h = ssr_eval_tpu.SSR_Eval_Helper(
        BatchedTestee(), 44100, 44100, 44100,
        test_data_root=vctk_root, auto_download=False,
        setting_lowpass_filtering={
            "filter": ["butter"], "cutoff_freq": [4000], "filter_order": [6]
        },
        setting_fft={"cutoff_freq": [4000]},
        setting_subsampling={"cutoff_freq": [4000]},
    )
    x, sr = decode_audio(f)
    x = (x[:, 0] if x.ndim > 1 else x)[: 44100 // 2].astype(np.float32)

    bw = h.lowpass_butterworth(f, x, 44100)
    assert list(bw) == ["proc_bw_8000_6_44100"]  # cutoff doubled by ctor
    assert bw["proc_bw_8000_6_44100"].shape == x.shape
    np.testing.assert_allclose(
        bw["proc_bw_8000_6_44100"], lp(x, 4000, 44100, 6, "butter"), atol=1e-7
    )
    for meth, key in [
        (h.lowpass_chebyshev, "proc_ch_8000_6_44100"),
        (h.lowpass_ellip, "proc_el_8000_6_44100"),
        (h.lowpass_bessel, "proc_bessel_8000_6_44100"),
        (h.lowpass_stft_hard, "proc_fft_8000_44100"),
        (h.lowpass_subsampling, "proc_subsampling_8000_44100"),
    ]:
        out = meth(f, x, 44100)
        assert list(out) == [key]
        assert out[key].shape == x.shape
        assert float(np.abs(out[key] - x).sum()) > 0.0


def test_shift_zero_divergence_pinned(vctk_root, tmp_path):
    """PARITY.md deviation 6: helper.shift preserves the reference's
    shift==0 bug (`ret[:-0] = x[0:]` assigns N elements into an empty
    slice -> ValueError, eval.py:274-276) while the engine's internal
    aligner (dsp/correlate.align_by_correlation) handles lag 0 as the
    identity."""
    import jax.numpy as jnp

    from ssr_eval_tpu.dsp.correlate import align_by_correlation

    h = ssr_eval_tpu.SSR_Eval_Helper(
        BasicTestee(), 44100, 44100, 44100,
        test_data_root=vctk_root, auto_download=False,
    )
    x = np.arange(1.0, 9.0, dtype=np.float32)

    # Parity shim: shift==0 crashes exactly like the reference.
    with pytest.raises(ValueError, match="broadcast"):
        h.shift(x, 0)
    # Nonzero lags behave normally on the same surface.
    np.testing.assert_array_equal(h.shift(x, 2)[:-2], x[2:])

    # Engine aligner: a zero-lag pair is NOT wiped to zeros.  (The
    # preserved argmax-off-by-one — PARITY "mp3 alignment off-by-one" —
    # resolves identical signals to shift -1, i.e. a 1-sample delay.)
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(4096).astype(np.float32)
    aligned = np.asarray(align_by_correlation(jnp.asarray(sig), jnp.asarray(sig)))
    assert float(np.abs(aligned).sum()) > 0.0
    np.testing.assert_allclose(aligned[1:], sig[:-1], atol=1e-6)
    assert aligned[0] == 0.0
