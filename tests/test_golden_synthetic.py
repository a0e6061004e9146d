"""Golden regression: the README smoke run on the deterministic synthetic
fixture set must keep producing the pinned metric values (CPU backend).

This is the framework's analogue of the reference's checked-in golden JSON
(examples/results/2022-03-28-...-unprocessed.json, SURVEY §4): any change
to degradation, resampling, STFT or metric semantics moves these numbers.
Pinned from examples/results/2026-08-16-...-unprocessed.json.  Tolerances
cover run-to-run/XLA-version jitter, not semantic drift.
"""

import os

import pytest

from ssr_eval_tpu.harness.fixtures import ensure_synthetic_vctk
from ssr_eval_tpu.harness.smoke import test as smoke_test

GOLDEN_AVERAGED = {
    "lsd": 4.100137,
    "log_sispec": 5.882068,
    "sispec": 42.047697,
    "ssim": 0.654000,
}
GOLDEN_P360 = {
    "lsd": 4.132815,
    "log_sispec": 5.723820,
    "sispec": 41.343197,
    "ssim": 0.628467,
}
TOL = {"lsd": 5e-3, "log_sispec": 5e-3, "sispec": 0.05, "ssim": 2e-3}


@pytest.fixture(scope="module")
def smoke(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden") / "vctk_test"
    ensure_synthetic_vctk(str(root), files_per_speaker=2)
    wd = tmp_path_factory.mktemp("golden_run")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        return smoke_test(test_data_root=str(root), auto_download=False, batch_size=4)
    finally:
        os.chdir(cwd)


def test_golden_averaged(smoke):
    got = smoke["averaged"]["proc_fft_24000_44100"]
    for k, v in GOLDEN_AVERAGED.items():
        assert abs(got[k] - v) < TOL[k], (k, got[k], v)


def test_golden_per_speaker(smoke):
    got = smoke["each_speaker"]["p360"]["proc_fft_24000_44100"]
    for k, v in GOLDEN_P360.items():
        assert abs(got[k] - v) < TOL[k], (k, got[k], v)


# Multi-family golden (r3): identity testee over the four IIR designs +
# polyphase subsampling on the same deterministic fixture set.  Any change
# to filter design/application, the overlap-save path, the resamplers, or
# the metric kernels moves these.  Keys carry the doubled cutoff + order.
#
# Re-pinned after the rfft/irfft pack trick (r4), after the CT
# base-width default moved 128 -> 256 (r4, fft_matmul._default_base),
# and after it moved 256 -> 512 under the HIGH precision default (r5):
# each FFT refactor changes the f32 rounding floor in the IIR stop band,
# moving ONLY the log-domain metrics (lsd/log_sispec, floor-dominated
# there — PARITY.md deviation 4) by ~0.1 while sispec/ssim stay equal to
# 6 digits and the filtered waveform stays within 7.6e-7 of scipy's
# float64 sosfiltfilt oracle (tests/test_filters.py; the full
# degrade/filters/fuzz oracle suite passed unchanged at both pins).
GOLDEN_FAMILIES = {
    "proc_bw_16000_8_44100": {
        "lsd": 5.958977, "log_sispec": 6.332137,
        "sispec": 42.657026, "ssim": 0.619014,
    },
    "proc_ch_16000_8_44100": {
        "lsd": 6.200547, "log_sispec": 6.459818,
        "sispec": 40.906655, "ssim": 0.620336,
    },
    "proc_el_16000_8_44100": {
        "lsd": 6.431774, "log_sispec": 6.785354,
        "sispec": 41.202361, "ssim": 0.614589,
    },
    "proc_bessel_16000_8_44100": {
        "lsd": 6.107235, "log_sispec": 7.537342,
        "sispec": 26.253577, "ssim": 0.531503,
    },
    "proc_subsampling_16000_44100": {
        "lsd": 3.389026, "log_sispec": 8.357384,
        "sispec": 42.388618, "ssim": 0.624253,
    },
}


@pytest.fixture(scope="module")
def families_run(tmp_path_factory):
    import ssr_eval_tpu

    root = tmp_path_factory.mktemp("golden_fam") / "vctk_test"
    ensure_synthetic_vctk(str(root), files_per_speaker=2)
    wd = tmp_path_factory.mktemp("golden_fam_run")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        return ssr_eval_tpu.SSR_Eval_Helper(
            ssr_eval_tpu.BasicTestee(),
            input_sr=44100, output_sr=44100, evaluation_sr=44100,
            test_name="golden_families", test_data_root=str(root),
            setting_lowpass_filtering={
                "filter": ["butter", "cheby", "ellip", "bessel"],
                "cutoff_freq": [8000], "filter_order": [8],
            },
            setting_subsampling={"cutoff_freq": [8000]},
            auto_download=False, batch_size=4,
        ).evaluate(limit_test_nums=2, limit_test_speaker=-1, verbose=False)
    finally:
        os.chdir(cwd)


def test_golden_iir_and_subsampling_families(families_run):
    got_keys = set(families_run["averaged"].keys())
    assert got_keys == set(GOLDEN_FAMILIES), got_keys
    for key, metrics in GOLDEN_FAMILIES.items():
        got = families_run["averaged"][key]
        for m, v in metrics.items():
            assert abs(got[m] - v) < TOL[m], (key, m, got[m], v)
