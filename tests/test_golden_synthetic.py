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
# after it moved 256 -> 512 under the HIGH precision default (r5), and
# after the base moved back to 128 when the dense-rDFT flip left the
# IIR filter blocks as CT's only hot user (r5 late; these CPU pins ride
# the "auto" mode's pack path — dense is TPU-only because CPU dnnl
# GEMMs are M-shape-dependent, see fft_matmul._default_rfft_mode): each
# FFT refactor changes the f32 rounding floor in the IIR stop band,
# moving ONLY the log-domain metrics (lsd/log_sispec, floor-dominated
# there — PARITY.md deviation 4) while sispec/ssim stay equal to ~5
# digits and the filtered waveform stays oracle-exact vs scipy's
# float64 sosfiltfilt (tests/test_filters.py; the full
# degrade/filters/fuzz oracle suite passed unchanged at every pin).
GOLDEN_FAMILIES = {
    "proc_bw_16000_8_44100": {
        "lsd": 6.239049, "log_sispec": 6.125923,
        "sispec": 42.656927, "ssim": 0.619003,
    },
    "proc_ch_16000_8_44100": {
        "lsd": 6.542235, "log_sispec": 6.266384,
        "sispec": 40.906565, "ssim": 0.620322,
    },
    "proc_el_16000_8_44100": {
        "lsd": 6.810665, "log_sispec": 6.611895,
        "sispec": 41.202256, "ssim": 0.614572,
    },
    "proc_bessel_16000_8_44100": {
        "lsd": 6.390809, "log_sispec": 7.295904,
        "sispec": 26.253575, "ssim": 0.531492,
    },
    "proc_subsampling_16000_44100": {
        "lsd": 3.389415, "log_sispec": 8.356409,
        "sispec": 42.388617, "ssim": 0.624253,
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
