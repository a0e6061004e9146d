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
