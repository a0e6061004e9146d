"""Real-VCTK golden replication (VERDICT r1 next-round item #10).

Replicates the reference's checked-in 2022 golden artifact
(/root/reference/examples/results/2022-03-28-18:07:54.109221-unprocessed
.json, quoted in reference README.md:33-42): identity testee, FFT mask at
12 kHz, eval at 48 kHz, 10 utterances x 8 speakers.

Skipped unless SSR_EVAL_VCTK_ROOT points at the real downloaded VCTK test
set (the Zenodo tar is unreachable in this zero-egress environment —
PARITY.md, TODO.md #7).  The first run with the real data pins the
framework's agreement with the reference; tolerances follow
BASELINE.json's |dLSD| < 1e-3 north star, with the documented GT-resampler
deviation (PARITY.md deviation 2: device polyphase replaces the per-file
sox subprocess) as the expected residual if they are exceeded.
"""

import os

import pytest

from ssr_eval_tpu.harness.golden import (
    GOLDEN_2022 as GOLDEN_AVERAGED,
    GOLDEN_2022_SPEAKERS,
    GOLDEN_2022_TOL as TOL,
)

VCTK_ROOT = os.environ.get("SSR_EVAL_VCTK_ROOT")


@pytest.mark.skipif(
    not (VCTK_ROOT and os.path.isdir(os.path.join(VCTK_ROOT, "s5"))),
    reason="real VCTK test set not available (set SSR_EVAL_VCTK_ROOT)",
)
def test_replicates_2022_golden_artifact(tmp_path):
    from ssr_eval_tpu.harness.smoke import test as smoke_test

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = smoke_test(
            test_data_root=VCTK_ROOT, auto_download=False, batch_size=8
        )
    finally:
        os.chdir(cwd)

    got = result["averaged"]["proc_fft_24000_44100"]
    for k, v in GOLDEN_AVERAGED.items():
        assert abs(got[k] - v) < TOL[k], (k, got[k], v)

    # Full schema parity with the artifact: same speakers, same blocks.
    assert set(result.keys()) == {
        "p360", "p361", "p362", "p363", "p364", "p374", "p376", "s5",
        "each_speaker", "averaged",
    }
