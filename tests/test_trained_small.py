"""E2E trained-weights chain (VERDICT r4 #5).

The checked-in artifacts under examples/trained_small/ come from
scripts/train_small_nvsr.py — a small NVSR (dnn generator + small TFGAN
vocoder) trained OFFLINE on synthetic speech.  These tests drive the
entire train -> checkpoint -> convert-path -> sanity-check -> evaluate
chain with weights that are genuinely trained:

- the vocoder artifact is a voicefixer-LAYOUT torch state dict, so
  loading it exercises the REAL conversion path the pretrained Zenodo
  checkpoint would take (infer_vocoder_config -> vocoder_state_dict_to_flax
  -> models/vocoder_check.py), and the load-time sanity check must PASS
  here — everywhere else in the suite it is only ever tripped by random
  weights (tests/test_vocoder_convert.py).
- the full fft sweep with the trained testee must beat the identity
  testee's LSD at every cutoff (reference context: the pretrained NVSR
  row, /root/reference/README.md:111, examples/NVSR/main.py:96-109).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

ART = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "examples", "trained_small")
)
GEN = os.path.join(ART, "generator_dnn.npz")
VOC = os.path.join(ART, "vocoder_small_trained.pt")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GEN) and os.path.exists(VOC)),
    reason="trained-small artifacts missing (run scripts/train_small_nvsr.py)",
)

CUTOFFS = [4000, 8000, 12000]


def _files(tmp_path, n=2):
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav

    paths = []
    for i in range(n):
        x = speechlike(0.5, 44100, seed=70 + i)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x, 44100)
        paths.append(p)
    return paths


def _mean_lsd_per_cutoff(testee, paths):
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine

    # expand_settings takes the post-_cutoff2sr rates (the helper doubles
    # user cutoffs; engine-level keys carry the rate verbatim)
    specs = expand_settings(setting_fft={"cutoff_freq": CUTOFFS}, sr=44100)
    r = EvalEngine(specs, 44100, 44100, 44100, testee,
                   batch_size=2).evaluate_files(paths)
    return {
        f"proc_fft_{c}_44100": float(
            np.mean([r[p][f"proc_fft_{c}_44100"]["lsd"] for p in paths])
        )
        for c in CUTOFFS
    }


def _load_trained(testee):
    testee.load_generator_checkpoint(GEN)
    unmatched = testee.load_vocoder_checkpoint(VOC, check=True)
    assert unmatched == [], unmatched
    return testee


def test_trained_vocoder_passes_sanity_check():
    """check_vocoder PASSES on genuinely trained weights through the real
    conversion path (it is only ever TRIPPED elsewhere in the suite)."""
    from ssr_eval_tpu.models.testees import NVSRTestee
    from ssr_eval_tpu.models.vocoder_check import synthesis_report

    t = _load_trained(NVSRTestee(model_name="dnn"))
    rep = synthesis_report(t.model, t.variables)
    assert rep["finite"] and rep["rms"] > 1e-4
    assert rep["corr"] > 0.5, rep


def test_trained_small_beats_identity(tmp_path):
    """Full fft sweep: the trained NVSR (with the reference's low-band
    splice postprocessing, main.py:112-127) beats the identity testee's
    LSD at every cutoff."""
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.models.testees import NVSRPostProcTestee

    paths = _files(tmp_path)
    trained = _load_trained(NVSRPostProcTestee(model_name="dnn"))
    lsd_trained = _mean_lsd_per_cutoff(trained, paths)
    lsd_identity = _mean_lsd_per_cutoff(BatchedTestee(), paths)
    for key, ident in lsd_identity.items():
        assert lsd_trained[key] < ident, (key, lsd_trained, lsd_identity)
