"""Train the small NVSR (dnn generator + small TFGAN vocoder) offline and
emit the trained artifacts the e2e trained-weights test consumes
(VERDICT r4 #5).

Artifacts (checked in under examples/trained_small/):
  vocoder_small_trained.pt   voicefixer-layout torch state dict of the
                             natively-trained small vocoder — consumed by
                             the REAL conversion path
                             (NVSRTestee.load_vocoder_checkpoint)
  generator_dnn.npz          flax variables of the trained dnn generator
                             (models/checkpoint.py format)
  train_report.json          losses + the vocoder sanity-check report

Usage: python scripts/train_small_nvsr.py [vocoder_steps] [generator_steps]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_eval_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from ssr_eval_tpu.harness.fixtures import speechlike as speechlike_fn  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "trained_small",
)


def harmonic_stack(duration_s, sr, seed):
    """Sparse vibrato'd harmonic stack under a smooth envelope — the
    probe_signal family.  Unlike `speechlike` (40 harmonics + breath
    noise = energy in every mel band), these leave most of the mel range
    near-silent, which teaches the vocoder to render QUIET where the
    conditioning says quiet; trained on full-band material only, it fills
    empty bands with noise and fails the sanity check's correlation."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n) / sr
    f0 = (120.0 + 80.0 * rng.random()) + (20.0 + 30.0 * rng.random()) * np.sin(
        2 * np.pi * (1.5 + 2.0 * rng.random()) * t
    )
    phase = 2 * np.pi * np.cumsum(f0) / sr
    kmax = int(rng.integers(3, 9))
    x = sum((0.5 / k) * np.sin(k * phase + rng.random() * 6.28)
            for k in range(1, kmax + 1))
    env = 0.3 + 0.7 * np.hanning(n)
    return (0.5 * x * env).astype(np.float32)


def training_audios():
    """Speechlike (full-band), sparse harmonic stacks, and FFT-lowpassed
    speechlike (band-limited) — coverage of both dense and mostly-silent
    mel conditioning."""
    sr = 44100
    out = [speechlike_fn(2.0, sr, seed=s) for s in range(24)]
    out += [harmonic_stack(2.0, sr, seed=100 + s) for s in range(12)]
    for s in range(12):
        x = speechlike_fn(2.0, sr, seed=200 + s)
        X = np.fft.rfft(x.astype(np.float64))
        cut = int(len(X) * (0.06 + 0.03 * s))  # cutoffs ~1.3-8.5 kHz
        X[cut:] = 0.0
        out.append(np.fft.irfft(X, n=len(x)).astype(np.float32))
    return out


def main():
    v_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    g_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    os.makedirs(OUT, exist_ok=True)

    from ssr_eval_tpu.models.checkpoint import save_variables_npz
    from ssr_eval_tpu.models.train import NVSRTrainer
    from ssr_eval_tpu.models.train_vocoder import (
        SMALL_TFGAN,
        VocoderTrainer,
        export_torch_state_dict,
    )

    audios = training_audios()

    print("== vocoder ==", flush=True)
    from ssr_eval_tpu.models.vocoder_check import probe_signal

    vt = VocoderTrainer(SMALL_TFGAN)
    probe = probe_signal(44100)
    state, v_losses = None, []
    chunk = 500
    for start in range(0, v_steps, chunk):
        n = min(chunk, v_steps - start)
        state, losses = vt.fit(audios, steps=n, batch=4, crop_seconds=0.35,
                               seed=start, state=state, log_every=100)
        v_losses += losses
        corr = vt.probe_corr(state["params"], probe)
        print(f"[vocoder] step {start + n} loss {v_losses[-1]:.4f} "
              f"probe_corr {corr:.4f}", flush=True)
        # 0.5 is the load-time gate (vocoder_check); stop at 0.65 so the
        # checked-in artifact clears it with margin.
        if corr >= 0.65:
            break
    v_params = state["params"]
    sd_path = os.path.join(OUT, "vocoder_small_trained.pt")
    export_torch_state_dict(v_params, SMALL_TFGAN, sd_path)
    print(f"[vocoder] exported {sd_path}", flush=True)

    print("== generator (dnn) ==", flush=True)
    gt = NVSRTrainer(model_name="dnn", learning_rate=3e-4)
    g_state, g_losses = gt.fit(
        audios, steps=g_steps, batch=8, crop_seconds=1.0,
        cutoffs=(1000, 2000, 4000, 6000, 8000, 12000, 16000),
    )
    gen_path = save_variables_npz(
        os.path.join(OUT, "generator_dnn.npz"),
        {"params": g_state["params"], "batch_stats": g_state["batch_stats"]},
    )
    print(f"[generator] saved {gen_path}", flush=True)

    # assemble + sanity check through the REAL conversion path
    print("== assemble + check ==", flush=True)
    from ssr_eval_tpu.models.testees import NVSRTestee
    from ssr_eval_tpu.models.vocoder_check import synthesis_report

    testee = NVSRTestee(model_name="dnn")
    testee.load_generator_checkpoint(gen_path)
    unmatched = testee.load_vocoder_checkpoint(sd_path, check=True)
    assert not unmatched, unmatched
    rep = synthesis_report(testee.model, testee.variables)
    print(f"[check] vocoder sanity: {rep}", flush=True)

    with open(os.path.join(OUT, "train_report.json"), "w") as f:
        json.dump(
            {
                "vocoder_steps": v_steps,
                "generator_steps": g_steps,
                "vocoder_loss_first_last": [v_losses[0], v_losses[-1]],
                "generator_loss_first_last": [g_losses[0], g_losses[-1]],
                "vocoder_sanity": rep,
            },
            f,
            indent=1,
        )
    print(json.dumps({"vocoder_final_loss": v_losses[-1],
                      "generator_final_loss": g_losses[-1],
                      "sanity_corr": rep["corr"]}))


if __name__ == "__main__":
    main()
