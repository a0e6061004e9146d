"""In-process LAME MP3 codec (io/mp3_lame.py) and the real MP3
degradation family end-to-end (reference eval.py:302-325).

These run against the system libmp3lame and skip if it is absent; the
codec *plumbing* (alignment, caching, asserts) is separately covered
backend-independently in test_degrade.py with a stub codec."""

import numpy as np
import pytest

from ssr_eval_tpu.io import mp3_lame

pytestmark = pytest.mark.skipif(
    not mp3_lame.available(), reason="libmp3lame not present"
)


def _sig(n, sr=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 2000 * t + 1.0)
        + 0.01 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


def _aligned_snr(x, y):
    c = np.correlate(y[: len(x)], x[: len(x) // 2], mode="valid")
    lag = int(np.argmax(c))
    n = min(len(x), len(y) - lag)
    return 10 * np.log10(np.sum(x[:n] ** 2) / np.sum((y[lag : lag + n] - x[:n]) ** 2))


def test_roundtrip_rate_and_quality():
    sr = 44100
    x = _sig(int(1.2 * sr))
    snrs = {}
    for kbps in (32, 128):
        data = mp3_lame.encode_mp3(x, sr, kbps)
        y, dec_sr = mp3_lame.decode_mp3(data)
        assert dec_sr == sr
        # CBR: bytes ~ kbps * duration / 8 (within container overhead)
        assert abs(len(data) * 8 / 1.2 / 1000 - kbps) / kbps < 0.15
        snrs[kbps] = _aligned_snr(x, y)
    assert snrs[128] > snrs[32] > 5.0, snrs


def test_mpeg2_rates():
    """Low sample rates ride the MPEG-2/2.5 layers."""
    for sr in (16000, 22050):
        x = _sig(sr, sr=sr, seed=3)
        y, dec_sr = mp3_lame.decode_mp3(mp3_lame.encode_mp3(x, sr, 32))
        assert dec_sr == sr
        assert len(y) >= len(x)


def test_mp3_degrade_real_codec(tmp_path):
    """mp3_degrade through the real in-process codec: shape-preserving,
    lossy, aligned, cached (the reference's full eval.py:302-325 contract,
    with LAME replacing the per-file sox subprocess)."""
    from ssr_eval_tpu.degrade import codec
    from ssr_eval_tpu.io.audio import decode_audio

    assert codec.detect_backend() == "lame"
    sr = 44100
    x = _sig(30000, seed=11)
    cache = str(tmp_path / "utt_proc_mp3_32_44100.flac")
    out = codec.mp3_degrade("utt.flac", x, sr, 32, cache_path=cache)
    assert out.shape == x.shape
    assert float(np.sum(out - x)) != 0.0  # lossy (reference eval.py:324)
    # post-alignment the codec output stays correlated with the input
    interior = slice(2000, -2000)
    denom = np.sqrt(np.sum(x[interior] ** 2) * np.sum(out[interior] ** 2))
    corr = float(np.dot(x[interior], out[interior]) / denom)
    assert corr > 0.8, corr
    y, dsr = decode_audio(cache)
    assert dsr == sr
    np.testing.assert_allclose(y[:, 0] if y.ndim > 1 else y, out, atol=1e-4)


def test_helper_mp3_family(tmp_path, monkeypatch):
    """setting_mp3_compression end-to-end through the public helper with
    the real codec: bit-compatible key naming (NOT doubled — reference
    eval.py:87) and finite metrics."""
    import os

    import ssr_eval_tpu
    from ssr_eval_tpu.harness.fixtures import ensure_synthetic_vctk

    root = ensure_synthetic_vctk(str(tmp_path / "vctk"))
    monkeypatch.chdir(tmp_path)
    r = ssr_eval_tpu.SSR_Eval_Helper(
        ssr_eval_tpu.BasicTestee(),
        input_sr=44100,
        output_sr=44100,
        evaluation_sr=44100,
        test_data_root=root,
        setting_mp3_compression={"low_kbps": [32]},
        auto_download=False,
        test_name="mp3real",
    ).evaluate(limit_test_nums=1, limit_test_speaker=1, verbose=False)
    m = r["averaged"]["proc_mp3_32_44100"]
    for k in ("lsd", "log_sispec", "sispec", "ssim"):
        assert np.isfinite(m[k]), (k, m)
    assert m["lsd"] > 0.0


def test_lame_reject_falls_back_or_errors_cleanly(monkeypatch):
    """A sample rate LAME rejects (non-MPEG rate) must fall back to a CLI
    codec when one exists, and raise CodecUnavailableError (not a raw
    RuntimeError) when none does (ADVICE r2 #2)."""
    import shutil as _shutil

    import numpy as np
    import pytest as _pytest

    from ssr_eval_tpu.degrade import codec

    x = (0.1 * np.sin(np.arange(13000) * 0.05)).astype(np.float32)

    # no CLI available -> clean CodecUnavailableError mentioning LAME
    monkeypatch.setattr(codec.shutil, "which", lambda name: None)
    with _pytest.raises(codec.CodecUnavailableError, match="LAME failed"):
        codec.mp3_degrade("utt.flac", x, 13000, 32)

    # a (stubbed) sox present -> the CLI path is retried instead
    calls = []

    def fake_which(name):
        return "/usr/bin/sox" if name == "sox" else None

    def fake_encode_decode(src_wav, kbps, backend, workdir):
        calls.append(backend)
        import os

        from ssr_eval_tpu.io.audio import read_wav, write_wav

        y, sr = read_wav(src_wav)
        out = os.path.join(workdir, "dec.wav")
        write_wav(out, np.round(y * 1024) / 1024, sr)
        return out

    monkeypatch.setattr(codec.shutil, "which", fake_which)
    monkeypatch.setattr(codec, "_encode_decode_mp3", fake_encode_decode)
    # The first (failed) attempt cached the per-(sr, kbps) rejection, so
    # the retry must NOT re-pay the doomed LAME attempt (ADVICE r3 #2).
    assert (13000, 32) in codec._lame_rejections

    def boom(*a, **k):
        raise AssertionError("LAME re-attempted a cached rejection")

    monkeypatch.setattr(mp3_lame, "encode_mp3", boom)
    out = codec.mp3_degrade("utt.flac", x, 13000, 32)
    assert calls == ["sox"]
    assert out.shape == x.shape


def test_codec_thread_determinism():
    """Concurrent encode+decode round trips must be bit-identical to
    serial ones.  libmp3lame shares library-global tables between the
    lame_* encoder and hip_* decoder — without the module lock in
    io/mp3_lame.py, the engine's codec pool produced run-to-run PCM
    differences on one utterance per batch (caught in r5 as a
    device-vs-host metric mismatch)."""
    from concurrent.futures import ThreadPoolExecutor

    sr = 44100
    xs = [_sig(int(0.4 * sr), seed=30 + i) for i in range(3)]

    def rt(x):
        return mp3_lame.decode_mp3(mp3_lame.encode_mp3(x, sr, 32))[0]

    ref = [rt(x).tobytes() for x in xs]
    for _ in range(4):
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(rt, xs))
        assert [o.tobytes() for o in outs] == ref


def test_mp3_device_testee_batched_scoring(tmp_path):
    """VERDICT r3 #5: an mp3 spec with a DEVICE testee routes the whole
    codec-degraded batch through ONE fused infer->resample->metrics
    device call (engine._mp3_device_score) instead of B per-utterance
    host-bridge dispatches — and produces the same metrics as the host
    bridge it replaced."""
    import jax.numpy as jnp

    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_flac

    sr = 44100
    paths = []
    for i in range(3):
        p = str(tmp_path / f"u{i}.flac")
        write_flac(p, _sig(int(0.5 * sr), seed=i), sr)
        paths.append(p)
    specs = expand_settings(setting_mp3_compression={"low_kbps": [64]}, sr=sr)

    class CountingTestee(BatchedTestee):
        infer_calls = 0

        def infer(self, x):
            type(self).infer_calls += 1
            return super().infer(x)

    def run(force_host):
        CountingTestee.infer_calls = 0
        eng = EvalEngine(
            specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
            testee=CountingTestee(), batch_size=4,
        )
        if force_host:
            eng.device_testee = False  # the pre-r4 per-utterance bridge
        res = eng.evaluate_files(paths)
        return eng, res, CountingTestee.infer_calls

    eng_dev, res_dev, infers_dev = run(force_host=False)
    eng_host, res_host, infers_host = run(force_host=True)

    # Device path: one fused mp3_score program, called once per batch,
    # zero host-side per-utterance infer calls.
    mp3_calls = [
        v for k, v in eng_dev._cost_calls.items() if k and k[0] == "mp3_score"
    ]
    assert mp3_calls == [1]
    assert infers_dev == 0
    # Host bridge: one infer per real utterance.
    assert infers_host == len(paths)

    # Same metrics (both score on device in f32; tiny reassociation
    # differences only).
    key = specs[0].key
    for p in paths:
        for m in ("lsd", "log_sispec", "sispec", "ssim"):
            assert abs(res_dev[p][key][m] - res_host[p][key][m]) < 1e-4, (
                p, m, res_dev[p][key][m], res_host[p][key][m],
            )
