"""NVSR model family: shapes, parameter scale, testee protocol, and the
dp x tp sharded training step on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssr_eval_tpu.models.nvsr import NVSR, Generator, from_log, to_log, trim_center
from ssr_eval_tpu.models.unet import UNetRes
from ssr_eval_tpu.models.vocoder import HiFiGANVocoder


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def unet_vars():
    model = UNetRes(channels=1)
    return model, model.init(jax.random.PRNGKey(0), jnp.ones((1, 101, 128, 1)), train=False)


def test_unet_shape(unet_vars):
    """Reference shape check (unet.py:593-595): [1,1,101,128] -> same."""
    model, variables = unet_vars
    out = model.apply(variables, jnp.ones((1, 101, 128, 1)), train=False)
    assert out["mel"].shape == (1, 101, 128, 1)


def test_unet_param_scale(unet_vars):
    """UNetResComplex_100Mb's analysis module is ~65M params (the
    reference's '99.0M' NVSR row includes the ~34M voicefixer vocoder)."""
    _, variables = unet_vars
    n = _n_params(variables["params"])
    assert 5.5e7 < n < 7.5e7, n


def test_unet_time_padding(unet_vars):
    """Arbitrary (non-multiple-of-64) time lengths round-trip."""
    model, variables = unet_vars
    for T in (33, 64, 130):
        out = model.apply(variables, jnp.ones((1, T, 128, 1)), train=False)
        assert out["mel"].shape == (1, T, 128, 1)


@pytest.mark.parametrize("name", ["dnn", "bigru"])
def test_generator_variants(name):
    model = Generator(model_name=name)
    mel = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 40, 128))) + 1e-3
    variables = model.init(jax.random.PRNGKey(0), mel, train=False)
    out = model.apply(variables, mel, train=False)
    assert out["mel"].shape == (2, 40, 128)
    # residual-in-log-space: output = analysis + log(mel)
    assert bool(jnp.all(jnp.isfinite(out["mel"])))


def test_vocoder_upsampling():
    model = HiFiGANVocoder(base_channels=32)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 128))
    variables = model.init(jax.random.PRNGKey(1), mel)
    wav = model.apply(variables, mel)
    assert wav.shape == (1, 16 * 441)


def test_log_roundtrip():
    x = jnp.asarray([1e-12, 1e-8, 0.5, 3.0])
    y = from_log(to_log(x))
    np.testing.assert_allclose(np.asarray(y[2:]), np.asarray(x[2:]), rtol=1e-5)
    assert float(y[0]) == pytest.approx(1e-8)  # clip floor


def test_trim_center():
    est = jnp.arange(10.0)[None, :]
    out = trim_center(est, jnp.int32(6))
    # diff=4 -> start=2; first 6 samples = est[2:8], rest zero
    np.testing.assert_array_equal(np.asarray(out[0]), [2, 3, 4, 5, 6, 7, 0, 0, 0, 0])


def test_padding_testee_mel_tiling():
    from ssr_eval_tpu.models.testees import NVSRPaddingPostProcTestee

    t = NVSRPaddingPostProcTestee.__new__(NVSRPaddingPostProcTestee)
    mel = np.zeros((1, 8, 16), np.float32)
    mel[0, :, :6] = 1.0  # energy concentrated in low bands
    mel[0, :, 3] = 5.0
    tiled = np.asarray(t._tile_mel(jnp.asarray(mel)))
    # bands >= cutoff replaced by the cutoff row's value
    assert tiled.shape == mel.shape
    cut_val = tiled[0, 0, -1]
    assert np.all(tiled[0, :, -1] == cut_val)


def test_sharded_train_step_dp_tp():
    """One NVSR generator train step over a (4 data x 2 model) CPU mesh."""
    from ssr_eval_tpu.models.train import NVSRTrainer, make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8, tp=2)
    # dnn generator keeps the CPU test fast; the graft dryrun compiles the
    # full unet path separately.
    tr = NVSRTrainer(model_name="dnn", mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    mel_lr, mel_hr = tr.make_batch(0, batch=8)
    new_state, loss = tr.step(state, mel_lr, mel_hr)
    assert np.isfinite(float(loss))
    # a large kernel must actually be sharded over 'model'
    k = state["params"]["generator"]["dense_1"]["kernel"]
    assert "model" in str(k.sharding.spec), k.sharding
    # and one more step runs from the new state
    _, loss2 = tr.step(new_state, mel_lr, mel_hr)
    assert np.isfinite(float(loss2))


def test_nvsr_testee_through_engine(tmp_path):
    """NVSR device testee (random weights) through the full fused engine
    pipeline on tiny synthetic utterances."""
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.models.testees import NVSRTestee

    paths = []
    for i in range(2):
        x = speechlike(0.35, 44100, seed=50 + i)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, x, 44100)
        paths.append(p)

    testee = NVSRTestee(model_name="dnn", seed=1)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    eng = EvalEngine(specs, 44100, 44100, 44100, testee, batch_size=2)
    r = eng.evaluate_files(paths)
    for p in paths:
        m = r[p]["proc_fft_8000_44100"]
        assert np.isfinite(m["lsd"]) and np.isfinite(m["ssim"])
        # random weights -> bad LSD, but the pipeline must be sane
        assert 0.0 < m["lsd"] < 50.0


def test_fit_loop_decreases_loss(tmp_path):
    """A short fit() run on synthetic audio: pipeline produces mel pairs,
    loss is finite and moves, checkpoint is written."""
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.models.train import NVSRTrainer

    audios = [speechlike(1.2, 44100, seed=s) for s in range(3)]
    tr = NVSRTrainer(model_name="dnn", learning_rate=3e-4)
    ckpt = str(tmp_path / "gen_ckpt")
    state, losses = tr.fit(
        audios, steps=6, batch=2, crop_seconds=0.5, ckpt_path=ckpt,
        ckpt_every=6, log_every=0,
    )
    assert len(losses) == 6 and all(np.isfinite(l) for l in losses)
    # mel-residual init starts near ~|noise|; optimizer should not diverge
    assert losses[-1] < losses[0] * 3
    import os
    from ssr_eval_tpu.models.checkpoint import restore_variables
    restored = restore_variables(ckpt)
    assert "params" in restored


def test_bf16_inference_mode(tmp_path):
    """dtype=bfloat16 testee: params stay f32, outputs f32, metrics close
    to the f32 run (inference-quality tolerance)."""
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.models.testees import NVSRTestee

    x = speechlike(0.3, 44100, seed=60)
    p = str(tmp_path / "u.wav")
    write_wav(p, x, 44100)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)

    t32 = NVSRTestee(model_name="dnn", seed=5)
    t16 = NVSRTestee(model_name="dnn", seed=5, dtype=jnp.bfloat16)
    # identical params (same seed, dtype only affects compute)
    r32 = EvalEngine(specs, 44100, 44100, 44100, t32, batch_size=1).evaluate_files([p])
    r16 = EvalEngine(specs, 44100, 44100, 44100, t16, batch_size=1).evaluate_files([p])
    a = r32[p]["proc_fft_8000_44100"]
    b = r16[p]["proc_fft_8000_44100"]
    assert np.isfinite(b["lsd"])
    assert abs(a["lsd"] - b["lsd"]) < 0.5, (a["lsd"], b["lsd"])


def test_postproc_testees_through_engine(tmp_path):
    """Both post-processing NVSR variants (GT low-band splice; mel-tiling
    ablation — reference main.py:112-163) run through the fused engine
    and produce finite metrics."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.models.testees import (
        NVSRPaddingPostProcTestee,
        NVSRPostProcTestee,
    )

    paths = []
    for i in range(2):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, 0.2 * speechlike(0.3, 44100, seed=30 + i), 44100)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    for cls in (NVSRPostProcTestee, NVSRPaddingPostProcTestee):
        eng = EvalEngine(
            specs, input_sr=44100, output_sr=44100, evaluation_sr=44100,
            testee=cls(model_name="dnn"), batch_size=2,
        )
        r = eng.evaluate_files(paths)
        for p in paths:
            m = r[p]["proc_fft_8000_44100"]
            assert all(np.isfinite(v) for v in m.values()), (cls.__name__, m)


# ---------------------------------------------------------------------------
# BatchNorm folding (models/fold_bn.py, VERDICT r3 #2)


def _perturb_bn(variables, seed=3):
    """Give every BN non-trivial scale/bias/mean/var so folding is a real
    transform, not a near-identity."""
    rng = np.random.default_rng(seed)

    def walk_params(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k.startswith("bn") and "scale" in v:
                    out[k] = {
                        "scale": jnp.asarray(
                            rng.uniform(0.5, 2.0, np.shape(v["scale"])), jnp.float32
                        ),
                        "bias": jnp.asarray(
                            rng.normal(0, 0.3, np.shape(v["bias"])), jnp.float32
                        ),
                    }
                else:
                    out[k] = walk_params(v)
            else:
                out[k] = v
        return out

    def walk_stats(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "mean" in v and "var" in v:
                    out[k] = {
                        "mean": jnp.asarray(
                            rng.normal(0, 0.5, np.shape(v["mean"])), jnp.float32
                        ),
                        "var": jnp.asarray(
                            rng.uniform(0.3, 3.0, np.shape(v["var"])), jnp.float32
                        ),
                    }
                else:
                    out[k] = walk_stats(v)
            else:
                out[k] = v
        return out

    out = dict(variables)
    out["params"] = walk_params(variables["params"])
    if "batch_stats" in variables:
        out["batch_stats"] = walk_stats(variables["batch_stats"])
    return out


@pytest.mark.parametrize("name", ["unet", "dnn"])
def test_fold_bn_exact(name):
    """Folded model + folded variables == unfolded eval-mode forward, on
    non-trivial BN statistics (the fold is a reassociation, not an
    approximation)."""
    from ssr_eval_tpu.models.fold_bn import fold_nvsr_bn

    widths = (8, 16)
    if name == "unet":
        model = NVSR(model_name="dnn")  # placeholder; built below
        # small-width UNet via the Generator's module tree is awkward —
        # test UNetRes directly through NVSR is heavy, so use UNetRes.
        rng = jax.random.PRNGKey(0)
        net = UNetRes(channels=1, widths=widths, blocks_per_group=2)
        # freq 16 -> 15 after the drop; 15 -> 7 -> 3 halves to odd sizes,
        # matching the decoder's 2F+1 transposed-conv output per level.
        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (2, 6, 16, 1)).astype(np.float32)
        )
        variables = _perturb_bn(net.init(rng, x, False))
        ref = net.apply(variables, x, False)["mel"]

        from ssr_eval_tpu.models.fold_bn import _fold_convblocks

        fp, fs = _fold_convblocks(
            variables["params"], variables.get("batch_stats", {})
        )
        folded = UNetRes(
            channels=1, widths=widths, blocks_per_group=2, fold_bn=True
        ).apply({"params": fp, "batch_stats": fs}, x, False)["mel"]
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        return

    # dnn: full NVSR tree through fold_nvsr_bn
    model = NVSR(model_name="dnn")
    rng = jax.random.PRNGKey(1)
    mel = jnp.abs(jax.random.normal(rng, (1, 32, 128))) + 1e-3
    variables = _perturb_bn(model.init(rng, mel, train=False, method=NVSR.init_all))
    ref = model.apply(variables, mel, train=False)["mel"]
    fmodel, fvars = fold_nvsr_bn(model, variables)
    assert fmodel.fold_bn
    got = fmodel.apply(fvars, mel, train=False)["mel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # folded tree has no generator bn_* params left
    assert not any(k.startswith("bn_") for k in fvars["params"]["generator"])


def test_fold_bn_testee_wiring():
    """NVSRTestee(fold_bn=True) produces the same inference as the
    unfolded testee (same seed), end-to-end through infer_batch."""
    from ssr_eval_tpu.models.testees import NVSRTestee

    x = jnp.asarray(
        0.1 * np.random.default_rng(2).standard_normal((1, 8820)).astype(np.float32)
    )
    n = jnp.asarray([8820], jnp.int32)
    base = NVSRTestee(model_name="dnn", seed=11)
    fold = NVSRTestee(model_name="dnn", seed=11, fold_bn=True)
    y0, n0 = base.infer_batch(x, n, base.variables)
    y1, n1 = fold.infer_batch(x, n, fold.variables)
    assert int(n0[0]) == int(n1[0])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5)


def test_fold_bn_bigru_raises():
    from ssr_eval_tpu.models.testees import NVSRTestee

    with pytest.raises(ValueError, match="fold_bn"):
        NVSRTestee(model_name="bigru", fold_bn=True)
