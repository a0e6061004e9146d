"""Wire codec: bit-exact roundtrip, plan selection, engine equality.

The codec must be INVISIBLE: the unpacked float32 batch equals the raw
int16 wire's `x / 32768` conversion bit for bit, padding included, so
every downstream metric is unchanged (not just close).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ssr_eval_tpu.harness.engine import fused_key_has_wire
from ssr_eval_tpu.io import wirecodec as wc


def _raw_f32(x, lens):
    out = x.astype(np.float32) / 32768.0
    dead = np.arange(x.shape[1])[None, :] >= np.asarray(lens)[:, None]
    return np.where(dead, 0.0, out).astype(np.float32)


def _roundtrip(x, lens):
    plan = wc.plan_for(x, lens)
    assert plan is not None
    packed = wc.pack(x, lens, plan)
    assert packed.dtype == np.uint32
    got_np = wc.unpack_np(packed, lens, plan)
    got_jax = np.asarray(wc.unpack_jax(jnp.asarray(packed), jnp.asarray(lens), plan))
    want = _raw_f32(x, lens)
    np.testing.assert_array_equal(got_np, want)
    np.testing.assert_array_equal(got_jax, want)
    return plan


def test_roundtrip_smooth_signal_picks_predictor():
    rng = np.random.default_rng(0)
    t = np.arange(4096) / 4096
    rows = [
        np.clip(np.round(12000 * np.sin(2 * np.pi * (40 + 7 * i) * t)
                         + 50 * rng.standard_normal(t.size)), -32768, 32767)
        for i in range(3)
    ]
    x = np.stack(rows).astype(np.int16)
    lens = np.array([4096, 4000, 3777], np.int32)
    x[1, 4000:] = 0
    x[2, 3777:] = 0
    plan = _roundtrip(x, lens)
    assert plan.order >= 1  # smooth signal -> differencing wins
    assert plan.bits < 16 and plan.wire_ratio < 1.0


def test_roundtrip_every_bits_and_order():
    rng = np.random.default_rng(1)
    L = 257  # not a multiple of 32 -> exercises group padding
    lens = np.array([257, 100], np.int32)
    for bits in range(2, 15):
        for order in (0, 1, 2):
            plan = wc.WirePlan(bits=bits, order=order, length=L)
            # residuals that exactly saturate the width after `order`
            # integrations must survive the roundtrip
            lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
            r = rng.integers(lo, hi + 1, size=(2, L), dtype=np.int64)
            dead = np.arange(L)[None, :] >= lens[:, None]
            r = np.where(dead, 0, r)
            x = r.copy()
            for _ in range(order):
                x = np.cumsum(x, axis=1)
                x = np.where(dead, 0, x)
            if np.abs(x).max() > 32767:
                continue  # not representable as int16 input
            x = x.astype(np.int16)
            packed = wc.pack(x, lens, plan)
            assert packed.shape[1] == plan.words_per_row
            got = wc.unpack_np(packed, lens, plan)
            np.testing.assert_array_equal(got, _raw_f32(x, lens))
            got_j = np.asarray(
                wc.unpack_jax(jnp.asarray(packed), jnp.asarray(lens), plan)
            )
            np.testing.assert_array_equal(got_j, _raw_f32(x, lens))


def test_plan_refuses_white_noise():
    rng = np.random.default_rng(2)
    x = rng.integers(-32768, 32768, size=(2, 1024), dtype=np.int16)
    lens = np.array([1024, 1024], np.int32)
    assert wc.plan_for(x, lens) is None  # full-scale white noise: no win


def test_plan_quiet_signal_small_bits():
    x = np.zeros((2, 512), np.int16)
    x[:, ::7] = 3
    lens = np.array([512, 512], np.int32)
    plan = wc.plan_for(x, lens)
    assert plan is not None and plan.bits <= 4


def test_order2_tail_stays_in_int32():
    # A loud final sample once made the naive zero-padded diff's
    # close-out spike dominate; and an unmasked order-2 tail would grow
    # linearly past int32 at real lengths.  Masked reconstruction keeps
    # padding at exactly zero.
    L = 96000
    x = np.zeros((1, L), np.int16)
    x[0, :50000] = (8000 * np.sin(np.arange(50000) / 30)).astype(np.int16)
    lens = np.array([50000], np.int32)
    plan = wc.plan_for(x, lens)
    assert plan is not None
    packed = wc.pack(x, lens, plan)
    got = wc.unpack_np(packed, lens, plan)
    np.testing.assert_array_equal(got, _raw_f32(x, lens))
    assert np.all(got[0, 50000:] == 0.0)


def test_engine_metrics_identical_packed_vs_raw(tmp_path):
    """End-to-end: wire_codec=True produces BIT-IDENTICAL metrics."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav

    sr = 8000
    paths = []
    for i in range(5):  # 5 files, batch 2 -> ragged final batch
        dur = 0.9 + 0.17 * i
        p = tmp_path / f"u{i}.wav"
        # 0.35x: full-scale 8 kHz speechlike needs 15-bit residuals (no
        # wire win -> raw fallback); quieter material compresses.
        write_wav(str(p), 0.35 * speechlike(dur, sr, seed=77 + i), sr)
        paths.append(str(p))
    specs = expand_settings(setting_fft={"cutoff_freq": [4000, 8000]}, sr=sr)

    def run(wire):
        eng = EvalEngine(
            specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
            testee=BatchedTestee(), batch_size=2, wire_codec=wire,
        )
        return eng, eng.evaluate_files(paths)

    eng_raw, r_raw = run(False)
    eng_pk, r_pk = run(True)
    assert any(
        k[0] == "fused" and fused_key_has_wire(k) for k in eng_pk._cost_args
    ), (
        "packed program never dispatched: " + str(list(eng_pk._cost_args))
    )
    for p in paths:
        for key in r_raw[p]:
            for m in r_raw[p][key]:
                assert r_raw[p][key][m] == r_pk[p][key][m], (p, key, m)


def test_sticky_plan_bounds_programs(tmp_path):
    """Batches of varying loudness must NOT compile one program each:
    the per-bucket sticky plan reuses the widest-so-far (bits, order)
    whenever the batch fits it, so the packed-entry program count stays
    tiny while results remain bit-identical to the raw wire."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav

    sr = 8000
    paths = []
    # batch_size=1 -> 6 dispatches with loudness swinging both ways
    for i, gain in enumerate([0.02, 0.3, 0.05, 0.28, 0.01, 0.25]):
        p = tmp_path / f"g{i}.wav"
        write_wav(str(p), gain * speechlike(0.6, sr, seed=10 + i), sr)
        paths.append(str(p))
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=sr)

    def run(wire):
        from ssr_eval_tpu.harness.testee import BatchedTestee

        eng = EvalEngine(
            specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
            testee=BatchedTestee(), batch_size=1, wire_codec=wire,
        )
        return eng, eng.evaluate_files(paths)

    eng, res = run(True)
    fused_keys = [k for k in eng._cost_args if k and k[0] == "fused"]
    packed = [k for k in fused_keys if fused_key_has_wire(k)]
    assert packed, "no packed program dispatched"
    assert len(fused_keys) <= 2, fused_keys  # sticky ladder, not 1/batch
    for k in packed:
        wire = next(
            p for p in k[4:]
            if isinstance(p, tuple) and not isinstance(p[0], str)
        )
        assert wire[0] % 2 == 0, k  # even-bits ladder
    _, res_raw = run(False)
    for p in paths:
        for key in res_raw[p]:
            assert res_raw[p][key] == res[p][key], (p, key)


def test_sticky_refusal_stops_planning(tmp_path):
    """Incompressible buckets must stop paying plan_for after the
    opening batches: ~0.3 s/batch of host diffs for nothing (measured
    r4 on the bench fixture, which needs 15-bit residuals)."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav

    rng = np.random.default_rng(5)
    sr = 8000
    paths = []
    for i in range(4):
        p = tmp_path / f"n{i}.wav"
        x = rng.integers(-32768, 32768, size=int(0.6 * sr)).astype(np.int16)
        write_wav(str(p), x.astype(np.float32) / 32768.0, sr)
        paths.append(str(p))
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=sr)
    eng = EvalEngine(
        specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
        testee=BatchedTestee(), batch_size=1, wire_codec=True,
    )
    res = eng.evaluate_files(paths)
    bucket_keys = [k for k in eng._compiled if k and k[0] == "wireplan"]
    assert bucket_keys and all(eng._compiled[k] is False for k in bucket_keys)
    misses = [v for k, v in eng._compiled.items() if k and k[0] == "wiremiss"]
    assert misses == [2]  # planned exactly twice, then gave up
    assert not [
        k for k in eng._cost_args
        if k and k[0] == "fused" and fused_key_has_wire(k)
    ]
    assert all(np.isfinite(list(res[p].values())[0]["lsd"]) for p in paths)


def test_engine_mesh_packed_equals_unsharded(tmp_path):
    """Wire codec composes with the data mesh: the packed uint32 batch
    shards on its leading axis like the raw wire, and sharded metrics
    equal the unsharded raw run bit for bit."""
    import jax

    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU backend")

    sr = 8000
    paths = []
    for i in range(4):
        p = tmp_path / f"m{i}.wav"
        write_wav(str(p), 0.3 * speechlike(0.8, sr, seed=40 + i), sr)
        paths.append(str(p))
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=sr)

    def run(wire, mesh):
        eng = EvalEngine(
            specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
            testee=BatchedTestee(), batch_size=4, wire_codec=wire, mesh=mesh,
        )
        return eng, eng.evaluate_files(paths)

    eng_mesh, r_mesh = run(True, data_mesh(jax.devices()[:4]))
    assert any(
        k[0] == "fused" and fused_key_has_wire(k) for k in eng_mesh._cost_args
    ), "mesh run never dispatched a packed program"
    _, r_raw = run(False, None)
    for p in paths:
        for key in r_raw[p]:
            assert r_raw[p][key] == r_mesh[p][key], (p, key)


def test_engine_float_sources_fall_back(tmp_path):
    """Non-int16 sources must take the raw wire (no plan, no crash)."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.harness.testee import BatchedTestee
    from ssr_eval_tpu.io.audio import write_wav

    sr = 8000
    p = tmp_path / "f32.wav"
    write_wav(str(p), speechlike(0.7, sr, seed=3).astype(np.float32) * 0.41,
              sr, subtype="FLOAT")
    specs = expand_settings(setting_fft={"cutoff_freq": [4000]}, sr=sr)
    eng = EvalEngine(
        specs, input_sr=sr, output_sr=sr, evaluation_sr=sr,
        testee=BatchedTestee(), batch_size=1, wire_codec=True,
    )
    res = eng.evaluate_files([str(p)])
    assert np.isfinite(list(res[str(p)].values())[0]["lsd"])
