"""Mesh-sharded evaluation on the virtual 8-device CPU mesh: correctness
and determinism across shardings (SURVEY §4's fake-device-mesh strategy)."""

import os

import numpy as np
import pytest

import jax

import ssr_eval_tpu
from ssr_eval_tpu.harness.fixtures import ensure_synthetic_vctk
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.parallel.mesh import data_mesh, pad_batch_for_mesh


@pytest.fixture(scope="module")
def vctk_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "vctk_test"
    ensure_synthetic_vctk(str(root), files_per_speaker=1)
    return str(root)


def _run(vctk_root, tmp_path, mesh, batch_size, name):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return ssr_eval_tpu.SSR_Eval_Helper(
            BatchedTestee(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [4000, 8000]},
            auto_download=False,
            test_name=name,
            mesh=mesh,
            batch_size=batch_size,
        ).evaluate(limit_test_nums=1, limit_test_speaker=-1, verbose=False)
    finally:
        os.chdir(cwd)


def test_pad_batch_for_mesh():
    mesh = data_mesh()
    assert mesh.shape["data"] == 8
    assert pad_batch_for_mesh(5, mesh) == 8
    assert pad_batch_for_mesh(8, mesh) == 8
    assert pad_batch_for_mesh(9, mesh) == 16


def test_sharded_eval_matches_single_device(vctk_root, tmp_path):
    """8-way data-sharded sweep == unsharded sweep, bitwise-level close
    (determinism across shardings, SURVEY §4)."""
    assert len(jax.devices()) == 8
    r1 = _run(vctk_root, tmp_path, None, 8, "nomesh")
    r2 = _run(vctk_root, tmp_path, data_mesh(), 8, "mesh8")
    for spk in r1:
        if spk in ("each_speaker", "averaged"):
            continue
        for f in r1[spk]:
            for key in r1[spk][f]:
                for m, v in r1[spk][f][key].items():
                    v2 = r2[spk][f][key][m]
                    assert abs(v - v2) < 1e-5, (spk, f, key, m, v, v2)


def test_sharded_batch_actually_sharded(vctk_root, tmp_path):
    """The batch arrays really land sharded over the data axis."""
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.degrade.plan import expand_settings
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    mesh = data_mesh()
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    eng = EvalEngine(
        specs, 44100, 44100, 44100, BatchedTestee(), batch_size=8, mesh=mesh
    )
    paths = [
        os.path.join(vctk_root, spk, f)
        for spk in sorted(os.listdir(vctk_root))
        if os.path.isdir(os.path.join(vctk_root, spk))
        for f in sorted(os.listdir(os.path.join(vctk_root, spk)))
        if f.endswith(".flac")
    ][:8]
    r = eng.evaluate_files(paths)
    assert len(r) == 8
    # expand_settings takes already-doubled cutoffs (the helper doubles
    # user values); called directly, 8000 stays 8000 in the key.
    assert all("proc_fft_8000_44100" in v for v in r.values())


def test_multihost_degenerate_path(vctk_root, tmp_path):
    """multihost=True on a single process exercises the full multi-host
    flow (round-robin shard -> evaluate -> process_allgather merge ->
    coordinator-only write) and must equal the plain path."""
    (tmp_path / "a").mkdir()
    r_plain = _run(vctk_root, tmp_path / "a", None, 8, "mh_off")
    cwd = os.getcwd()
    os.chdir(tmp_path / "a")
    try:
        r_mh = ssr_eval_tpu.SSR_Eval_Helper(
            BatchedTestee(),
            input_sr=44100,
            output_sr=44100,
            evaluation_sr=44100,
            test_data_root=vctk_root,
            setting_fft={"cutoff_freq": [4000, 8000]},
            auto_download=False,
            test_name="mh_on",
        ).evaluate(limit_test_nums=1, limit_test_speaker=-1, verbose=False, multihost=True)
    finally:
        os.chdir(cwd)
    for k, v in r_plain["averaged"].items():
        for m, val in v.items():
            assert abs(r_mh["averaged"][k][m] - val) < 1e-6, (k, m)


def test_gather_results_single_process():
    from ssr_eval_tpu.parallel.multihost import (
        gather_results_to_coordinator,
        shard_paths,
    )

    local = {"a/b.flac": {"proc_fft_8000_44100": {"lsd": 1.25}}}
    merged = gather_results_to_coordinator(local)
    assert merged == local
    assert shard_paths(["x", "y", "z"], process_id=0, num_processes=2) == ["x", "z"]
    assert shard_paths(["x", "y", "z"], process_id=1, num_processes=2) == ["y"]


def test_multihost_two_process_real(tmp_path):
    """REAL 2-process multihost flow (VERDICT r2 #3): two subprocesses
    initialize a jax.distributed group over a localhost coordinator (CPU
    backend), each runs helper.evaluate(multihost=True) on its round-robin
    file shard, results gather over the process group, and ONLY the
    coordinator writes the results JSON.  Both processes' merged dicts
    must agree and match a single-process run."""
    import json
    import socket
    import subprocess
    import sys

    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_flac

    root = tmp_path / "vctk"
    for spk in ("p360", "s5"):
        d = root / spk
        d.mkdir(parents=True)
        for i in range(2):
            x = speechlike(1.0, 16000, seed=(hash((spk, i)) % 10000))
            write_flac(str(d / f"{spk}_{i:03d}_mic1.flac"), x[:, None], 16000)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(2):
        wd = tmp_path / f"w{pid}"
        wd.mkdir()
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "tests._multihost_runner",
                 f"localhost:{port}", "2", str(pid), str(root), str(wd),
                 str(out)],
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"p{pid} failed:\n{log[-3000:]}"

    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    assert r0 == r1  # every process returns the same merged result

    # coordinator-only JSON write; per-process journal suffixes
    res0 = sorted(os.listdir(tmp_path / "w0" / "results"))
    res1 = sorted(os.listdir(tmp_path / "w1" / "results"))
    assert any(f.endswith("-mh2p.json") for f in res0), res0
    assert not any(f.endswith("-mh2p.json") for f in res1), res1
    assert "mh2p.partial.p0.jsonl" in res0, res0
    assert "mh2p.partial.p1.jsonl" in res1, res1

    # the merged journals reconstruct the full result set
    from ssr_eval_tpu.harness.resume import load_partial

    os.replace(tmp_path / "w1" / "results" / "mh2p.partial.p1.jsonl",
               tmp_path / "w0" / "results" / "mh2p.partial.p1.jsonl")
    merged = load_partial(str(tmp_path / "w0" / "results" / "mh2p.partial.jsonl"))
    assert len(merged) == 4 and all(
        "proc_fft_8000_16000" in v for v in merged.values()
    )

    # equals the single-process result
    cwd = os.getcwd()
    ws = tmp_path / "wsingle"
    ws.mkdir()
    os.chdir(ws)
    try:
        rs = ssr_eval_tpu.SSR_Eval_Helper(
            BatchedTestee(),
            input_sr=16000,
            output_sr=16000,
            evaluation_sr=16000,
            test_data_root=str(root),
            setting_fft={"cutoff_freq": [4000]},
            auto_download=False,
            test_name="mh1p",
            batch_size=2,
        ).evaluate(verbose=False, multihost=False)
    finally:
        os.chdir(cwd)
    for spk in ("p360", "s5"):
        for f, keys in rs[spk].items():
            for key, ms in keys.items():
                for m, val in ms.items():
                    assert abs(r0[spk][f][key][m] - val) < 1e-5, (spk, f, key, m)


def test_mesh_sharded_model_testee_matches_unsharded(tmp_path):
    """The fused DEVICE-MODEL path (testee state as a jit argument) under a
    data-mesh sharding must reproduce the unsharded metrics — weights
    replicate, the utterance batch shards (SURVEY §2.2)."""
    import jax.numpy as jnp

    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.models.testees import NVSRTestee

    paths = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, 0.2 * speechlike(0.3, 44100, seed=90 + i), 44100)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    nv = NVSRTestee(model_name="dnn")

    def run(mesh):
        eng = EvalEngine(
            specs, input_sr=44100, output_sr=44100, evaluation_sr=44100,
            testee=nv, batch_size=2, mesh=mesh,
        )
        return eng.evaluate_files(paths)

    r_plain = run(None)
    nv._dev_state = None  # re-place params for the sharded run
    r_mesh = run(data_mesh(jax.devices()[:2]))
    for p in paths:
        for key in r_plain[p]:
            for m, v in r_plain[p][key].items():
                assert abs(r_mesh[p][key][m] - v) < 1e-4, (p, key, m)


def test_mesh_replicated_state_follows_weight_updates(tmp_path):
    """A mesh engine must re-replicate testee weights when they change
    (e.g. load_vocoder_checkpoint mid-life) instead of reusing the first
    replication forever."""
    from ssr_eval_tpu.degrade.plan import expand_settings
    from ssr_eval_tpu.harness.engine import EvalEngine
    from ssr_eval_tpu.harness.fixtures import speechlike
    from ssr_eval_tpu.io.audio import write_wav
    from ssr_eval_tpu.models.testees import NVSRTestee

    paths = []
    for i in range(2):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, 0.2 * speechlike(0.3, 44100, seed=95 + i), 44100)
        paths.append(p)
    specs = expand_settings(setting_fft={"cutoff_freq": [8000]}, sr=44100)
    nv = NVSRTestee(model_name="dnn")
    eng = EvalEngine(
        specs, input_sr=44100, output_sr=44100, evaluation_sr=44100,
        testee=nv, batch_size=2, mesh=data_mesh(jax.devices()[:2]),
    )
    r1 = eng.evaluate_files(paths)

    # swap the weights the way checkpoint loading does (_dev_state reset)
    nv.variables = jax.tree_util.tree_map(lambda a: a * 0.0, nv.variables)
    nv._dev_state = None
    r2 = eng.evaluate_files(paths)
    k = "proc_fft_8000_44100"
    assert any(
        abs(r1[p][k]["lsd"] - r2[p][k]["lsd"]) > 1e-3 for p in paths
    ), (r1[paths[0]][k], r2[paths[0]][k])
