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
