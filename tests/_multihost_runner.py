"""Subprocess entry for the real 2-process multihost test
(tests/test_parallel.py::test_multihost_two_process_real).

Usage: python -m tests._multihost_runner <coordinator> <nprocs> <pid> \
           <data_root> <workdir> <out_json>

Each process: CPU backend, `jax.distributed.initialize` against a
localhost coordinator, then the PUBLIC flow — `SSR_Eval_Helper(...)
.evaluate(multihost=True)` — which shards files round-robin, gathers
per-file metrics over the process group, and writes the results JSON on
the coordinator only.  The merged result dict is dumped to <out_json> by
every process so the test can compare them.
"""

import json
import os
import sys


def main(coordinator, nprocs, pid, data_root, workdir, out_json):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(nprocs),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nprocs), jax.process_count()

    os.chdir(workdir)  # results/ + journals land here
    from ssr_eval_tpu.harness.helper import SSR_Eval_Helper
    from ssr_eval_tpu.harness.testee import BatchedTestee

    helper = SSR_Eval_Helper(
        BatchedTestee(),
        input_sr=16000,
        output_sr=16000,
        evaluation_sr=16000,
        test_name="mh2p",
        test_data_root=data_root,
        setting_fft={"cutoff_freq": [4000]},
        auto_download=False,
        batch_size=2,
    )
    result = helper.evaluate(limit_test_nums=-1, limit_test_speaker=-1,
                             multihost=True, verbose=False)
    with open(out_json, "w") as f:
        json.dump(result, f)
    print(f"[runner p{pid}] ok", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:7])
