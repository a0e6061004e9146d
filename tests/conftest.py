"""Test env: force a virtual 8-device CPU mesh before any backend init.

This is the standard pattern for testing pjit/shard_map sharding without
real TPUs (SURVEY.md §4).  The environment pins ``jax_platforms=axon,cpu``
(tunnel TPU), so the env var alone is not enough — we must override the
config.  Benchmarks (bench.py) run on the real chip and do NOT import this.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
