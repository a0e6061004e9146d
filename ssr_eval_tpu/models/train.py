"""NVSR training step with dp x tp mesh sharding.

The reference never trains (pytorch_lightning is used only as a Module
base class — SURVEY §2.1 C13); this module is the framework's native
training path for the mel generator, and the multi-chip program that
`__graft_entry__.dryrun_multichip` compiles:

- mesh axes ("data", "model"): the utterance batch shards over "data"
  (pure DP); large kernels shard their output-channel axis over "model"
  (tensor parallelism via XLA sharding propagation — collectives ride ICI,
  nothing is hand-written).  PP/EP/SP are intentionally out of scope for
  this model family (SURVEY §2.2): a 99M conv UNet has no pipeline depth
  or experts to cut.
- loss: L1 in log-mel space between the generator output and the
  high-resolution target (NVSR's mel-domain supervision), with BatchNorm
  batch_stats threaded as a mutable collection.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssr_eval_tpu.models.nvsr import NVSR, to_log


def make_mesh(n_devices=None, tp=None, devices=None):
    """('data', 'model') mesh; tp defaults to 2 when it divides the count.

    Fails loudly when fewer than `n_devices` devices are visible instead of
    silently truncating (the r1 dryrun crash mode): on a single-chip host
    the caller must create virtual CPU devices BEFORE backend init.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(devices)} are "
            f"visible (platform={devices[0].platform!r}). On a single-chip "
            f"host, create virtual CPU devices BEFORE any JAX backend init: "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f'jax.config.update("jax_platforms", "cpu") — see '
            f"tests/conftest.py and __graft_entry__.dryrun_multichip."
        )
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def param_sharding(path_unused, x, mesh: Mesh) -> NamedSharding:
    """Shard trailing (output-channel) axes of big kernels over 'model'."""
    tp = mesh.shape["model"]
    if (
        tp > 1
        and getattr(x, "ndim", 0) >= 2
        and x.shape[-1] % tp == 0
        and x.shape[-1] >= 64
    ):
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model"))
    return NamedSharding(mesh, P())


def shard_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, param_sharding(None, x, mesh)), tree
    )


class NVSRTrainer:
    """Generator training over a device mesh."""

    def __init__(self, model_name="unet", learning_rate=1e-4, mesh: Mesh | None = None):
        self.model = NVSR(model_name=model_name)
        self.tx = optax.adamw(learning_rate)
        self.mesh = mesh

    def init_state(self, rng, t_frames=64, n_mels=128, batch=2):
        mel = jnp.ones((batch, t_frames, n_mels), jnp.float32)
        variables = self.model.init(rng, mel, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            params = shard_tree(params, self.mesh)
            batch_stats = shard_tree(batch_stats, self.mesh)
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            opt_state = shard_tree(opt_state, self.mesh)
        return {"params": params, "batch_stats": batch_stats, "opt": opt_state}

    def _step(self, state, mel_lr, mel_hr):
        def loss_fn(params):
            out, updates = self.model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                mel_lr,
                train=True,
                mutable=["batch_stats"],
            )
            loss = jnp.mean(jnp.abs(out["mel"] - to_log(mel_hr)))
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        upd, new_opt = self.tx.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], upd)
        return {"params": new_params, "batch_stats": new_stats, "opt": new_opt}, loss

    @functools.cached_property
    def step(self):
        """Jitted train step; batch arrays shard over the 'data' axis."""
        if self.mesh is None:
            return jax.jit(self._step)
        data_sh = NamedSharding(self.mesh, P("data"))
        return jax.jit(self._step, in_shardings=(None, data_sh, data_sh))

    def fit(
        self,
        audios,
        steps: int = 100,
        batch: int = 8,
        crop_seconds: float = 1.0,
        seed: int = 0,
        ckpt_path: str | None = None,
        ckpt_every: int = 50,
        log_every: int = 10,
        cutoffs=(2000, 4000, 8000, 12000),
    ):
        """Train the mel generator on HR audio with on-device degradation.

        audios: list of float32 HR waveforms at 44.1 kHz (host).  Returns
        (state, losses).  Checkpoints via models/checkpoint.py when
        `ckpt_path` is given.
        """
        from ssr_eval_tpu.models.data import MelPairPipeline

        pipe = MelPairPipeline(crop_seconds=crop_seconds, cutoffs=cutoffs)
        rng = np.random.default_rng(seed)
        state = self.init_state(jax.random.PRNGKey(seed))
        losses = []
        for step in range(steps):
            wav = pipe.random_crops(audios, rng, batch)
            mel_lr, mel_hr = pipe.make_pair(wav, spec_idx=step)
            if self.mesh is not None:
                sh = NamedSharding(self.mesh, P("data"))
                mel_lr = jax.device_put(mel_lr, sh)
                mel_hr = jax.device_put(mel_hr, sh)
            state, loss = self.step(state, mel_lr, mel_hr)
            losses.append(float(loss))
            if log_every and step % log_every == 0:
                print(f"[train] step {step} loss {losses[-1]:.4f}")
            if ckpt_path and ckpt_every and (step + 1) % ckpt_every == 0:
                from ssr_eval_tpu.models.checkpoint import save_variables

                save_variables(
                    ckpt_path,
                    {"params": state["params"], "batch_stats": state["batch_stats"]},
                )
        return state, losses

    def make_batch(self, rng, batch, t_frames=64, n_mels=128):
        k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
        mel_lr = jnp.abs(jax.random.normal(k1, (batch, t_frames, n_mels))) + 1e-3
        mel_hr = mel_lr + 0.1 * jnp.abs(jax.random.normal(k2, mel_lr.shape))
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            mel_lr = jax.device_put(mel_lr, sh)
            mel_hr = jax.device_put(mel_hr, sh)
        return mel_lr, mel_hr
