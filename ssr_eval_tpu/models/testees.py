"""NVSR testees — device-native (batched, jittable) counterparts of the
reference's three evaluation entry points (examples/NVSR/main.py:96-163):

- `NVSRTestee`:        mel -> generator -> vocoder
- `NVSRPostProcTestee`: + ground-truth low-band splice (BasicTestee.
  postprocessing, reference eval.py:33-41) — here fully on device
- `NVSRPaddingPostProcTestee`: generator ablation — tiles the mel row at
  the detected cutoff into all higher bands before vocoding
  (main.py:138-163)

All three implement the BatchedTestee protocol, so the harness fuses
degrade -> infer -> metrics into a single sharded XLA program per bucket.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.dsp.spectral import (
    StftConfig,
    istft,
    n_frames_for_length,
    stft_magnitude,
    stft_real_imag,
)
from ssr_eval_tpu.harness.testee import BatchedTestee
from ssr_eval_tpu.models.nvsr import NVSR, NVSR_STFT, from_log, trim_center

CKPT_URL = (
    "https://zenodo.org/record/6370601/files/epoch%3D11-step%3D22499-val_l%3D0.27.ckpt"
)
_POSTPROC_STFT = StftConfig(n_fft=2048, hop=512)


def batched_cutoff_index(x, lengths, cfg=_POSTPROC_STFT, threshold=0.97):
    """Device version of BasicTestee._get_cutoff_index (eval.py:28-31):
    largest STFT bin whose cumulative (over bins) summed magnitude is
    below threshold * total.  x: [B, Lmax] -> [B] int32."""
    B, lmax = x.shape
    mf = cfg.max_frames(lmax)

    def one(xi, li):
        mag = stft_magnitude(xi, li, cfg, mf)
        nf = n_frames_for_length(cfg, li)
        fmask = (jnp.arange(mf) < nf)[:, None].astype(mag.dtype)
        energy = jnp.cumsum(jnp.sum(mag * fmask, axis=0))
        thr = energy[-1] * threshold
        below = energy < thr
        idx = jnp.where(below, jnp.arange(energy.shape[0]), -1)
        return jnp.maximum(jnp.max(idx), 0).astype(jnp.int32)

    return jax.vmap(one)(x, lengths)


def batched_low_band_splice(x, x_len, out, out_len, cutoff_bins):
    """Device version of BasicTestee.postprocessing (eval.py:33-41):
    replace out's STFT bins below each utterance's cutoff with the
    ground-truth bins, resynthesize at out's length."""
    cfg = _POSTPROC_STFT
    lmax = out.shape[1]
    mf = cfg.max_frames(lmax)

    def one(xi, xl, oi, ol, cut):
        gr, gi = stft_real_imag(xi, xl, cfg, mf)
        orr, oim = stft_real_imag(oi, ol, cfg, mf)
        low = (jnp.arange(cfg.n_bins) < cut)[None, :]
        nf = n_frames_for_length(cfg, ol)
        fmask = (jnp.arange(mf) < nf)[:, None].astype(gr.dtype)
        real = jnp.where(low, gr, orr) * fmask
        imag = jnp.where(low, gi, oim) * fmask
        return istft(real, imag, ol, cfg, lmax)

    return jax.vmap(one)(x, x_len, out, out_len, cutoff_bins)


class NVSRTestee(BatchedTestee):
    """Generator + vocoder inference (reference main.py:96-109)."""

    jittable = True
    # Big conv stacks: keep the folded G*B-row model call (the engine's
    # single-spec-loop default is for cheap testees only).
    infer_cost_hint = "model"

    def __init__(self, model_name="unet", params=None, seed=234, ckpt=None,
                 dtype=None, param_dtype=None, fold_bn=False):
        """dtype: model computation dtype, e.g. jnp.bfloat16 for ~2x conv
        throughput at inference (the eval DSP stays float32).
        param_dtype: storage dtype for the WEIGHTS as uploaded to the
        device (batch-norm statistics stay float32 for eval-mode
        numerics).  jnp.bfloat16 halves weight HBM traffic and removes
        the per-call f32->bf16 weight casts when dtype is bfloat16.
        fold_bn: fold eval-mode BatchNorms into adjacent conv/dense
        weights where exact (models/fold_bn.py) — inference only."""
        super().__init__()
        self.model = NVSR(model_name=model_name, dtype=dtype)
        self.param_dtype = param_dtype
        if ckpt is not None:
            params = self.load_checkpoint(ckpt)
        if params is None:
            params = self._random_init(seed)
        self.variables = params
        if fold_bn:
            from ssr_eval_tpu.models.fold_bn import fold_nvsr_bn

            self.model, self.variables = fold_nvsr_bn(self.model, self.variables)

    def _random_init(self, seed):
        # Init on the CPU backend: tracing init_all through the tunnel's
        # remote compiler costs minutes; random init needs no TPU.
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            rng = jax.random.PRNGKey(seed)
            mel = jnp.abs(jax.random.normal(rng, (1, 128, 128))) + 1e-3
            return self.model.init(rng, mel, train=False, method=NVSR.init_all)

    def device_state(self):
        """Model variables resident on the default (accelerator) device.

        `_random_init`/checkpoint loading build the tree on the CPU
        backend; without this one-time device_put every fused engine call
        would re-upload the full 65M-param tree (~260 MB) through the
        tunnel — measured at ~10 s per batch."""
        if getattr(self, "_dev_state", None) is None:
            # explicit target: device_put without a device leaves arrays
            # committed to the CPU backend where they were, er, committed
            dev = jax.devices()[0]
            tree = self.variables
            if self.param_dtype is not None:
                tree = dict(tree)
                tree["params"] = jax.tree_util.tree_map(
                    lambda a: a.astype(self.param_dtype)
                    if hasattr(a, "astype") and a.dtype == jnp.float32
                    else a,
                    tree.get("params", {}),
                )
            self._dev_state = jax.device_put(tree, dev)
        return self._dev_state

    def load_checkpoint(self, path):
        """Convert a torch NVSR state dict (the reference's Zenodo ckpt,
        main.py:50-79) into Flax variables via models/convert.py.
        Checkpoints are always UNFOLDED; a fold_bn testee re-folds the
        fresh tree when this is called after construction."""
        from ssr_eval_tpu.models.convert import torch_nvsr_to_flax

        variables = torch_nvsr_to_flax(path, self.model)
        if getattr(self.model, "fold_bn", False):
            from ssr_eval_tpu.models.fold_bn import fold_nvsr_bn

            _, variables = fold_nvsr_bn(
                self.model.clone(fold_bn=False), variables
            )
            self.variables = variables
            self._dev_state = None
        return variables

    def load_generator_checkpoint(self, path):
        """Graft a natively-trained generator tree (models/train.py state,
        saved via models/checkpoint.py) into this testee's variables —
        the symmetric counterpart of `load_vocoder_checkpoint` for the
        framework's own training path.  The saved tree is
        {"params": {"generator": ...}, "batch_stats": {"generator": ...}}
        (NVSR.__call__ traces the generator only)."""
        from ssr_eval_tpu.models.checkpoint import restore_variables

        if getattr(self.model, "fold_bn", False):
            raise ValueError(
                "load_generator_checkpoint grafts an UNFOLDED generator "
                "tree; construct the testee with fold_bn=False (fold after "
                "loading via models/fold_bn.fold_nvsr_bn if needed)."
            )
        tree = restore_variables(path)
        v = dict(self.variables)
        p = dict(v.get("params", {}))
        p["generator"] = tree["params"]["generator"]
        v["params"] = p
        if tree.get("batch_stats"):
            bs = dict(v.get("batch_stats", {}))
            bs["generator"] = tree["batch_stats"]["generator"]
            v["batch_stats"] = bs
        self.variables = v
        self._dev_state = None

    def load_vocoder_checkpoint(self, path, cfg=None, check=True,
                                check_threshold=0.5):
        """Graft a voicefixer-structure vocoder state dict (torch) into
        the model's vocoder subtree (convert.vocoder_state_dict_to_flax).

        With cfg=None the hyperparameters (widths, ratios, kernels, block
        counts) are INFERRED from the checkpoint's tensor shapes
        (convert.infer_vocoder_config), and the model's vocoder module is
        rebuilt to match when they differ from the current config — the
        real voicefixer checkpoint self-adapts with zero manual config.

        check=True (default) runs the load-time sanity check
        (models/vocoder_check.py): synthesize from a probe mel and require
        the output's own mel to correlate with the conditioning, so a
        TRAINED checkpoint whose shape-invisible constants (dilations,
        mel-norm min_db/max_abs/ref_db) differ from the reconstruction
        fails loudly (VocoderSanityError) instead of silently degrading
        quality.  Random-weight mirrors (conversion tests) must pass
        check=False — unconditioned synthesis fails by construction.
        Returns the list of unmatched tensor names (empty on full match)."""
        import torch

        from ssr_eval_tpu.models.convert import (
            infer_vocoder_config,
            vocoder_state_dict_to_flax,
        )

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict):
            for k in ("state_dict", "generator", "model"):
                if k in sd and isinstance(sd[k], dict):
                    sd = sd[k]
                    break
        if cfg is None:
            cfg = infer_vocoder_config(sd)
        if cfg != (self.model.vocoder_cfg or
                   type(cfg)(n_mels=self.model.n_mels)):
            self.model = self.model.clone(vocoder_cfg=cfg)
        params, unmatched = vocoder_state_dict_to_flax(sd, cfg, wrap_model=True)
        if unmatched:
            print(
                f"[convert] vocoder: {len(unmatched)} unmatched tensors: "
                f"{unmatched[:5]} ..."
            )
        v = dict(self.variables)
        p = dict(v.get("params", {}))
        p["vocoder"] = params
        v["params"] = p
        self.variables = v
        self._dev_state = None  # re-upload on next device_state()
        if check:
            from ssr_eval_tpu.models.vocoder_check import check_vocoder

            check_vocoder(self.model, self.variables,
                          threshold=check_threshold)
        return unmatched

    # -- the fused device path ------------------------------------------

    def _mel_of(self, x, lengths, state):
        B, lmax = x.shape
        mf = NVSR_STFT.max_frames(lmax)

        def one(xi, li):
            _, mel = self.model.apply(state, xi, li, mf, method=NVSR.pre)
            return mel

        return jax.vmap(one)(x, lengths), mf

    def _vocode(self, log_mel, lengths, state):
        wav = self.model.apply(state, log_mel, method=NVSR.synthesize)
        return jax.vmap(trim_center)(wav, lengths), lengths

    def infer_batch(self, x, lengths, state=None):
        state = state if state is not None else self.variables
        mel, _ = self._mel_of(x, lengths, state)
        out = self.model.apply(state, mel, train=False)
        return self._vocode(out["mel"], lengths, state)


class NVSRPostProcTestee(NVSRTestee):
    """+ low-band GT splice after vocoding (reference main.py:112-127)."""

    def infer_batch(self, x, lengths, state=None):
        y, ny = super().infer_batch(x, lengths, state)
        cut = batched_cutoff_index(x, lengths)
        lmax = max(x.shape[1], y.shape[1])
        xp = jnp.pad(x, ((0, 0), (0, lmax - x.shape[1])))
        yp = jnp.pad(y, ((0, 0), (0, lmax - y.shape[1])))
        out = batched_low_band_splice(xp, lengths, yp, ny, cut)
        return out, ny


class NVSRPaddingPostProcTestee(NVSRTestee):
    """Vocoder-only ablation: tile the mel band at the cutoff upward
    (add_segment_to_higher_freq, main.py:138-151), vocode, then splice."""

    def _tile_mel(self, mel):
        # mel: [B, T, M] linear mel. cutoff over mel bands via cumulative
        # summed energy (get_cutoff_index_v2, main.py:100-102).
        def one(m):
            energy = jnp.cumsum(jnp.sum(m, axis=0))  # [M]
            thr = energy[-1] * 0.97
            below = energy < thr
            cut = jnp.maximum(
                jnp.max(jnp.where(below, jnp.arange(m.shape[1]), -1)), 0
            )
            row = m[:, cut]  # [T]
            bands = jnp.arange(m.shape[1])[None, :]
            keep_low = bands < cut
            return jnp.where(keep_low, m, row[:, None])

        return jax.vmap(one)(mel)

    def infer_batch(self, x, lengths, state=None):
        state = state if state is not None else self.variables
        mel, _ = self._mel_of(x, lengths, state)
        tiled = self._tile_mel(mel)
        from ssr_eval_tpu.models.nvsr import to_log

        y, ny = self._vocode(to_log(tiled), lengths, state)
        cut = batched_cutoff_index(x, lengths)
        lmax = max(x.shape[1], y.shape[1])
        xp = jnp.pad(x, ((0, 0), (0, lmax - x.shape[1])))
        yp = jnp.pad(y, ((0, 0), (0, lmax - y.shape[1])))
        out = batched_low_band_splice(xp, lengths, yp, ny, cut)
        return out, ny


def download_checkpoint(cache_dir=None):
    """Fetch the reference's pretrained 99M ckpt (main.py:50-79 behavior)
    with checked errors; zero-egress environments get a clear message."""
    import urllib.request

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "ssr_eval_tpu", "NVSR"
    )
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, "epoch=11-step=22499-val_l=0.27.pth")
    if os.path.exists(path):
        return path
    try:
        urllib.request.urlretrieve(CKPT_URL, path)
    except Exception as e:
        raise RuntimeError(
            f"Could not download the NVSR checkpoint ({e}). Supply a local "
            "torch state dict via NVSRTestee(ckpt=...)."
        ) from e
    return path


# Reference name parity (examples/NVSR/main.py:48-93): the base testee's
# responsibilities (checkpoint fetch/load, wav->mel pre, device state) all
# live on NVSRTestee here, so the base IS the plain inference testee.
NVSRBaseTestee = NVSRTestee
