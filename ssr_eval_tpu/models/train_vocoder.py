"""Native vocoder training — mel -> waveform, log-mel reconstruction loss.

The reference ships a PRETRAINED voicefixer vocoder and never trains one
(examples/NVSR/nvsr_unet.py:84); in a zero-egress environment that
checkpoint is unreachable, so the trained-weights code path
(convert -> graft -> vocoder_check -> evaluate) could only ever be
exercised with random weights — which the sanity check rejects by
construction.  This module closes that loop natively (VERDICT r4 #5):
train a (small) TFGAN-structure vocoder on synthetic speech until its
synthesis follows its mel conditioning, then export it as a
voicefixer-layout torch state dict so the REAL conversion path
(`NVSRTestee.load_vocoder_checkpoint` -> infer_vocoder_config ->
vocoder_state_dict_to_flax -> models/vocoder_check.py) runs end-to-end
on weights that are genuinely trained.

Loss: L1 between the log-mel of the synthesized waveform and the
conditioning log-mel (computed with the SAME front end the evaluator
uses — stft 2048/441, HTK fbanks), over interior frames.  A phase-blind
spectral loss is exactly the right objective here: the sanity check and
the LSD metric both measure spectral agreement, not phase.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ssr_eval_tpu.dsp.spectral import stft_magnitude
from ssr_eval_tpu.models.mel import MelScale
from ssr_eval_tpu.models.nvsr import NVSR_STFT, to_log
from ssr_eval_tpu.models.vocoder import TFGANConfig, Vocoder

# Small-but-real preset for offline training: same ratios as the 44.1 kHz
# voicefixer vocoder (441 = 7*7*3*3 is the hop, non-negotiable), halved
# dilated-stack depth, 96 base channels (halving stage widths 48/24/12/6
# keep infer_vocoder_config's shape-only reconstruction exact).
SMALL_TFGAN = TFGANConfig(channels=96, res_dilations=(1, 3))


class VocoderTrainer:
    """Train a TFGAN-structure vocoder with a log-mel reconstruction loss."""

    def __init__(self, cfg: TFGANConfig = SMALL_TFGAN, sample_rate=44100,
                 learning_rate=2e-4):
        self.cfg = cfg
        self.sample_rate = sample_rate
        self.model = Vocoder(cfg)
        self.tx = optax.adamw(learning_rate)
        self.mel = MelScale(n_mels=cfg.n_mels, sample_rate=sample_rate,
                            n_stft=NVSR_STFT.n_bins)

    def log_mel(self, wav_b):
        """[B, L] -> log-mel [B, T, M] via the evaluator's own front end."""
        L = wav_b.shape[1]
        mf = NVSR_STFT.max_frames(L)

        def one(w):
            sp = stft_magnitude(w, L, NVSR_STFT, mf, eps=1e-8)
            return to_log(self.mel(sp))

        return jax.vmap(one)(wav_b)

    def init_state(self, rng, t_frames=32):
        cond = jnp.ones((1, t_frames, self.cfg.n_mels), jnp.float32)
        params = self.model.init(rng, cond)["params"]
        return {"params": params, "opt": self.tx.init(params)}

    def lin_mel(self, wav_b):
        """[B, L] -> linear mel [B, T, M]."""
        L = wav_b.shape[1]
        mf = NVSR_STFT.max_frames(L)

        def one(w):
            return self.mel(stft_magnitude(w, L, NVSR_STFT, mf, eps=1e-8))

        return jax.vmap(one)(wav_b)

    @functools.cached_property
    def step(self):
        def _step(state, cond_mel, target_mel):
            def loss_fn(params):
                wav = self.model.apply({"params": params}, cond_mel)
                out = self.lin_mel(wav)
                T = min(out.shape[1], target_mel.shape[1])
                lo, hi = (2, T - 2) if T > 8 else (0, T)
                o = out[:, lo:hi]
                t = target_mel[:, lo:hi]
                # Spectral convergence (linear domain, weights the
                # high-energy structure — pure log-L1 over-weights silent
                # bands and collapses to a broadband noise floor) + log-L1
                # (floors/dynamics).
                sc = jnp.linalg.norm(o - t) / (jnp.linalg.norm(t) + 1e-6)
                logl1 = jnp.mean(jnp.abs(to_log(o) - to_log(t)))
                return sc + 0.5 * logl1

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            upd, new_opt = self.tx.update(grads, state["opt"], state["params"])
            return {
                "params": optax.apply_updates(state["params"], upd),
                "opt": new_opt,
            }, loss

        return jax.jit(_step)

    def fit(self, audios, steps=300, batch=4, crop_seconds=0.35, seed=0,
            log_every=25, state=None):
        """audios: list of HR float32 waveforms at `sample_rate`.

        Returns (state, losses); pass the state back in to continue
        training (chunked fits let a caller probe quality and stop
        early).  Conditioning = the target's own linear mel (the
        vocoder's job is resynthesis; the GENERATOR owns bandwidth
        extension — models/train.py)."""
        crop = int(crop_seconds * self.sample_rate)
        rng = np.random.default_rng(seed)
        if state is None:
            state = self.init_state(jax.random.PRNGKey(seed))
        losses = []
        mf = NVSR_STFT.max_frames(crop)

        def crops():
            out = np.zeros((batch, crop), np.float32)
            for i in range(batch):
                x = audios[rng.integers(len(audios))]
                if len(x) <= crop:
                    out[i, : len(x)] = x
                else:
                    s = rng.integers(len(x) - crop)
                    out[i] = x[s : s + crop]
            return out

        @jax.jit
        def front(wav_b):
            def one(w):
                sp = stft_magnitude(w, crop, NVSR_STFT, mf, eps=1e-8)
                return self.mel(sp)

            return jax.vmap(one)(wav_b)

        for step_i in range(steps):
            wav = jnp.asarray(crops())
            cond = front(wav)
            state, loss = self.step(state, cond, cond)
            losses.append(float(loss))
            if log_every and step_i % log_every == 0:
                print(f"[vocoder] step {step_i} loss {losses[-1]:.4f}",
                      flush=True)
        return state, losses

    def probe_corr(self, params, wav: np.ndarray) -> float:
        """Pearson correlation between `wav`'s own log-mel conditioning and
        the log-mel of the synthesis from it (interior frames) — the same
        quantity models/vocoder_check.py gates on at load time."""
        x = jnp.asarray(wav, jnp.float32)[None]
        cond = self.lin_mel(x)
        out = self.model.apply({"params": params}, cond)
        out_lm = np.asarray(self.log_mel(out))[0]
        cond_lm = np.asarray(to_log(cond))[0]
        T = min(out_lm.shape[0], cond_lm.shape[0])
        lo, hi = (2, T - 2) if T > 8 else (0, T)
        a = cond_lm[lo:hi].ravel().astype(np.float64)
        b = out_lm[lo:hi].ravel().astype(np.float64)
        a -= a.mean()
        b -= b.mean()
        denom = float(np.sqrt((a * a).sum() * (b * b).sum()))
        return 0.0 if denom == 0.0 else float((a * b).sum() / denom)


def export_torch_state_dict(params, cfg: TFGANConfig, path: str):
    """Flax vocoder params -> voicefixer-layout torch state dict (plain
    `weight`/`bias`, generator.* Sequential names) saved at `path`.

    Inverse of convert.vocoder_state_dict_to_flax's kernel transposes, so
    a round trip through the REAL conversion path is exact:
      conv1d   flax (K, I, O) -> torch (O, I, K)
      convT1d  flax (K, I, O) -> torch (I, O, K), kernel spatially flipped
    """
    import torch

    from ssr_eval_tpu.models.convert import vocoder_name_map

    tree = params.get("model", params)  # Vocoder wraps generator as 'model'
    sd = {}
    for prefix, (flax_name, kind) in vocoder_name_map(cfg).items():
        leaf = tree[flax_name]
        k = np.asarray(leaf["kernel"], dtype=np.float32)
        if kind == "convT1d":
            w = np.transpose(k, (1, 2, 0))[:, :, ::-1]  # (I, O, K), flip K
        else:
            w = np.transpose(k, (2, 1, 0))  # (O, I, K)
        sd[f"{prefix}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = torch.from_numpy(
                np.array(leaf["bias"], dtype=np.float32)
            )
    torch.save(sd, path)
    return sd
