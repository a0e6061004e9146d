"""Reference-compatible `AudioMetrics` facade over the JAX metric kernels.

API parity with reference ssr_eval/metrics.py:15-132:
    AudioMetrics(rate).evaluation(est, target, file) ->
        {"lsd": float, "log_sispec": float, "sispec": float, "ssim": float}

accepting either two 1-D numpy arrays or two file paths (decoded at the
evaluation rate, mono).  Inputs are validated with the reference's
invariants (|len diff| < 100, 1-D shapes — metrics.py:82-87,71-75).

Under the hood each pair is padded into a power-of-two-ish length bucket
and fed to one jitted, bucket-shared kernel, so repeated calls at similar
lengths hit the compile cache.  Batch work should use
`ssr_eval_tpu.metrics.kernels.batched_spectral_metrics` directly (the
harness does).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ssr_eval_tpu.metrics.kernels import metric_stft_config, spectral_metrics


from ssr_eval_tpu.utils.bucket import bucket_length as _bucket_len


@functools.lru_cache(maxsize=64)
def _compiled_kernel(rate: int, lmax: int):
    cfg = metric_stft_config(rate)
    mf = cfg.max_frames(lmax)

    @jax.jit
    def run(est, est_len, tgt, tgt_len):
        return spectral_metrics(est, est_len, tgt, tgt_len, cfg, mf)

    return run


class AudioMetrics:
    def __init__(self, rate, precision="float32"):
        """precision: 'float32' (jitted device kernels, the throughput
        path) or 'float64' (host NumPy, exact-precision cross-check —
        PARITY.md deviation 4)."""
        self.rate = int(rate)
        self.precision = precision
        # Kept as public attributes for reference parity (metrics.py:17-19).
        self.hop_length = int(rate / 100)
        self.n_fft = int(2048 / (44100 / rate))

    def read(self, est, target):
        from ssr_eval_tpu.io.audio import load

        est_wav, _ = load(est, sr=self.rate, mono=True)
        target_wav, _ = load(target, sr=self.rate, mono=True)
        return est_wav, target_wav

    def wav_to_spectrogram(self, wav):
        """[1, 1, T, F] magnitude spectrogram (layout parity, metrics.py:26-30)."""
        from ssr_eval_tpu.dsp.spectral import StftConfig, stft_magnitude

        wav = np.asarray(wav, dtype=np.float32)
        cfg = metric_stft_config(self.rate)
        mf = cfg.max_frames(len(wav))
        sp = stft_magnitude(jnp.asarray(wav), len(wav), cfg, mf)
        return np.asarray(sp)[None, None, ...]

    def center_crop(self, x, y):
        """Center-crop the longer of two [., ., T, F] spectrogram arrays to
        the shorter's time length (reference metrics.py:32-49; unused by
        the pipeline but part of the public surface).  Accepts numpy."""
        x = np.asarray(x)
        y = np.asarray(y)
        dim = 2
        if x.shape[dim] == y.shape[dim]:
            return x, y
        if x.shape[dim] > y.shape[dim]:
            offset = x.shape[dim] - y.shape[dim]
            start = offset // 2
            end = offset - start
            x = x[:, :, start:-end, :]
        else:
            offset = y.shape[dim] - x.shape[dim]
            start = offset // 2
            end = offset - start
            y = y[:, :, start:-end, :]
        assert offset < 10, (
            "Error: the offset %s is too large, check the code please" % (offset)
        )
        return x, y

    # -- per-metric public surface (reference metrics.py:109-132) --------
    # Spectrogram-level conveniences on [B, C, T, F] arrays (the layout
    # wav_to_spectrogram emits); numpy in/out, torch tensors accepted.

    @staticmethod
    def _np4(x):
        if hasattr(x, "detach"):  # torch tensor
            x = x.detach().cpu().numpy()
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 4, f"expected [B, C, T, F], got {x.shape}"
        return x

    def lsd(self, est, target):
        """[B, C, 1, 1] log-spectral distance (metrics.py:109-112)."""
        est, target = self._np4(est), self._np4(target)
        r = np.log10(target**2 / ((est + 1e-12) ** 2) + 1e-12) ** 2
        return np.mean(np.sqrt(np.mean(r, axis=3)), axis=2)[..., None, None]

    def sispec(self, est, target):
        """Batch-summed scale-invariant spectral SNR (metrics.py:114-121)."""
        from ssr_eval_tpu.utils.common import energy_unify, pow_p_norm

        est, target = self._np4(est), self._np4(target)
        out, tgt = energy_unify(est, target)
        noise = out - tgt
        loss = 10.0 * np.log10(pow_p_norm(tgt) / (pow_p_norm(noise) + 1e-12) + 1e-12)
        return float(np.sum(loss) / loss.shape[0])

    def ssim(self, est, target):
        """[B, C, 1, 1] mean SSIM per (batch, channel) — skimage-default
        semantics via the jitted reduce_window kernel (metrics.py:123-132)."""
        from ssr_eval_tpu.metrics.kernels import _ssim

        est, target = self._np4(est), self._np4(target)
        res = np.zeros(est.shape[:2])
        for b in range(est.shape[0]):
            for c in range(est.shape[1]):
                res[b, c] = float(
                    _ssim(jnp.asarray(est[b, c]), jnp.asarray(target[b, c]),
                          est.shape[2])
                )
        return res[..., None, None]

    def evaluation(self, est, target, file=None):
        if type(est) != type(target) and not (
            isinstance(est, np.ndarray) and isinstance(target, np.ndarray)
        ):
            raise ValueError(
                "The input value should either both be numpy array or strings"
            )
        if isinstance(est, str):
            est_wav, target_wav = self.read(est, target)
        else:
            assert est.ndim == 1 and target.ndim == 1, (
                "The input numpy array shape should be [samples,]. "
                f"Got input shape {est.shape} and {target.shape}. "
            )
            est_wav, target_wav = est, target

        assert abs(target_wav.shape[0] - est_wav.shape[0]) < 100, (
            "Error: Shape mismatch between target and estimation "
            f"{target_wav.shape} and {est_wav.shape}"
        )

        if self.precision == "float64":
            from ssr_eval_tpu.metrics.host_reference import evaluate_f64

            return evaluate_f64(est_wav, target_wav, self.rate)

        lmax = _bucket_len(max(est_wav.shape[0], target_wav.shape[0]))
        eb = np.zeros(lmax, dtype=np.float32)
        tb = np.zeros(lmax, dtype=np.float32)
        eb[: est_wav.shape[0]] = est_wav
        tb[: target_wav.shape[0]] = target_wav

        run = _compiled_kernel(self.rate, lmax)
        out = run(
            jnp.asarray(eb),
            jnp.int32(est_wav.shape[0]),
            jnp.asarray(tb),
            jnp.int32(target_wav.shape[0]),
        )
        return {k: float(out[k]) for k in ("lsd", "log_sispec", "sispec", "ssim")}
