from ssr_eval_tpu.metrics.kernels import metric_stft_config, spectral_metrics
from ssr_eval_tpu.metrics.audio_metrics import AudioMetrics

__all__ = ["AudioMetrics", "metric_stft_config", "spectral_metrics"]
