"""The README smoke run (reference ssr_eval/test.py:21-38): identity
testee, FFT-mask at 12 kHz cutoff, 44.1 kHz model rates, 48 kHz
evaluation, 10 utterances per speaker."""

from __future__ import annotations

from ssr_eval_tpu.harness.helper import SSR_Eval_Helper
from ssr_eval_tpu.harness.testee import BasicTestee


class MyTestee(BasicTestee):
    def __init__(self) -> None:
        super().__init__()

    def infer(self, x):
        """A testee that directly returns the input"""
        return x


def test(test_data_root="./datasets/vctk_test", **kwargs):
    testee = MyTestee()
    helper = SSR_Eval_Helper(
        testee,
        test_name="unprocessed",
        input_sr=44100,
        output_sr=44100,
        evaluation_sr=48000,
        setting_fft={"cutoff_freq": [12000]},
        test_data_root=test_data_root,
        save_processed_result=True,
        **kwargs,
    )
    return helper.evaluate(limit_test_nums=10, limit_test_speaker=-1)
