from ssr_eval_tpu.harness.testee import BasicTestee, BatchedTestee
from ssr_eval_tpu.harness.helper import SSR_Eval_Helper
from ssr_eval_tpu.harness.smoke import test

__all__ = ["BasicTestee", "BatchedTestee", "SSR_Eval_Helper", "test"]
