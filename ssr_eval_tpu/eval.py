"""Drop-in module-path shim: the reference exposes its orchestrator as
`ssr_eval.eval` (SSR_Eval_Helper, BasicTestee).  `ssr_eval_tpu.eval`
re-exports the same names so `from ssr_eval.eval import ...` call sites
port with a package rename only."""

from ssr_eval_tpu.harness.helper import SSR_Eval_Helper
from ssr_eval_tpu.harness.testee import BasicTestee, BatchedTestee

__all__ = ["SSR_Eval_Helper", "BasicTestee", "BatchedTestee"]
