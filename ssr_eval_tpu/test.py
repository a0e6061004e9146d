"""Drop-in module-path shim for the reference's `ssr_eval.test`
(smoke-run entry: MyTestee + test(), reference ssr_eval/test.py:1-38)."""

from ssr_eval_tpu.harness.smoke import MyTestee, test

__all__ = ["MyTestee", "test"]
