"""Drop-in alias package: `ssr_eval` -> `ssr_eval_tpu`.

Reference call sites (`from ssr_eval import SSR_Eval_Helper, BasicTestee,
test`, reference ssr_eval/__init__.py:1-2, and the submodule imports
`ssr_eval.eval` / `ssr_eval.lowpass` / `ssr_eval.test` / `ssr_eval.dsp` /
`ssr_eval.metrics` / `ssr_eval.utils`) run unmodified against the
TPU-native implementation.  As in the reference, the package attribute
`test` is the smoke-run callable (the star import of the `test` module's
names shadows the submodule), while `import ssr_eval.test` still reaches
the module via the sys.modules aliases below.
"""

import importlib as _importlib
import sys as _sys

import ssr_eval_tpu as _impl
from ssr_eval_tpu import *  # noqa: F401,F403
from ssr_eval_tpu import SSR_Eval_Helper, BasicTestee, test  # noqa: F401

for _name, _target in [
    ("eval", "ssr_eval_tpu.eval"),
    ("lowpass", "ssr_eval_tpu.lowpass"),
    ("test", "ssr_eval_tpu.test"),
    ("dsp", "ssr_eval_tpu.dsp.fdomain"),
    ("metrics", "ssr_eval_tpu.metrics.audio_metrics"),
    ("utils", "ssr_eval_tpu.utils.common"),
]:
    _sys.modules[__name__ + "." + _name] = _importlib.import_module(_target)

__version__ = _impl.__version__
__all__ = ["SSR_Eval_Helper", "BasicTestee", "test"]
