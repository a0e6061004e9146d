"""Automated symbol-level parity audit against the reference source.

Parses every public module-level function/class and every public method
in the reference's `ssr_eval/` package (AST only — the reference imports
librosa/torchlibrosa, which this image deliberately lacks) and asserts
the drop-in `ssr_eval` alias package exposes the same names.  This is
the line-by-line "a reference user finds everything they need" check,
run mechanically instead of by hand.

Skipped when the reference checkout is absent (the framework itself is
standalone; this test is a development-time audit).
"""

import ast
import importlib
import os

import pytest

REF_ROOT = "/root/reference/ssr_eval"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present"
)

# Reference-module -> alias-module mapping (identical names).
MODULES = ["eval", "lowpass", "metrics", "dsp", "utils", "test"]

# Reference symbols that are bug artifacts/dead code kept OUT on purpose
# must be listed in PARITY.md; today none are excluded.
EXCLUDE: set = set()


def _public_symbols(path):
    """{name: None} for defs/classes, {Class.method: None} for methods."""
    tree = ast.parse(open(path).read())
    out = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not node.name.startswith("_"):
                out[node.name] = None
        elif isinstance(node, ast.ClassDef):
            if node.name.startswith("_"):
                continue
            out[node.name] = None
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not sub.name.startswith("_"):
                        out[f"{node.name}.{sub.name}"] = None
    return out


@pytest.mark.parametrize("mod", MODULES)
def test_reference_module_symbols_exist(mod):
    ref_path = os.path.join(REF_ROOT, f"{mod}.py")
    symbols = [s for s in _public_symbols(ref_path) if s not in EXCLUDE]
    ours = importlib.import_module(f"ssr_eval.{mod}")
    missing = []
    for sym in symbols:
        if "." in sym:
            cls_name, meth = sym.split(".", 1)
            cls = getattr(ours, cls_name, None)
            if cls is None or not hasattr(cls, meth):
                missing.append(sym)
        elif not hasattr(ours, sym):
            missing.append(sym)
    assert not missing, f"ssr_eval.{mod} lacks reference symbols: {missing}"


def test_reference_package_exports_exist():
    """ssr_eval/__init__.py re-exports (reference __init__.py:1-2)."""
    import ssr_eval

    for sym in ("SSR_Eval_Helper", "BasicTestee", "test"):
        assert hasattr(ssr_eval, sym), sym
