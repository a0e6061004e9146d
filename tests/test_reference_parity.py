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


# ---- examples/NVSR side (repo content, not the pip package) ------------
# The example stack's public names map onto the models/ modules.  Torch-
# specific initializer helpers and the unet file's UNUSED legacy classes
# are deliberately excluded (documented in COVERAGE.md C14):
#   init_layer/init_bn/init_gru — torch in-place init; flax modules carry
#     their initializers in the module definition.
#   act — activation selector used only by the legacy blocks.
#   ConvBlock/EncoderBlock/DecoderBlock(+Res1B variants in unet.py) —
#     defined but unused by UNetResComplex_100Mb; the Res1B classes are
#     structurally identical to Res4B (models/unet.py docstring).
#   get_n_params appears twice in the reference (nvsr_unet + main).
NVSR_SIDE = {
    "examples/NVSR/nvsr_unet.py": (
        "ssr_eval_tpu.models.nvsr",
        {"BN_GRU", "NVSR", "Generator", "to_log", "from_log", "get_n_params"},
    ),
    "examples/NVSR/main.py": (
        "ssr_eval_tpu.models.testees",
        {"NVSRBaseTestee", "NVSRTestee", "NVSRPostProcTestee",
         "NVSRPaddingPostProcTestee"},
    ),
    "examples/NVSR/mel_scale.py": (
        "ssr_eval_tpu.models.mel",
        {"MelScale", "melscale_fbanks"},
    ),
    "examples/NVSR/components/unet.py": (
        "ssr_eval_tpu.models.unet",
        {"UNetResComplex_100Mb", "ConvBlockRes"},
    ),
}


@pytest.mark.parametrize("ref_file", sorted(NVSR_SIDE))
def test_nvsr_side_symbols_exist(ref_file):
    mod_name, expected = NVSR_SIDE[ref_file]
    ref_syms = set(
        _public_symbols(os.path.join(os.path.dirname(REF_ROOT), ref_file))
    )
    # the curated set must stay a subset of what the reference really has
    assert expected <= ref_syms | {"NVSRBaseTestee"}, expected - ref_syms
    ours = importlib.import_module(mod_name)
    missing = [s for s in expected if not hasattr(ours, s)]
    assert not missing, f"{mod_name} lacks: {missing}"


def test_nvsr_side_extra_symbols_from_main():
    """main.py's free functions live in models.nvsr (to_log/from_log/
    trim_center/get_n_params are shared with nvsr_unet there)."""
    from ssr_eval_tpu.models import nvsr

    for s in ("to_log", "from_log", "trim_center", "get_n_params"):
        assert hasattr(nvsr, s), s
