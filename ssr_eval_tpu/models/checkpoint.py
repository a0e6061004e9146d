"""Model-weight checkpointing (Orbax, with a NumPy .npz fallback).

The reference only ever *loads* torch checkpoints (examples/NVSR/
main.py:50-79).  The framework adds native save/restore of Flax variable
trees so trained/converted models round-trip without torch:

    save_variables(path, variables)
    variables = restore_variables(path)
"""

from __future__ import annotations

import os

import numpy as np
import jax


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = v
    return tree


def save_variables(path: str, variables) -> str:
    """Save a Flax variables tree; uses Orbax when available, else npz."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(variables))
        return path
    except Exception:
        flat = _flatten(jax.device_get(variables))
        np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
        return path if path.endswith(".npz") else path + ".npz"


def save_variables_npz(path: str, variables) -> str:
    """Force the single-file .npz format (portable, diff-able — the right
    shape for artifacts checked into the repo; Orbax writes a directory)."""
    flat = _flatten(jax.device_get(variables))
    p = path if path.endswith(".npz") else path + ".npz"
    np.savez(p, **flat)
    return p


def restore_variables(path: str):
    if path.endswith(".npz") or (not os.path.isdir(path) and os.path.exists(path + ".npz")):
        p = path if path.endswith(".npz") else path + ".npz"
        with np.load(p) as z:
            return _unflatten({k: z[k] for k in z.files})
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
