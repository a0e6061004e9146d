"""Small numeric / IO helpers shared across the framework.

Functional parity targets (reference ssr_eval/utils.py):
- ``to_log`` / ``from_log``        (utils.py:43-49) — log10(x+1e-12), 10^clip(x,max=5)
- ``dict_mean``                    (utils.py:24-28) — key-wise mean over a list of dicts
- ``write_json`` / ``load_json``   (utils.py:18-21, 31-34)
- ``write_list`` / ``read_list``   (utils.py:52-65)

Unlike the reference these are torch-free: pure NumPy on host, `jnp` inside
jitted code (both are accepted — the functions are dtype-generic).
"""

from __future__ import annotations

import json

import numpy as np

# Matches the epsilon used throughout the reference (utils.py:7, metrics.py:12).
EPS = 1e-12


def to_log(x):
    """log10(x + 1e-12); works on numpy and jax arrays."""
    return _xp(x).log10(x + EPS)


def from_log(x):
    """10 ** min(x, 5); inverse of `to_log` with the reference's +5 clip."""
    xp = _xp(x)
    return xp.power(10.0, xp.clip(x, a_min=None, a_max=5) if xp is np else xp.clip(x, max=5))


def _xp(x):
    """Pick numpy or jax.numpy based on the array type (no torch anywhere)."""
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def dict_mean(dict_list):
    """Key-wise arithmetic mean over a list of dicts of scalars."""
    return {k: float(np.mean([d[k] for d in dict_list])) for k in dict_list[0].keys()}


def write_json(obj, fname):
    with open(fname, "w") as f:
        f.write(json.dumps(obj, indent=4))


def load_json(fname):
    with open(fname, "r") as f:
        return json.load(f)


def get_framesLength(fname):
    """Frame count from a WAV header (reference utils.py:12-15)."""
    import wave

    with wave.open(fname) as f:
        return f.getparams()[3]


def get_sample_rate(fname):
    """Sample rate from a WAV header (reference utils.py:37-40)."""
    import wave

    with wave.open(fname) as f:
        return f.getparams()[2]


def pow_p_norm(signal):
    """Squared L2 norm over all dims >= 1, keepdims (reference utils.py:68-76)."""
    xp = _xp(signal)
    axes = tuple(range(1, signal.ndim))
    return xp.sum(signal * signal, axis=axes, keepdims=True)


def pow_norm(s1, s2):
    """Inner product over dims >= 2, keepdims (reference utils.py:85-92)."""
    xp = _xp(s1)
    axes = tuple(range(2, s1.ndim))
    return xp.sum(s1 * s2, axis=axes, keepdims=True)


def energy_unify(estimated, original):
    """Rescale `original` onto `estimated`'s energy (reference utils.py:79-82)."""
    target = pow_norm(estimated, original) * original
    target = target / (pow_p_norm(original) + EPS)
    return estimated, target


def write_list(items, fname):
    with open(fname, "w") as f:
        for it in items:
            f.write(f"{it}\n")


def read_list(fname):
    with open(fname, "r") as f:
        return [line.rstrip("\n") for line in f.readlines()]
