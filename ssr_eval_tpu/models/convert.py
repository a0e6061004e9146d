"""torch <-> Flax weight conversion for the NVSR model family.

The reference ships a pretrained torch state dict (Zenodo,
examples/NVSR/main.py:50-79).  This module maps it onto the Flax modules in
`models/unet.py` / `models/nvsr.py` by name pattern:

  torch `generator.analysis_module.encoder_block1.conv_block1.conv1.weight`
    -> flax params['generator']['analysis_module']['encoder_block1']
             ['conv_block1']['conv1']['kernel']   (OIHW -> HWIO)

Layout rules (validated against torch numerically in tests/test_convert.py):
  Conv2d weight        OIHW -> HWIO  transpose (2, 3, 1, 0)
  ConvTranspose2d      IOHW -> HWIO  transpose (2, 3, 0, 1)  [+ flax
                       ConvTranspose(transpose_kernel=False) computes the
                       same fractionally-strided correlation as torch when
                       the kernel is spatially flipped — handled here]
  Linear weight        (out, in) -> (in, out)
  BatchNorm2d          weight->scale, bias->bias, running_* -> batch_stats

Vocoder weights: the voicefixer vocoder's module names are external to the
reference repo; `torch_nvsr_to_flax` converts every `generator.*` tensor
and reports (does not fail on) unmatched keys, so a voicefixer state dict
can be grafted once its naming is supplied via `extra_rules`.
"""

from __future__ import annotations

import re

import numpy as np


def _to_np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w):
    return np.transpose(_to_np(w), (2, 3, 1, 0))


def conv_transpose_kernel(w):
    # torch ConvTranspose2d weight: (in, out, kh, kw).  flax ConvTranspose
    # (transpose_kernel=False) correlates the *upsampled* input with the
    # kernel, which equals torch's transposed convolution with the kernel
    # spatially flipped.
    w = _to_np(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def linear_kernel(w):
    return np.transpose(_to_np(w), (1, 0))


def torch_state_dict_to_flax(state_dict, extra_rules=None):
    """-> {'params': tree, 'batch_stats': tree} from dotted torch names."""
    params = {}
    batch_stats = {}
    unmatched = []

    def insert(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for name, tensor in state_dict.items():
        t = _to_np(tensor)
        parts = name.split(".")
        leaf = parts[-1]
        mod = parts[-2] if len(parts) >= 2 else ""
        path = parts[:-1]
        if leaf == "num_batches_tracked":
            continue
        is_bn = bool(re.match(r"bn\d*$|bn$|batchnorm", mod))
        if is_bn and leaf == "weight":
            insert(params, path + ["scale"], t)
        elif is_bn and leaf == "bias":
            insert(params, path + ["bias"], t)
        elif leaf == "running_mean":
            insert(batch_stats, path + ["mean"], t)
        elif leaf == "running_var":
            insert(batch_stats, path + ["var"], t)
        elif leaf == "weight" and t.ndim == 4:
            # conv vs conv-transpose disambiguated by module name
            if "conv1" in mod and any("decoder" in p for p in parts):
                insert(params, path + ["kernel"], conv_transpose_kernel(t))
            else:
                insert(params, path + ["kernel"], conv_kernel(t))
        elif leaf == "weight" and t.ndim == 2:
            insert(params, path + ["kernel"], linear_kernel(t))
        elif leaf == "bias":
            insert(params, path + ["bias"], t)
        elif extra_rules is not None and name in extra_rules:
            insert(params, extra_rules[name], t)
        else:
            unmatched.append(name)
    return {"params": params, "batch_stats": batch_stats}, unmatched


def torch_nvsr_to_flax(ckpt_path, model):
    """Load a torch NVSR checkpoint file and map it onto `model`'s tree."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables, unmatched = torch_state_dict_to_flax(sd)
    if unmatched:
        print(f"[convert] {len(unmatched)} unmatched tensors (e.g. vocoder): "
              f"{unmatched[:5]} ...")
    return variables


def flax_to_torch_names(variables):
    """Inverse mapping (flax tree -> dotted torch-style names); used by the
    round-trip tests."""
    out = {}

    def walk(tree, prefix, collection):
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p, collection)
            else:
                out[(collection, p)] = np.asarray(v)

    walk(variables.get("params", {}), "", "params")
    walk(variables.get("batch_stats", {}), "", "batch_stats")
    return out
