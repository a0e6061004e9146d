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

Vocoder weights: `vocoder_state_dict_to_flax` maps a voicefixer-structure
generator state dict (weight-normed Conv1d/ConvTranspose1d Sequential)
onto models/vocoder.TFGANGenerator, fusing weight norm; the name map is
config-derived (`vocoder_name_map`) so channel/ratio differences in the
real checkpoint are a config change, not a code change.  NVSR's own UNet
checkpoint converts via `torch_nvsr_to_flax`, which reports (does not
fail on) unmatched keys.
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


def conv1d_kernel(w):
    """torch Conv1d (O, I, K) -> flax Conv (K, I, O)."""
    return np.transpose(_to_np(w), (2, 1, 0))


def conv1d_transpose_kernel(w):
    """torch ConvTranspose1d (I, O, K) -> flax ConvTranspose (K, I, O).

    Same rule as the validated 2-D case: flax ConvTranspose
    (transpose_kernel=False) equals torch's transposed convolution with
    the kernel spatially flipped."""
    w = _to_np(w)[:, :, ::-1]
    return np.transpose(w, (2, 0, 1))


def fuse_weight_norm(weight_v, weight_g):
    """Fold torch weight_norm (default dim=0) into a plain weight:
    w = g * v / ||v|| with the norm over all dims except 0."""
    v = _to_np(weight_v)
    g = _to_np(weight_g)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (v * (g / norm)).astype(v.dtype)


def _strip_model_prefix(state_dict):
    return {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in state_dict.items()
    }


def infer_vocoder_config(state_dict):
    """Derive a `TFGANConfig` from a voicefixer-structure generator state
    dict's tensor SHAPES alone (VERDICT r2 next-round #4), so
    `load_vocoder_checkpoint` self-adapts when the real checkpoint differs
    from the reconstruction:

      n_mels / channels / pre kernel   <- generator.0 conv (O, I, K)
      per-stage ratio                  <- ConvTranspose1d kernel K = 2*r
      per-stage width                  <- ConvTranspose1d out dim
      res-block count / kernel         <- blocks.{j}.2 convs per stage
      post kernel                      <- head conv

    Dilation VALUES leave no trace in shapes; the MelGAN/voicefixer-family
    ladder 3**j is assumed (matches every published member).  Raises
    ValueError when the dict is not a voicefixer-structure generator.
    """
    from ssr_eval_tpu.models.vocoder import TFGANConfig

    sd = _strip_model_prefix(state_dict)

    def wshape(prefix):
        for leaf in ("weight_v", "weight"):
            k = f"{prefix}.{leaf}"
            if k in sd:
                return tuple(_to_np(sd[k]).shape)
        return None

    pre = wshape("generator.0")
    if pre is None or len(pre) != 3:
        raise ValueError(
            "not a voicefixer-structure generator state dict "
            "(no generator.0 Conv1d weight)"
        )
    channels, n_mels, pre_kernel = (int(v) for v in pre)

    ratios, widths, res_counts, res_kernel = [], [], [], 3
    idx = 2
    while True:
        up = wshape(f"generator.{idx}.layer")
        if up is None:
            break
        _, o_ch, k = (int(v) for v in up)
        ratios.append(k // 2)
        widths.append(o_ch)
        j = 0
        while (s := wshape(f"generator.{idx + 1}.blocks.{j}.2")) is not None:
            res_kernel = int(s[2])
            j += 1
        res_counts.append(j)
        idx += 3
    post = wshape(f"generator.{idx}")
    if not ratios or post is None:
        raise ValueError(
            "not a voicefixer-structure generator state dict "
            "(no upsample stages / head conv found)"
        )
    if len(set(res_counts)) != 1:
        raise ValueError(f"uneven res-block counts per stage: {res_counts}")
    halving = widths == [channels >> (i + 1) for i in range(len(ratios))]
    return TFGANConfig(
        n_mels=n_mels,
        channels=channels,
        ratios=tuple(ratios),
        res_dilations=tuple(3 ** j for j in range(res_counts[0])),
        stage_channels=None if halving else tuple(widths),
        pre_kernel=pre_kernel,
        post_kernel=int(post[2]),
        res_kernel=res_kernel,
    )


def vocoder_name_map(cfg=None):
    """torch-Sequential prefixes of the voicefixer-structure generator ->
    (flax module name in models.vocoder.TFGANGenerator, kind).

    Sequential layout: [WNConv1d, LeakyReLU, then per upsample stage i:
    UpsampleNet (ConvTranspose1d under `.layer`), ResStack (dilated/1x1
    conv pairs under `.blocks.{j}.{2,4}`), LeakyReLU, ...,
    WNConv1d head, Tanh]."""
    from ssr_eval_tpu.models.vocoder import TFGANConfig

    cfg = cfg or TFGANConfig()
    m = {"generator.0": ("pre", "conv1d")}
    idx = 2
    for i in range(len(cfg.ratios)):
        m[f"generator.{idx}.layer"] = (f"up_{i}", "convT1d")
        for j in range(len(cfg.res_dilations)):
            m[f"generator.{idx + 1}.blocks.{j}.2"] = (f"res_{i}_{j}_d", "conv1d")
            m[f"generator.{idx + 1}.blocks.{j}.4"] = (f"res_{i}_{j}_p", "conv1d")
        idx += 3
    m[f"generator.{idx}"] = ("post", "conv1d")
    return m


def vocoder_state_dict_to_flax(state_dict, cfg=None, wrap_model=False):
    """voicefixer-structure torch state dict -> flax params for
    models.vocoder.TFGANGenerator (or, with wrap_model=True, the
    `Vocoder` wrapper whose generator lives under `model`).

    Accepts keys with or without a leading 'model.' (the attribute the
    torch Vocoder holds its generator under).  Weight-normed convs
    (`weight_v`/`weight_g`) are fused; plain `weight` passes through.
    Returns (params, unmatched_names)."""
    sd = _strip_model_prefix(state_dict)

    name_map = vocoder_name_map(cfg)
    params = {}
    matched = set()

    def put(flax_name, leaf, value):
        params.setdefault(flax_name, {})[leaf] = value

    for prefix, (flax_name, kind) in name_map.items():
        tr = conv1d_transpose_kernel if kind == "convT1d" else conv1d_kernel
        if f"{prefix}.weight_v" in sd:
            w = fuse_weight_norm(sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"])
            matched.update({f"{prefix}.weight_v", f"{prefix}.weight_g"})
        elif f"{prefix}.weight" in sd:
            w = _to_np(sd[f"{prefix}.weight"])
            matched.add(f"{prefix}.weight")
        else:
            continue
        put(flax_name, "kernel", tr(w))
        if f"{prefix}.bias" in sd:
            put(flax_name, "bias", _to_np(sd[f"{prefix}.bias"]))
            matched.add(f"{prefix}.bias")

    unmatched = [k for k in sd if k not in matched]
    if wrap_model:
        params = {"model": params}
    return params, unmatched


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
