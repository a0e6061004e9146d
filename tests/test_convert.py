"""torch -> Flax layout conversion validated numerically against torch
(torch-cpu is available as an oracle; voicefixer/lightning are not)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from ssr_eval_tpu.models.convert import (
    conv_kernel,
    conv_transpose_kernel,
    linear_kernel,
    torch_state_dict_to_flax,
)


def test_conv2d_layout():
    tc = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    x = np.random.default_rng(0).standard_normal((2, 3, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tc(torch.tensor(x)).numpy()
    fl = nn.Conv(8, (3, 3), use_bias=False, padding="SAME")
    params = {"params": {"kernel": jnp.asarray(conv_kernel(tc.weight))}}
    got = fl.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5)


def test_conv_transpose2d_layout():
    tc = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=0, bias=False)
    x = np.random.default_rng(1).standard_normal((1, 4, 7, 9)).astype(np.float32)
    with torch.no_grad():
        ref = tc(torch.tensor(x)).numpy()
    fl = nn.ConvTranspose(6, (3, 3), strides=(2, 2), padding="VALID", use_bias=False)
    params = {"params": {"kernel": jnp.asarray(conv_transpose_kernel(tc.weight))}}
    got = fl.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5)


def test_linear_layout():
    tl = torch.nn.Linear(5, 7)
    x = np.random.default_rng(2).standard_normal((3, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.tensor(x)).numpy()
    fl = nn.Dense(7)
    params = {
        "params": {
            "kernel": jnp.asarray(linear_kernel(tl.weight)),
            "bias": jnp.asarray(tl.bias.detach().numpy()),
        }
    }
    got = fl.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_batchnorm_state_dict_mapping():
    bn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        bn.weight += 0.3
        bn.running_mean += 0.1
        bn.running_var *= 1.7
    sd = {f"block.bn1.{k}": v for k, v in bn.state_dict().items()}
    variables, unmatched = torch_state_dict_to_flax(sd)
    assert unmatched == []
    p = variables["params"]["block"]["bn1"]
    s = variables["batch_stats"]["block"]["bn1"]
    np.testing.assert_allclose(p["scale"], bn.weight.detach().numpy())
    np.testing.assert_allclose(s["mean"], bn.running_mean.numpy())
    np.testing.assert_allclose(s["var"], bn.running_var.numpy())

    # and the values behave identically in eval mode
    x = np.random.default_rng(3).standard_normal((2, 4, 6, 6)).astype(np.float32)
    bn.eval()
    with torch.no_grad():
        ref = bn(torch.tensor(x)).numpy()
    fl = nn.BatchNorm(use_running_average=True)
    got = fl.apply(
        {
            "params": {"scale": p["scale"], "bias": p["bias"]},
            "batch_stats": {"mean": s["mean"], "var": s["var"]},
        },
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5
    )


def test_unet_state_dict_shapes_roundtrip():
    """A synthetic torch-style state dict for one encoder block maps onto
    the Flax tree with the right shapes."""
    sd = {
        "generator.analysis_module.encoder_block1.conv_block1.bn1.weight": torch.ones(1),
        "generator.analysis_module.encoder_block1.conv_block1.bn1.bias": torch.zeros(1),
        "generator.analysis_module.encoder_block1.conv_block1.bn1.running_mean": torch.zeros(1),
        "generator.analysis_module.encoder_block1.conv_block1.bn1.running_var": torch.ones(1),
        "generator.analysis_module.encoder_block1.conv_block1.conv1.weight": torch.zeros(32, 1, 3, 3),
        "generator.analysis_module.encoder_block1.conv_block1.shortcut.weight": torch.zeros(32, 1, 1, 1),
        "generator.analysis_module.encoder_block1.conv_block1.shortcut.bias": torch.zeros(32),
    }
    variables, unmatched = torch_state_dict_to_flax(sd)
    assert unmatched == []
    blk = variables["params"]["generator"]["analysis_module"]["encoder_block1"]["conv_block1"]
    assert blk["conv1"]["kernel"].shape == (3, 3, 1, 32)
    assert blk["shortcut"]["kernel"].shape == (1, 1, 1, 32)
