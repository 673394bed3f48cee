"""Torch-checkpoint conversion: numeric verification of the layout
mapping against manual numpy computation of the torch op semantics."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from convert_pfann_torch import convert_state_dict  # noqa: E402

from pfann_tpu.models.fp_network import FpNetwork  # noqa: E402


def make_torch_style_state(rng, d=16, h=64, u=8, F=256, T=32, fuller=True):
    """Random weights in the reference's torch state-dict layout
    (shapes per model.py:14-130)."""
    channels = [1, d, d, 2 * d, 2 * d, 4 * d, 4 * d, h, h]
    state = {}
    in_F, in_T = F, T
    for i in range(8):
        ci, co = channels[i], channels[i + 1]
        out_T = (in_T - 1) // 2 + 1
        out_F = (in_F - 1) // 2 + 1
        state["f.convs.%d.conv1.weight" % i] = rng.standard_normal(
            (co, ci, 1, 3)).astype(np.float32) * 0.1
        state["f.convs.%d.conv1.bias" % i] = rng.standard_normal(co).astype(np.float32) * 0.1
        state["f.convs.%d.ln1.weight" % i] = 1 + 0.1 * rng.standard_normal(
            (co, in_F, out_T)).astype(np.float32)
        state["f.convs.%d.ln1.bias" % i] = 0.1 * rng.standard_normal(
            (co, in_F, out_T)).astype(np.float32)
        gi = ci if fuller else 1
        state["f.convs.%d.conv2.weight" % i] = rng.standard_normal(
            (co, co if fuller else 1, 3, 1)).astype(np.float32) * 0.1
        state["f.convs.%d.conv2.bias" % i] = rng.standard_normal(co).astype(np.float32) * 0.1
        state["f.convs.%d.ln2.weight" % i] = 1 + 0.1 * rng.standard_normal(
            (co, out_F, out_T)).astype(np.float32)
        state["f.convs.%d.ln2.bias" % i] = 0.1 * rng.standard_normal(
            (co, out_F, out_T)).astype(np.float32)
        in_F, in_T = out_F, out_T
    v = h // d
    state["g.linear1.weight"] = rng.standard_normal((d * u, v, 1)).astype(np.float32) * 0.2
    state["g.linear1.bias"] = rng.standard_normal(d * u).astype(np.float32) * 0.1
    state["g.linear2.weight"] = rng.standard_normal((d, u, 1)).astype(np.float32) * 0.2
    state["g.linear2.bias"] = rng.standard_normal(d).astype(np.float32) * 0.1
    return state


def test_converted_model_runs_and_param_structure_matches():
    rng = np.random.default_rng(0)
    d, h, u = 16, 64, 8
    state = make_torch_style_state(rng, d, h, u)
    tree = convert_state_dict(state, d, h, u)

    model = FpNetwork(d=d, h=h, u=u, F=256, T=32, fuller=True)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 256, 32)))
    )
    # structures must match exactly (same leaves, same shapes)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, tree)
    assert ref_shapes == got_shapes

    y = jax.jit(model.apply)(
        tree, jnp.asarray(rng.standard_normal((3, 256, 32)), jnp.float32)
    )
    assert y.shape == (3, d)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), 1.0, atol=1e-5)


def test_projector_mapping_matches_grouped_conv_semantics():
    """Our einsum with the converted w1/w2 must equal torch's grouped
    Conv1d semantics computed manually in numpy (model.py:118-127)."""
    rng = np.random.default_rng(1)
    d, h, u = 4, 12, 5
    v = h // d
    w1 = rng.standard_normal((d * u, v, 1)).astype(np.float32)
    b1 = rng.standard_normal(d * u).astype(np.float32)
    w2 = rng.standard_normal((d, u, 1)).astype(np.float32)
    b2 = rng.standard_normal(d).astype(np.float32)
    x = rng.standard_normal((3, h)).astype(np.float32)

    # manual grouped conv1d: group g of linear1 consumes x[g*v:(g+1)*v]
    # and produces channels [g*u, (g+1)*u)
    y1 = np.zeros((3, d * u), np.float32)
    for g in range(d):
        for j in range(u):
            y1[:, g * u + j] = x[:, g * v : (g + 1) * v] @ w1[g * u + j, :, 0] + b1[g * u + j]
    y1 = np.where(y1 > 0, y1, np.exp(np.minimum(y1, 0)) - 1)  # ELU
    y2 = np.zeros((3, d), np.float32)
    for g in range(d):
        y2[:, g] = y1[:, g * u : (g + 1) * u] @ w2[g, :, 0] + b2[g]

    # through our einsum with converted weights
    cw1 = w1[:, :, 0].reshape(d, u, v).transpose(0, 2, 1)
    cb1 = b1.reshape(d, u)
    cw2 = w2.reshape(d, u, 1)
    cb2 = b2.reshape(d, 1)
    z1 = np.einsum("bdv,dvu->bdu", x.reshape(3, d, v), cw1) + cb1
    z1 = np.where(z1 > 0, z1, np.exp(np.minimum(z1, 0)) - 1)
    z2 = (np.einsum("bdu,duo->bdo", z1, cw2) + cb2).reshape(3, d)
    np.testing.assert_allclose(z2, y2, rtol=1e-5, atol=1e-6)


def test_conv_mapping_matches_torch_conv2d():
    """Converted conv1 kernel through lax.conv == torch Conv2d semantics
    (cross-correlation) computed manually."""
    rng = np.random.default_rng(2)
    ci, co, T = 3, 5, 8
    w = rng.standard_normal((co, ci, 1, 3)).astype(np.float32)
    x = rng.standard_normal((2, 4, T, ci)).astype(np.float32)  # [B, F, T, C]

    kernel = w.transpose(2, 3, 1, 0)  # [1, 3, ci, co]
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # manual cross-correlation at one position
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    t, f = 4, 2
    ref = np.einsum("c,oc->o", np.zeros(ci, np.float32), np.zeros((co, ci), np.float32))
    ref = sum(
        xp[0, f, t + kw, :] @ w[:, :, 0, kw].T for kw in range(3)
    )
    np.testing.assert_allclose(np.asarray(out)[0, f, t], ref, rtol=1e-4, atol=1e-5)
