"""FpNetwork structural and semantic tests (vs reference model.py:14-153)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfann_tpu.models.fp_network import FpNetwork, build_fp_network, param_count


def make_model(d=32, h=128, u=8, F=256, T=32, **kw):
    model = FpNetwork(d=d, h=h, u=u, F=F, T=T, **kw)
    # jitted: eager flax init = hundreds of tiny op compiles (~10 s on
    # the single-core CPU backend); one jitted program is also
    # persistent-cacheable across suite runs
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, F, T)))
    return model, variables


def test_output_shape_and_norm():
    model, variables = make_model()
    x = jax.random.normal(jax.random.key(1), (4, 256, 32))
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), 1.0, atol=1e-5)


def test_norm_false_returns_unnormalized():
    model, variables = make_model()
    x = jax.random.normal(jax.random.key(2), (4, 256, 32))
    y = jax.jit(lambda v, x: model.apply(v, x, norm=False))(variables, x)
    norms = np.linalg.norm(np.asarray(y), axis=1)
    assert not np.allclose(norms, 1.0, atol=1e-3)
    y2 = jax.jit(lambda v, x: model.apply(v, x, norm=True))(variables, x)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y) / norms[:, None], atol=1e-5
    )


def expected_param_count(d, h, u, F=256, T=32, fuller=True):
    """Independent parameter-count formula derived from model.py:14-130."""
    channels = [1, d, d, 2 * d, 2 * d, 4 * d, 4 * d, h, h]
    total = 0
    in_F, in_T = F, T
    for i in range(8):
        ci, co = channels[i], channels[i + 1]
        out_T = (in_T - 1) // 2 + 1
        out_F = (in_F - 1) // 2 + 1
        total += ci * co * 3 + co          # conv1 (1x3) + bias
        total += 2 * co * in_F * out_T     # ln1 scale+bias over (C,F,T')
        total += (ci if fuller else 1) and 0  # placeholder, replaced below
        if fuller:
            total += co * co * 3 + co      # conv2 (3x1) dense
        else:
            total += co * 3 + co           # conv2 depthwise
        total += 2 * co * out_F * out_T    # ln2
        in_F, in_T = out_F, out_T
    v = h // d
    total += d * v * u + d * u             # projector w1 + b1
    total += d * u + d                     # projector w2 + b2
    return total


@pytest.mark.parametrize("fuller", [True, False])
def test_param_count_matches_formula(fuller):
    d, h, u = 32, 128, 8
    _, variables = make_model(d=d, h=h, u=u, fuller=fuller)
    assert param_count(variables) == expected_param_count(d, h, u, fuller=fuller)


def test_flagship_param_count():
    # flagship config d=128, h=1024, u=32, fuller=True
    # (configs/default.json:45-51); sanity: ~16-18M params
    n = expected_param_count(128, 1024, 32, fuller=True)
    assert 10e6 < n < 25e6


def test_same_padding_output_sizes():
    # every block halves (F, T) by ceil division until (1, 1): 256,32 ->
    # ... -> 1,1 after 8 blocks (model.py:92-94)
    model, variables = make_model()
    # would assert-fail inside Encoder if the shape walk broke
    jax.jit(model.apply)(variables, jnp.zeros((1, 256, 32)))


def test_strides_config():
    # strides config format [[1, s_t], [s_f, 1]] per block (model.py:85)
    strides = [[[1, 2], [2, 1]]] * 5 + [[[1, 1], [2, 1]]] * 3
    model = FpNetwork(d=32, h=128, u=8, F=256, T=32, strides=strides)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 256, 32)))
    y = jax.jit(model.apply)(variables, jnp.zeros((1, 256, 32)))
    assert y.shape == (1, 32)


def test_elu_activation_and_relu_before_ln():
    model, variables = make_model(activation="ELU", relu_after_bn=False)
    y = jax.jit(model.apply)(variables, jnp.ones((2, 256, 32)))
    assert np.isfinite(np.asarray(y)).all()


def test_build_from_config():
    params = {
        "model": {"d": 32, "h": 128, "u": 8, "fuller": True},
        "n_mels": 256,
        "segment_size": 1,
        "sample_rate": 8000,
        "stft_hop": 256,
    }
    model = build_fp_network(params)
    assert model.F == 256 and model.T == 32
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 256, 32)))
    assert jax.jit(model.apply)(variables, jnp.zeros((3, 256, 32))).shape == (3, 32)


def test_bf16_compute_close_to_f32():
    model32, variables = make_model()
    model16 = FpNetwork(d=32, h=128, u=8, F=256, T=32, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(3), (4, 256, 32))
    y32 = np.asarray(jax.jit(model32.apply)(variables, x))
    y16 = np.asarray(jax.jit(model16.apply)(variables, x))
    assert y16.dtype == np.float32  # output always f32
    # cosine similarity between bf16 and f32 embeddings stays high
    cos = (y32 * y16).sum(axis=1)
    assert (cos > 0.98).all()


def test_jit_and_grad():
    model, variables = make_model(d=16, h=64, u=8)

    @jax.jit
    def loss_fn(params, x):
        y = model.apply(params, x)
        return jnp.sum(y**2)

    g = jax.grad(loss_fn)(variables, jnp.ones((2, 256, 32)))
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
