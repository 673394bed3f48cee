"""Real-torch parity tests (torch CPU is available in this sandbox).

These upgrade two validations that previously relied on hand-written
numpy transcriptions of torch op semantics:

* the reference-checkpoint converter (tools/convert_pfann_torch.py):
  a full 8-block forward of the reference architecture executed with
  actual ``torch.nn.functional`` ops (asymmetric Keras-SAME padding +
  conv2d + full-volume LayerNorm + grouped conv1d projector, per
  reference model.py:14-153) must match the converted flax model
  end-to-end;
* the mel front-end STFT: the window-folded DFT matmul and the FFT
  path must both match ``torch.stft`` (the exact op torchaudio's
  MelSpectrogram wraps, reference datautil/melspec.py:19-31).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from convert_pfann_torch import convert_state_dict  # noqa: E402

from pfann_tpu.models.fp_network import FpNetwork, _same_pad  # noqa: E402
from pfann_tpu.ops.melspec import MelSpec  # noqa: E402
from tests.test_convert import make_torch_style_state  # noqa: E402


def reference_torch_forward(state, x_np, d, h, u, fuller=True):
    """The reference forward semantics in functional torch ops
    (model.py:14-130: explicit asymmetric SAME pad -> conv -> LayerNorm
    over (C, F, T) -> ReLU, twice per block; grouped-conv1d projector
    with ELU; final L2 norm)."""
    st = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    t = torch.from_numpy(x_np)[:, None]  # [B, 1, F, T]
    channels = [1, d, d, 2 * d, 2 * d, 4 * d, 4 * d, h, h]
    in_F, in_T = x_np.shape[1], x_np.shape[2]
    with torch.no_grad():
        for i in range(8):
            co = channels[i + 1]
            out_T = (in_T - 1) // 2 + 1
            out_F = (in_F - 1) // 2 + 1
            p = "f.convs.%d." % i
            pl, pr = _same_pad(in_T, 3, 2)
            t = tF.conv2d(tF.pad(t, (pl, pr)), st[p + "conv1.weight"],
                          st[p + "conv1.bias"], stride=(1, 2))
            t = tF.layer_norm(t, (co, in_F, out_T), st[p + "ln1.weight"],
                              st[p + "ln1.bias"])
            t = tF.relu(t)
            pl, pr = _same_pad(in_F, 3, 2)
            t = tF.conv2d(tF.pad(t, (0, 0, pl, pr)), st[p + "conv2.weight"],
                          st[p + "conv2.bias"], stride=(2, 1),
                          groups=1 if fuller else co)
            t = tF.layer_norm(t, (co, out_F, out_T), st[p + "ln2.weight"],
                              st[p + "ln2.bias"])
            t = tF.relu(t)
            in_F, in_T = out_F, out_T
        t = t.reshape(-1, h, 1)
        t = tF.conv1d(t, st["g.linear1.weight"], st["g.linear1.bias"], groups=d)
        t = tF.elu(t)
        t = tF.conv1d(t, st["g.linear2.weight"], st["g.linear2.bias"], groups=d)
        t = t.reshape(-1, d)
        t = t / t.norm(dim=1, keepdim=True)
    return t.numpy()


@pytest.mark.parametrize("fuller", [True, False])
def test_converted_model_matches_torch_forward(fuller):
    """End-to-end converter validation with REAL torch ops: a random
    reference-layout state dict run through the torch semantics equals
    the converted flax model's output (f32, both on CPU)."""
    rng = np.random.default_rng(7)
    d, h, u = 8, 32, 4
    state = make_torch_style_state(rng, d=d, h=h, u=u, fuller=fuller)
    x = rng.standard_normal((3, 256, 32)).astype(np.float32)

    want = reference_torch_forward(state, x, d, h, u, fuller=fuller)

    tree = convert_state_dict(state, d, h, u)
    model = FpNetwork(d=d, h=h, u=u, F=256, T=32, fuller=fuller)
    got = np.asarray(jax.jit(model.apply)(tree, jnp.asarray(x)))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("impl", ["dft", "fft"])
@pytest.mark.parametrize("naf_mode", [False, True])
def test_spectrogram_matches_torch_stft(impl, naf_mode):
    """Our framing + DFT/FFT equals torch.stft with the torchaudio
    MelSpectrogram settings (center=True, periodic hann, reflect pad —
    constant pad and power 1 in naf_mode)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(8000).astype(np.float32)
    ms = MelSpec(impl=impl, naf_mode=naf_mode,
                 mel_log="log10" if naf_mode else "log",
                 spec_norm="max" if naf_mode else "l2")

    ours = np.asarray(ms._spectrogram(jnp.asarray(x)))  # [T, n_freqs]

    spec = torch.stft(
        torch.from_numpy(x), n_fft=1024, hop_length=256,
        window=torch.hann_window(1024, periodic=True),
        center=True, pad_mode="constant" if naf_mode else "reflect",
        return_complex=True,
    )  # [n_freqs, T]
    power = (spec.real ** 2 + spec.imag ** 2).numpy().T
    want = np.sqrt(power) if naf_mode else power

    assert ours.shape == want.shape == (1 + len(x) // 256, 513)
    scale = np.abs(want).max()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-5 * scale)


def test_projector_matches_torch_grouped_conv1d():
    """The converted projector weights through our einsum equal torch's
    actual grouped Conv1d (model.py:118-127) — real op, not the numpy
    transcription in test_convert.py."""
    rng = np.random.default_rng(13)
    d, h, u = 4, 12, 5
    v = h // d
    w1 = rng.standard_normal((d * u, v, 1)).astype(np.float32)
    b1 = rng.standard_normal(d * u).astype(np.float32)
    w2 = rng.standard_normal((d, u, 1)).astype(np.float32)
    b2 = rng.standard_normal(d).astype(np.float32)
    x = rng.standard_normal((6, h)).astype(np.float32)

    with torch.no_grad():
        t = torch.from_numpy(x).reshape(-1, h, 1)
        t = tF.conv1d(t, torch.from_numpy(w1), torch.from_numpy(b1), groups=d)
        t = tF.elu(t)
        t = tF.conv1d(t, torch.from_numpy(w2), torch.from_numpy(b2), groups=d)
        want = t.reshape(-1, d).numpy()

    cw1 = w1[:, :, 0].reshape(d, u, v).transpose(0, 2, 1)
    cb1 = b1.reshape(d, u)
    z = np.einsum("bdv,dvu->bdu", x.reshape(-1, d, v), cw1) + cb1
    z = np.where(z > 0, z, np.exp(np.minimum(z, 0)) - 1)
    got = (np.einsum("bdu,duo->bdo", z, w2.reshape(d, u, 1))
           + b2.reshape(d, 1)).reshape(-1, d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
