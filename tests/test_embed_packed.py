"""Packed-song embedding path (Embedder.embed_songs_device: raw audio
in, unfold + de-mean + mel + encoder on device) vs the host-unfold
segment path — the DB-build/query-embed transfer optimization."""

import numpy as np
import pytest

from pfann_tpu.data.musicdata import MusicDataset, unfold
from pfann_tpu.index.embedder import Embedder
from pfann_tpu.utils.fastcast import int16_if_exact

PARAMS = {
    "sample_rate": 1000,
    "stft_n": 128,
    "stft_hop": 32,
    "n_mels": 32,
    "f_min": 50,
    "f_max": 450,
    "segment_size": 1,
    "hop_size": 0.5,
    "model": {"d": 16, "h": 32, "u": 4},
    "indexer": {"top_k": 10, "frame_shift_mul": 1},
}


@pytest.fixture(scope="module")
def embedder(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from pfann_tpu.models.fp_network import build_fp_network
    from pfann_tpu.utils import checkpoint as ckpt

    model = build_fp_network(PARAMS, compute_dtype=jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, model.F, model.T))
    )
    path = str(tmp_path_factory.mktemp("m") / "model.msgpack")
    ckpt.save_model(path, variables)
    return Embedder(PARAMS, path, compute_dtype=jnp.float32, chunk=64)


def _sig(seed, seconds):
    rng = np.random.default_rng(seed)
    n = int(PARAMS["sample_rate"] * seconds)
    q = rng.integers(-20000, 20000, n).astype(np.int16)
    return q.astype(np.float32) / 32768


def test_packed_matches_host_unfold(embedder):
    hop = 500
    sigs = [_sig(0, 3.0), _sig(1, 1.0), _sig(2, 2.25)]
    counts = [(s.shape[0] - 1000) // hop + 1 for s in sigs]
    packed = embedder.embed_songs(
        [int16_if_exact(s) for s in sigs], counts, hop
    )
    for s, c, zp in zip(sigs, counts, packed):
        segs = unfold(s, 1000, hop)
        segs = segs - segs.mean(axis=1, keepdims=True)
        zh = embedder.embed(segs.astype(np.float32))
        assert zp.shape == (c, 16)
        np.testing.assert_allclose(zp, zh, atol=2e-5)


def test_packed_mixed_dtype_batch(embedder):
    """A batch mixing int16 (exact-WAV) and float32 (resampled) songs
    rides the f32 carrier — the int16 ones must be rescaled on host
    (regression: they were written raw, embedding at 32768x amplitude)."""
    hop = 500
    sigs = [_sig(10, 2.0), _sig(11, 2.5)]
    counts = [(s.shape[0] - 1000) // hop + 1 for s in sigs]
    i16 = int16_if_exact(sigs[0])
    assert i16.dtype == np.int16
    mixed = embedder.embed_songs([i16, sigs[1]], counts, hop)
    pure = embedder.embed_songs(sigs, counts, hop)
    for a, b in zip(mixed, pure):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_packed_pad_b_reuses_shape(embedder):
    hop = 500
    sigs = [_sig(3, 2.0), _sig(4, 2.0)]
    counts = [3, 3]
    full = embedder.embed_songs(sigs, counts, hop)
    # ragged tail pinned to pad_b=4: extra batch rows are zero songs
    h = embedder.embed_songs_device(sigs, counts, hop, pad_b=4)
    tail = embedder.gather_songs(h)
    assert len(tail) == 2
    for a, b in zip(full, tail):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_embed_stream_error_flush_keeps_batching(embedder, monkeypatch):
    """An early decode error flushes pending songs in list order but must
    NOT pin the dispatch batch size to the tiny flush (regression: every
    later call then went out 1-2 songs at a time — thousands of extra
    fixed-cost tunnel RTTs on a real build)."""
    hop = 500
    sigs = {i: _sig(20 + i, 3.0) for i in (0, 2, 3, 4, 5)}  # 5 windows each
    items = [(0, "a", sigs[0], 5), (1, "broken", None, 0)] + [
        (i, "s%d" % i, sigs[i], 5) for i in (2, 3, 4, 5)
    ]

    class FakeDataset:
        def iterate_raw(self, num_workers=4, prefetch=8):
            yield from items

    calls = []
    real = embedder.embed_songs_device

    def spy(signals, counts, hop_, pad_b=None):
        calls.append((len(signals), pad_b))
        return real(signals, counts, hop_, pad_b=pad_b)

    monkeypatch.setattr(embedder, "embed_songs_device", spy)
    monkeypatch.setattr(embedder, "chunk", 10)  # threshold = 2 songs
    got = list(embedder.embed_stream(FakeDataset(), hop, num_workers=1))
    assert [g[0] for g in got] == [0, 1, 2, 3, 4, 5]
    assert got[1][2].shape == (0, embedder.d)  # error row in order
    # flush of [song 0] (1 song, unpinned), then two pinned 2-song
    # dispatches — NOT four 1-song dispatches pinned by the flush
    assert calls == [(1, None), (2, 2), (2, 2)]
    for i in (0, 2, 3, 4, 5):
        want = embedder.embed_songs([sigs[i]], [5], hop)[0]
        np.testing.assert_allclose(got[[0, 1, 2, 3, 4, 5].index(i)][2],
                                   want, atol=1e-5)


def test_can_pack():
    class E(Embedder):  # pylint: disable=super-init-not-called
        def __init__(self):
            self.segment_size = 8000

    assert E().can_pack(4000) and E().can_pack(2000)
    assert not E().can_pack(3000) and not E().can_pack(0)


def test_builder_packed_matches_segment_fallback(embedder, tmp_path):
    """build_embeddings writes identical landmarkKey and near-identical
    embeddings through both device layouts (incl. an error row)."""
    import io

    from builder import build_embeddings
    from pfann_tpu.audio.io import write_wav

    paths = []
    for i in range(5):
        p = tmp_path / ("s%d.wav" % i)
        write_wav(str(p), _sig(10 + i, 1.0 + 0.75 * i), PARAMS["sample_rate"])
        paths.append(str(p))
    broken = tmp_path / "broken.wav"
    broken.write_bytes(b"not a wav at all")
    paths.insert(2, str(broken))
    lst = tmp_path / "list.txt"
    lst.write_text("".join(p + "\n" for p in paths))

    ds = MusicDataset(str(lst), PARAMS)
    outs = {}
    for packed in (True, False):
        buf = io.BytesIO()
        real = embedder.can_pack
        embedder.can_pack = (lambda hop: False) if not packed else real
        try:
            out = build_embeddings(embedder, ds, buf, hop_size=0.5,
                                   num_workers=0)
        finally:
            embedder.can_pack = real
        outs[packed] = (out, np.frombuffer(buf.getvalue(), np.float32))
    a, b = outs[True], outs[False]
    assert a[0]["landmark_key"] == b[0]["landmark_key"]
    assert a[0]["landmark_key"][2] == 0  # the error row
    assert a[0]["total"] == b[0]["total"]
    assert a[0]["stats"]["packed"] and not b[0]["stats"]["packed"]
    np.testing.assert_allclose(a[1], b[1], atol=2e-5)


def test_weights_device_resident(embedder):
    """The loaded checkpoint must be device arrays, not host numpy: a
    host pytree argument is re-serialized on EVERY jitted dispatch,
    which through the tunneled TPU re-uploads the full weight payload
    per call (~68 MB f32 at flagship dims ~= 5 s/call — the r4 DB-build
    wall, BENCH_r04_build.json)."""
    import jax

    leaves = jax.tree_util.tree_leaves(embedder.variables)
    assert leaves, "empty variables"
    assert all(isinstance(l, jax.Array) for l in leaves)


def test_embed_songs_window_budget(embedder):
    """embed_songs must split item batches whose TOTAL window count
    exceeds the device budget (matcher --batch counts items; 128 packed
    60 s queries = 15,232 segments = a 22 GB XLA program on 16 GB HBM)
    — grouped dispatch results must equal the single-dispatch ones."""
    hop = 500
    sigs = [_sig(100 + i, 3.0) for i in range(12)]
    counts = [(s.shape[0] - 1000) // hop + 1 for s in sigs]
    # budget = chunk*4 = 256 windows at the fixture's chunk=64; with
    # 5 windows each, G = 51 > 12 -> force grouping via a small chunk
    embedder_small = Embedder.__new__(Embedder)
    embedder_small.__dict__.update(embedder.__dict__)
    embedder_small.chunk = 4  # budget 16 windows -> G = 3
    grouped = embedder_small.embed_songs(sigs, counts, hop)
    single = embedder.embed_songs(sigs, counts, hop)
    assert len(grouped) == len(single) == 12
    for g, s in zip(grouped, single):
        np.testing.assert_allclose(g, s, rtol=0, atol=1e-5)
