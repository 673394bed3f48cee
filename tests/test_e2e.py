"""End-to-end pipeline test: train-init -> build DB from synthetic WAVs ->
match noisy cropped queries -> accuracy (the full CLI contract, exercised
through the same code paths as builder.py / matcher.py)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from pfann_tpu.audio.io import get_audio, write_wav
from pfann_tpu.audio.resample import resample
from pfann_tpu.data.musicdata import MusicDataset, unfold

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = {
    "model_dir": None,
    "cache_dir": None,
    "batch_size": 8,
    "sample_rate": 8000,
    "stft_n": 1024,
    "stft_hop": 256,
    "n_mels": 256,
    "f_min": 300,
    "f_max": 4000,
    "segment_size": 1,
    "hop_size": 0.5,
    "time_offset": 1.2,
    "pad_start": 0,
    "epoch": 1,
    "lr": 1e-4,
    "tau": 0.05,
    "cutout_min": 0.1,
    "cutout_max": 0.5,
    "model": {"d": 16, "h": 64, "u": 8, "fuller": True},
    "indexer": {"top_k": 10, "frame_shift_mul": 1, "backend": "exact"},
}


def make_song(rng, n_sec, sr=8000):
    """Synthetic 'music': a random note sequence (non-stationary, so every
    1 s window is distinct — stationary sinusoid mixes make neighboring
    windows near-identical and retrieval time offsets ill-defined)."""
    note_len = sr // 4
    x = np.zeros(n_sec * sr, dtype=np.float64)
    t_note = np.arange(note_len) / sr
    env = np.minimum(np.arange(note_len), np.arange(note_len)[::-1]) / (note_len / 8)
    env = np.minimum(env, 1.0)
    for k in range(n_sec * 4):
        for _ in range(3):  # chord of 3 random partials per note
            f = rng.uniform(150, 3400)
            x[k * note_len : (k + 1) * note_len] += (
                rng.uniform(0.3, 1.0)
                * env
                * np.sin(2 * np.pi * f * t_note + rng.uniform(0, 2 * np.pi))
            )
    x /= np.max(np.abs(x)) * 1.2
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(7)
    songs = []
    for i in range(5):
        wav = make_song(rng, n_sec=8)
        path = str(root / f"song{i}.wav")
        write_wav(path, wav, 8000)
        songs.append((path, wav))
    return songs


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.random(16000, dtype=np.float32) - 0.5) * 0.9
    path = str(tmp_path / "t.wav")
    write_wav(path, wav, 8000)
    back, rate = get_audio(path)
    assert rate == 8000 and back.shape == (1, 16000)
    np.testing.assert_allclose(back[0], wav, atol=1 / 32768)


def test_resample_preserves_tone():
    sr1, sr2 = 44100, 8000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    assert abs(y.shape[0] - sr2) <= 2
    spec = np.abs(np.fft.rfft(y[: sr2 // 1]))
    assert abs(np.argmax(spec) - 440) <= 2


def test_musicdata_segmentation(corpus, tmp_path):
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write(corpus[0][0] + "\n")
    ds = MusicDataset(lst, TINY_CFG)
    i, name, segs = ds.load(0)
    # 8 s at seg 1 s hop 0.5 s -> 15 segments
    assert segs.shape == (15, 8000)
    np.testing.assert_allclose(segs.mean(axis=1), 0, atol=1e-6)
    # broken file -> empty, not an exception
    with open(str(tmp_path / "bad.wav"), "wb") as f:
        f.write(b"RIFFgarbage")
    with open(lst, "w") as f:
        f.write(str(tmp_path / "bad.wav") + "\n")
    ds2 = MusicDataset(lst, TINY_CFG)
    _, _, segs2 = ds2.load(0)
    assert segs2.shape == (0, 8000)


@pytest.fixture(scope="module")
def db_and_model(corpus, tmp_path_factory):
    """Init a random model, export it, build a DB over the corpus via the
    builder CLI."""
    import jax, jax.numpy as jnp
    from pfann_tpu.models.fp_network import build_fp_network
    from pfann_tpu.utils import checkpoint as ckpt
    from pfann_tpu.utils.config import write_config

    root = tmp_path_factory.mktemp("dbroot")
    model_dir = str(root / "model")
    os.makedirs(model_dir)
    cfg = dict(TINY_CFG, model_dir=model_dir, cache_dir=str(root / "caches"))
    cfg_path = os.path.join(model_dir, "configs.json")
    write_config(cfg, cfg_path)

    model = build_fp_network(cfg, compute_dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(5), jnp.zeros((1, 256, 32)))

    # A random-init model maps everything to nearly the same embedding
    # (cosine ~0.99 across songs) so retrieval margins sit inside f32
    # noise.  Train briefly on corpus segments to make it discriminative —
    # the real train->build->match flow in miniature.  The mel transform
    # is hoisted out of the loop (one 75-row call) and augmentation is
    # mel-space noise: the e2e queries are bit-exact crops, so the mini
    # training only has to separate segments, not survive wav-space noise.
    import optax
    from pfann_tpu.ops.melspec import build_mel_spec_layer
    from pfann_tpu.train.loss import similarity_loss

    mel = build_mel_spec_layer(cfg)
    segs = np.concatenate([unfold(wav, 8000, 4000) for _, wav in corpus])
    segs = segs - segs.mean(axis=1, keepdims=True)
    mel_segs = np.asarray(jax.jit(mel)(jnp.asarray(segs)))
    noise_scale = 0.1 * float(np.std(mel_segs))
    tx = optax.adam(4e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def step(v, o, x):
        def loss_fn(vv):
            return similarity_loss(model.apply(vv, x), 0.05)

        loss, g = jax.value_and_grad(loss_fn)(v)
        up, o = tx.update(g, o, v)
        return optax.apply_updates(v, up), o, loss

    rng = np.random.default_rng(0)
    for it in range(40):
        idx = rng.choice(mel_segs.shape[0], 24, replace=False)
        org = mel_segs[idx]
        aug = org + noise_scale * rng.standard_normal(org.shape).astype(np.float32)
        batch = np.stack([org, aug], axis=1).reshape((-1,) + org.shape[1:])
        variables, opt_state, _ = step(variables, opt_state, jnp.asarray(batch))
    ckpt.save_model(os.path.join(model_dir, "model.msgpack"), variables)

    lst = str(root / "db_list.txt")
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p, _ in corpus)
    db_dir = str(root / "db")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "builder.py"), lst, db_dir, cfg_path],
        check=True,
        env=env,
        cwd=REPO,
    )
    return cfg, db_dir


def test_builder_db_layout(db_and_model, corpus):
    cfg, db_dir = db_and_model
    for name in ("embeddings", "landmarkKey", "songList.txt", "configs.json",
                 "model.msgpack", "index_meta.json"):
        assert os.path.exists(os.path.join(db_dir, name)), name
    counts = np.fromfile(os.path.join(db_dir, "landmarkKey"), dtype=np.int32)
    assert counts.tolist() == [15] * 5
    emb = np.fromfile(os.path.join(db_dir, "embeddings"), dtype=np.float32)
    assert emb.size == 75 * 16
    norms = np.linalg.norm(emb.reshape(-1, 16), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_matcher_end_to_end(db_and_model, corpus, tmp_path):
    cfg, db_dir = db_and_model
    rng = np.random.default_rng(11)
    queries, expected = [], []
    for qi in range(6):
        song_id = int(rng.integers(0, len(corpus)))
        path, wav = corpus[song_id]
        # hop-grid-aligned exact crop: with a random-init (untrained) model
        # only bit-identical segments retrieve reliably — this verifies the
        # pipeline and time alignment; noise robustness is the trained
        # model's job (covered by accuracy evals, not unit tests)
        start = int(rng.integers(0, len(wav) - 3 * 8000) // 4000 * 4000)
        q = wav[start : start + 3 * 8000].copy()
        qpath = str(tmp_path / f"q{qi}.wav")
        write_wav(qpath, q, 8000)
        queries.append(qpath)
        expected.append((qpath, path, start / 8000))

    qlist = str(tmp_path / "qlist.txt")
    with open(qlist, "w") as f:
        f.writelines(q + "\n" for q in queries)
    with open(str(tmp_path / "expected.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "answer", "time"])
        w.writerows(expected)

    result = str(tmp_path / "result.txt")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matcher.py"), qlist, db_dir, result],
        check=True,
        env=env,
        cwd=REPO,
    )

    # outputs exist and have the right shapes
    assert os.path.exists(result)
    detail = str(tmp_path / "result_detail.csv")
    score_bin = np.fromfile(result + ".bin", dtype=np.float32)
    assert score_bin.size == 6 * 5 * 2

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from accuracy import evaluate

    r = evaluate(str(tmp_path / "expected.csv"), detail)
    # random-init model on clean-ish queries over a 5-song DB: fingerprints
    # of identical audio still match exactly
    assert r["total"] == 6
    assert r["song_acc"] == 100.0
    assert r["exact_acc"] == 100.0

    # --top1 serving mode (Database.query_top1_batch, [B]-sized D2H):
    # identical TSV answers and _detail rows, no .bin score tables
    sys.path.insert(0, REPO)
    import matcher as matcher_mod

    embedder, db, params = matcher_mod.load_model_and_db(db_dir)
    result2 = str(tmp_path / "result_top1.txt")
    matcher_mod.match_list(embedder, db, params, qlist, result2, top1=True)
    assert open(result2).read() == open(result).read()
    assert not os.path.exists(result2 + ".bin")
    rows_full = list(csv.reader(open(detail)))[1:]
    rows_top1 = list(
        csv.reader(open(str(tmp_path / "result_top1_detail.csv")))
    )[1:]
    assert [r_[:2] for r_ in rows_top1] == [r_[:2] for r_ in rows_full]
    for rf, rt in zip(rows_full, rows_top1):
        assert float(rt[2]) == pytest.approx(float(rf[2]), rel=1e-4)
        assert float(rt[3]) == pytest.approx(float(rf[3]), abs=1e-6)


@pytest.mark.slow
def test_matcher_pairs_mode(db_and_model, corpus, tmp_path):
    """--pairs matches several (list, result) pairs in one process (the
    path testall.sh -match_snr uses); each pair gets the full output
    contract and correct answers.  slow: a full matcher subprocess."""
    cfg, db_dir = db_and_model
    rng = np.random.default_rng(23)
    lists, expecteds = [], []
    for part in range(2):
        queries, expected = [], []
        for qi in range(3):
            song_id = int(rng.integers(0, len(corpus)))
            path, wav = corpus[song_id]
            start = int(rng.integers(0, len(wav) - 3 * 8000) // 4000 * 4000)
            q = wav[start : start + 3 * 8000].copy()
            qpath = str(tmp_path / f"p{part}_q{qi}.wav")
            write_wav(qpath, q, 8000)
            queries.append(qpath)
            expected.append((qpath, path, start / 8000))
        qlist = str(tmp_path / f"list{part}.txt")
        with open(qlist, "w") as f:
            f.writelines(q + "\n" for q in queries)
        epath = str(tmp_path / f"expected{part}.csv")
        with open(epath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["query", "answer", "time"])
            w.writerows(expected)
        lists.append(qlist)
        expecteds.append(epath)

    results = [str(tmp_path / f"result{part}.txt") for part in range(2)]
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matcher.py"), "--pairs", db_dir,
         lists[0], results[0], lists[1], results[1]],
        check=True, env=env, cwd=REPO,
    )

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from accuracy import evaluate

    for part in range(2):
        assert os.path.exists(results[part])
        score_bin = np.fromfile(results[part] + ".bin", dtype=np.float32)
        assert score_bin.size == 3 * 5 * 2
        detail = str(tmp_path / f"result{part}_detail.csv")
        r = evaluate(expecteds[part], detail)
        assert r["total"] == 3
        assert r["song_acc"] == 100.0
        assert r["exact_acc"] == 100.0


def test_saliency_image_unit():
    """Rendering contract: R=inf-normed |grad|, G=energy dimmed by R,
    B=0, freq flipped, segment-marker columns zeroed.  T=20 (not the
    reference's hardcoded 32) proves the marker stride follows the
    actual per-segment frame count."""
    from pfann_tpu.index.saliency import saliency_image

    rng = np.random.default_rng(0)
    S, F, T = 3, 16, 20
    grads = rng.standard_normal((S, F, T)).astype(np.float32)
    specs = rng.standard_normal((S, F, T)).astype(np.float32)
    img = saliency_image(grads, specs)
    assert img.shape == (F, S * T, 3) and img.dtype == np.uint8
    assert (img[..., 2] == 0).all()
    assert (img[:, ::T] == 0).all()
    # red channel: each (segment, frame) column's max |grad| maps to 255
    col = np.abs(grads[1, :, 5])
    want = (col / col.max() * 255).astype(np.uint8)[::-1]
    got = img[:, T + 5, 0]
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_matcher_saliency_visualization(db_and_model, corpus, tmp_path):
    """--visualize writes one PNG per query next to the result file
    (reference matcher.py:133-155).  slow: a full matcher subprocess;
    the rendering contract is pinned by test_saliency_image_unit."""
    cfg, db_dir = db_and_model
    path, wav = corpus[2]
    qpath = str(tmp_path / "vq.wav")
    write_wav(qpath, wav[: 2 * 8000], 8000)
    qlist = str(tmp_path / "qlist.txt")
    with open(qlist, "w") as f:
        f.write(qpath + "\n")
    result = str(tmp_path / "viz_result.txt")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matcher.py"), qlist, db_dir,
         result, "--visualize"],
        check=True, env=env, cwd=REPO,
    )
    png = str(tmp_path / "vq.wav.png")
    assert os.path.exists(png)
    from PIL import Image

    img = np.asarray(Image.open(png))
    # 2 s query at 0.5 s hop -> 3 segments of [256, 32] mel frames
    assert img.shape == (256, 3 * 32, 3)
    assert img[..., 0].max() == 255  # saliency present
    # the answer is still correct with the saliency path's embeddings
    ans = open(result).read().split("\t")[1].strip()
    assert ans == path


def test_extractemb_matchemb_pipeline(db_and_model, corpus, tmp_path):
    """extractemb -> matchemb produces the same answers as matcher."""
    cfg, db_dir = db_and_model
    rng = np.random.default_rng(21)
    queries, answers = [], []
    for qi in range(4):
        song_id = int(rng.integers(0, len(corpus)))
        path, wav = corpus[song_id]
        start = int(rng.integers(0, len(wav) - 2 * 8000) // 4000 * 4000)
        qpath = str(tmp_path / f"e{qi}.wav")
        write_wav(qpath, wav[start : start + 2 * 8000], 8000)
        queries.append(qpath)
        answers.append(path)
    qlist = str(tmp_path / "qlist.txt")
    with open(qlist, "w") as f:
        f.writelines(q + "\n" for q in queries)

    emb_dir = str(tmp_path / "embs")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "extractemb.py"), qlist, db_dir, emb_dir],
        check=True, env=env, cwd=REPO,
    )
    for name in ("query_embeddings", "query_index", "queryList.txt", "configs.json"):
        assert os.path.exists(os.path.join(emb_dir, name)), name
    idx = np.fromfile(os.path.join(emb_dir, "query_index"), dtype=np.int64).reshape(-1, 2)
    assert idx.shape == (4, 2) and (idx[:, 1] == 3).all()  # 2 s -> 3 segments

    result = str(tmp_path / "memb.txt")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matchemb.py"), emb_dir, db_dir, result],
        check=True, env=env, cwd=REPO,
    )
    got = [line.split("\t")[1].strip() for line in open(result)]
    assert got == answers

    # --pairs multi-sweep: one DB load, several query sets (here the
    # same set twice) — answers identical to the single-set run
    r1, r2 = str(tmp_path / "p1.txt"), str(tmp_path / "p2.txt")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matchemb.py"), "--pairs",
         db_dir, emb_dir, r1, emb_dir, r2],
        check=True, env=env, cwd=REPO,
    )
    for r in (r1, r2):
        assert [line.split("\t")[1].strip() for line in open(r)] == answers
        assert os.path.exists(os.path.splitext(r)[0] + "_detail.csv")
        assert os.path.exists(r + ".bin")


def test_rebuild_and_matchfromgt_cli(db_and_model, corpus, tmp_path):
    """rebuild rewrites index_meta consistently; matchfromgt scores a
    query against its ground-truth song only (the oracle diagnostic,
    reference matchfromgt.py:26-170) and recovers the crop offset."""
    import json

    cfg, db_dir = db_and_model
    env = dict(os.environ, PFANN_PLATFORM="cpu")

    meta_path = os.path.join(db_dir, "index_meta.json")
    before = json.load(open(meta_path))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "rebuild.py"), db_dir],
        check=True, env=env, cwd=REPO,
    )
    after = json.load(open(meta_path))
    assert after["d"] == before["d"]
    assert after["ntotal"] == before["ntotal"] == 75

    path, wav = corpus[3]
    start = 2 * 8000  # hop-aligned 2 s in
    qpath = str(tmp_path / "gq.wav")
    write_wav(qpath, wav[start : start + 2 * 8000], 8000)
    qlist = str(tmp_path / "qlist.txt")
    with open(qlist, "w") as f:
        f.write(qpath + "\n")
    gt = str(tmp_path / "gt.tsv")
    with open(gt, "w") as f:
        f.write("gq\t%s\n" % os.path.splitext(os.path.basename(path))[0])
    result = str(tmp_path / "gt_result.csv")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "matchfromgt.py"),
         qlist, gt, db_dir, result],
        check=True, env=env, cwd=REPO,
    )
    rows = list(csv.reader(open(result)))
    assert rows[0][:4] == ["query", "answer", "score", "time"]
    assert rows[1][0] == qpath and rows[1][1] == path
    assert float(rows[1][3]) == 2.0  # crop offset recovered in seconds


def test_builder_max_query_sec_records_align_pad(db_and_model, corpus,
                                                 tmp_path):
    """indexer.max_query_sec at BUILD time -> align_pad in index_meta ->
    a default-loaded Database serves long queries on the fast engine."""
    import json

    from pfann_tpu.index.database import Database
    from pfann_tpu.utils.config import write_config

    cfg, _ = db_and_model
    cfg2 = dict(cfg, indexer=dict(cfg["indexer"], max_query_sec=20))
    cfg2_path = str(tmp_path / "configs.json")
    write_config(cfg2, cfg2_path)
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p, _ in corpus[:2])
    db_dir = str(tmp_path / "db_long")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "builder.py"), lst, db_dir,
         cfg2_path],
        check=True, env=env, cwd=REPO,
    )
    meta = json.load(open(os.path.join(db_dir, "index_meta.json")))
    assert meta["align_pad"] == 40  # ceil(20 / 0.5) = 40 windows
    db = Database(db_dir, cfg2["indexer"], hop_size=cfg2["hop_size"])
    assert db._align.pad == 40
    assert db._use_align(40) and not db._use_align(41)
