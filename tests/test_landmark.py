"""Landmark (constellation-hash) subsystem: core + CLI contract
(pfann_tpu/landmark/, lm_builder.py, lm_matcher.py — the self-contained
replacement for the reference's external ../pfa dependency)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from pfann_tpu.audio.io import write_wav
from pfann_tpu.landmark import LandmarkIndex, extract_hashes, find_peaks
from pfann_tpu.landmark.core import DT_MAX, HOP, spectrogram

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 8000


def make_song(seed, sec=16):
    r = np.random.default_rng(seed)
    n = SR * sec
    out = np.zeros(n, np.float32)
    t = 0
    while t < n:
        dur = min(int(SR * r.uniform(0.2, 0.6)), n - t)
        tt = np.arange(dur) / SR
        out[t : t + dur] = sum(
            np.sin(2 * np.pi * f * tt + r.uniform(0, 6))
            for f in r.uniform(300, 3500, 3)
        ).astype(np.float32)
        t += dur
    return 0.5 * out + 0.005 * r.standard_normal(n).astype(np.float32)


@pytest.fixture(scope="module")
def songs():
    return [make_song(i) for i in range(6)]


@pytest.fixture(scope="module")
def index(songs):
    return LandmarkIndex.build(songs, song_list=["s%d.wav" % i
                                                 for i in range(6)])


def test_peaks_are_local_maxima(songs):
    spec = spectrogram(songs[0])
    peaks = find_peaks(spec)
    assert peaks.shape[0] > 50
    for f, t in peaks[:20]:
        f0, f1 = max(f - 2, 0), min(f + 3, spec.shape[0])
        t0, t1 = max(t - 2, 0), min(t + 3, spec.shape[1])
        assert spec[f, t] == spec[f0:f1, t0:t1].max()


def test_hash_fields_roundtrip():
    h, t = extract_hashes(make_song(42, sec=4))
    assert h.shape == t.shape and h.shape[0] > 100
    dt = h & 0x3F
    df = ((h >> 6) & 0x1FF) - 256
    f1 = h >> 15
    assert (dt >= 1).all() and (dt <= DT_MAX).all()
    assert (np.abs(df) <= 255).all()
    assert (f1 >= 0).all() and (f1 <= 512).all()


def test_query_noisy_crop_hits_song_and_time(songs, index):
    rng = np.random.default_rng(7)
    for sid in (0, 3, 5):
        start = int(rng.integers(0, SR * 8))
        q = songs[sid][start : start + SR * 5].copy()
        q += 0.3 * rng.standard_normal(q.shape).astype(np.float32)
        best, table = index.query(q)
        assert best == sid
        assert abs(table[best, 0] * HOP / SR - start / SR) <= 0.25
        # the winning song's votes dominate
        others = np.delete(table[:, 1], sid)
        assert table[sid, 1] > 2 * others.max()


def test_query_unknown_signal_low_score(index):
    rng = np.random.default_rng(8)
    best, table = index.query(
        rng.standard_normal(SR * 3).astype(np.float32)
    )
    assert table[:, 1].max() <= 8  # noise should not align anywhere


def test_empty_query(index):
    best, table = index.query(np.zeros(0, np.float32))
    assert best == -1 and (table == 0).all()


def test_save_load_roundtrip(tmp_path, songs, index):
    index.save(str(tmp_path / "lmdb"))
    loaded = LandmarkIndex.load(str(tmp_path / "lmdb"))
    np.testing.assert_array_equal(loaded.hashes, index.hashes)
    q = songs[2][SR : SR * 4]
    assert loaded.query(q)[0] == 2


@pytest.mark.slow
def test_lm_cli_end_to_end(tmp_path, songs):
    """lm_builder + lm_matcher produce the ../pfa output contract:
    TSV, .csv with header (accuracy input), int32 .bin with the score in
    column 1 (ensemble/lmscore.py input)."""
    music = tmp_path / "music"
    music.mkdir()
    paths = []
    for i, s in enumerate(songs):
        p = str(music / ("s%d.wav" % i))
        write_wav(p, s, SR)
        paths.append(p)
    db_list = str(tmp_path / "db.txt")
    with open(db_list, "w") as f:
        f.writelines(p + "\n" for p in paths)

    db_dir = str(tmp_path / "lmdb")
    env = dict(os.environ, PFANN_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "lm_builder.py"), db_list,
         db_dir], check=True, env=env, cwd=REPO,
    )

    rng = np.random.default_rng(3)
    qdir = tmp_path / "q"
    qdir.mkdir()
    qpaths, want = [], []
    for qi in range(4):
        sid = int(rng.integers(0, len(songs)))
        start = int(rng.integers(0, SR * 8))
        q = songs[sid][start : start + SR * 5].copy()
        q += 0.2 * rng.standard_normal(q.shape).astype(np.float32)
        p = str(qdir / ("q%d.wav" % qi))
        write_wav(p, 0.5 * q / np.abs(q).max(), SR)
        qpaths.append(p)
        want.append((paths[sid], start / SR))
    qlist = str(tmp_path / "qlist.txt")
    with open(qlist, "w") as f:
        f.writelines(p + "\n" for p in qpaths)

    result = str(tmp_path / "lm_result.txt")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "lm_matcher.py"), qlist,
         db_dir, result], check=True, env=env, cwd=REPO,
    )

    with open(result) as f:
        rows = [line.rstrip("\n").split("\t") for line in f]
    assert [r[1] for r in rows] == [w[0] for w in want]

    with open(result + ".csv") as f:
        crows = list(csv.DictReader(f))
    for row, (ans, t0) in zip(crows, want):
        assert os.path.basename(row["answer"]) == os.path.basename(ans)
        assert abs(float(row["time"]) - t0) <= 0.25

    bin_ = np.fromfile(result + ".bin", dtype=np.int32)
    table = bin_.reshape(4, len(songs), 2)
    for qi, (ans, _) in enumerate(want):
        sid = paths.index(ans)
        assert int(np.argmax(table[qi, :, 1])) == sid

    # lmscore consumes the bin + answers
    expected = str(tmp_path / "expected.csv")
    with open(expected, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "answer", "time"])
        for qp, (ans, t0) in zip(qpaths, want):
            w.writerow([qp, ans, t0])
    out_npy = str(tmp_path / "lm.npy")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "ensemble", "lmscore.py"),
         db_list, expected, result, out_npy],
        check=True, env=env, cwd=REPO,
    )
    sco = np.load(out_npy)
    assert sco.shape == (4, 2)
    assert (sco[:, 1] == 1).all()  # all answers correct above
    assert (sco[:, 0] > 0).all()

    # an "error" answer row (query with no hashes) must yield a
    # (0, incorrect) score instead of crashing lmscore
    with open(result) as f:
        lines = f.read()
    with open(result, "w") as f:
        f.write(lines.replace(rows[0][1], "error", 1))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "ensemble", "lmscore.py"),
         db_list, expected, result, out_npy],
        check=True, env=env, cwd=REPO,
    )
    sco = np.load(out_npy)
    assert sco[0, 0] == 0 and sco[0, 1] == 0
    assert (sco[1:, 1] == 1).all()


def _pair_peaks_loop(peaks):
    """Literal per-peak transcription of the pairing rules (the pre-
    vectorization implementation) — golden reference for pair_peaks."""
    from pfann_tpu.landmark.core import DF_MAX, DT_MIN, FANOUT

    n = peaks.shape[0]
    if n < 2:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    f, t = peaks[:, 0].astype(np.int64), peaks[:, 1].astype(np.int64)
    hashes, anchors = [], []
    for i in range(n - 1):
        j, taken = i + 1, 0
        while j < n and taken < FANOUT:
            dt = t[j] - t[i]
            if dt > DT_MAX:
                break
            df = f[j] - f[i]
            if dt >= DT_MIN and abs(df) <= DF_MAX:
                hashes.append((f[i] << 15) | ((df + 256) << 6) | dt)
                anchors.append(t[i])
                taken += 1
            j += 1
    return (np.asarray(hashes, dtype=np.int32),
            np.asarray(anchors, dtype=np.int32))


def test_pair_peaks_matches_loop_golden(songs):
    """The vectorized pairing (searchsorted windows + ragged expansion +
    running fanout cap) produces byte-identical hashes to the per-peak
    scan on real constellations and on adversarial synthetic ones."""
    from pfann_tpu.landmark.core import pair_peaks

    for wav in songs[:3]:
        peaks = find_peaks(spectrogram(wav))
        h_v, a_v = pair_peaks(peaks)
        h_l, a_l = _pair_peaks_loop(peaks)
        assert h_v.shape == h_l.shape and h_v.shape[0] > 100
        np.testing.assert_array_equal(h_v, h_l)
        np.testing.assert_array_equal(a_v, a_l)

    rng = np.random.default_rng(0)
    # adversarial: many same-frame peaks, dense frames (fanout saturates),
    # sparse tails (empty target windows), and the trivial sizes
    for n, tmax in ((300, 40), (80, 5), (500, 2000), (2, 1), (1, 1)):
        t = np.sort(rng.integers(0, tmax, n))
        f = rng.integers(0, 513, n)
        order = np.lexsort((f, t))  # stable time order, f asc within t
        peaks = np.stack([f[order], t[order]], axis=1).astype(np.int32)
        h_v, a_v = pair_peaks(peaks)
        h_l, a_l = _pair_peaks_loop(peaks)
        np.testing.assert_array_equal(h_v, h_l)
        np.testing.assert_array_equal(a_v, a_l)
