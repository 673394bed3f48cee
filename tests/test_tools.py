"""Offline tools: accuracy, mirexacc, stat, traintestsplit, csv2txt,
filterduration, extractscore/svm ensemble round trip."""

import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "ensemble"))


def test_stat_aggregation(tmp_path):
    # tools/stat.py clashes with stdlib `stat` — load by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pfann_stat", os.path.join(REPO, "tools", "stat.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    aggregate = mod.aggregate

    log = tmp_path / "x.log"
    log.write_text(
        "[t] [p/INFO] search 0.100000s\n"
        "[t] [p/INFO] search 0.200000s\n"
        "[t] [p/INFO] compute embedding 0.500000s\n"
        "garbage line\n"
    )
    totals = aggregate(str(log))
    assert abs(totals["search"] - 0.3) < 1e-9
    assert abs(totals["compute embedding"] - 0.5) < 1e-9


def test_traintestsplit(tmp_path, run_cli):
    src = tmp_path / "all.csv"
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"])
        w.writerows([["s%02d.wav" % i] for i in range(20)])
    out_train = tmp_path / "train.csv"
    out_test = tmp_path / "test.csv"
    run_cli(
        os.path.join(REPO, "tools", "traintestsplit.py"),
        ["--csv", str(src), "--train-size", "12",
         "--train", str(out_train), "--test", str(out_test)],
    )
    tr = [r[0] for r in list(csv.reader(open(out_train)))[1:]]
    te = [r[0] for r in list(csv.reader(open(out_test)))[1:]]
    assert len(tr) == 12 and len(te) == 8
    assert not set(tr) & set(te)


def test_csv2txt_and_filterduration(tmp_path, run_cli):
    src = tmp_path / "list.csv"
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "duration"])
        w.writerows([["a.wav", "10.0"], ["b.wav", "45.0"], ["c.wav", "31.0"]])
    out = tmp_path / "filtered.csv"
    run_cli(
        os.path.join(REPO, "tools", "filterduration.py"),
        ["--csv", str(src), "--min-len", "29.9", "--out", str(out)],
    )
    rows = list(csv.reader(open(out)))[1:]
    assert [r[0] for r in rows] == ["b.wav", "c.wav"]

    txt = tmp_path / "list.txt"
    run_cli(
        os.path.join(REPO, "tools", "csv2txt.py"),
        [str(src), "--dir", str(tmp_path), "--out", str(txt)],
    )
    lines = open(txt).read().splitlines()
    assert len(lines) == 3 and lines[0].endswith("a.wav") and os.path.isabs(lines[0])


def test_mirexacc(tmp_path, run_cli):
    gt = tmp_path / "gt.txt"
    gt.write_text("q1.wav\tsongA\nq2.wav\tsongB\nq3.wav\tsongC\n")
    pred = tmp_path / "pred_detail.csv"
    with open(pred, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "answer", "score", "time"])
        w.writerows([
            ["q1.wav", "songA", "0.9", "0"],
            ["q2.wav", "songX", "0.2", "0"],
            ["q3.wav", "songC", "0.8", "0"],
        ])
    out = run_cli(
        os.path.join(REPO, "tools", "mirexacc.py"),
        [str(gt), str(pred)], capture=True,
    )
    assert "song correct 2 acc 66.67" in out
    assert "threshold" in out


def test_ensemble_roundtrip(tmp_path, run_cli):
    """extractscore -> svmtrain (tiny grid) -> svmval flows end to end."""
    n_songs, n_q = 4, 12
    songlist = tmp_path / "songList.txt"
    songlist.write_text("".join("song%d.wav\n" % i for i in range(n_songs)))
    rng = np.random.default_rng(0)

    def write_run(prefix, dtype, col):
        pred = tmp_path / (prefix + ".txt")
        gt_rows, pred_rows = [], []
        bins = np.zeros((n_q, n_songs, 2), dtype=dtype)
        with open(pred, "w") as f:
            for q in range(n_q):
                true = q % n_songs
                ans = true if rng.random() > 0.3 else (true + 1) % n_songs
                f.write("q%d.wav\tsong%d.wav\n" % (q, ans))
                bins[q, ans, col] = rng.random() * 100
                gt_rows.append("q%d.wav\tsong%d.wav" % (q, true))
        bins.tofile(str(pred) + ".bin")
        return pred, gt_rows

    pred_nn, gt_rows = write_run("nn", np.float32, 0)
    pred_lm, _ = write_run("lm", np.int32, 1)
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join(gt_rows) + "\n")

    from extractscore import main as _  # noqa: F401  (import check)

    for script, pred, out in (
        ("extractscore.py", pred_nn, "nn.npy"),
        ("lmscore.py", pred_lm, "lm.npy"),
    ):
        run_cli(
            os.path.join(REPO, "ensemble", script),
            [str(songlist), str(gt), str(pred), str(tmp_path / out)],
        )
    nn = np.load(tmp_path / "nn.npy")
    lm = np.load(tmp_path / "lm.npy")
    assert nn.shape == (n_q, 2) and lm.shape == (n_q, 2)
    assert set(np.unique(nn[:, 1])) <= {0.0, 1.0}


def test_host_cast_bf16_matches_ml_dtypes():
    """host_cast's bit-twiddle f32->bf16 == ml_dtypes' RNE cast, incl.
    ties, subnormals, +-inf, and max-float overflow-to-inf."""
    import ml_dtypes

    from pfann_tpu.utils.fastcast import host_cast

    rng = np.random.default_rng(0)
    x = np.concatenate([
        (rng.standard_normal(4096)
         * 10.0 ** rng.integers(-30, 30, 4096)).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, np.inf, -np.inf,
                  np.float32(3.3895314e38),   # rounds up to inf
                  np.finfo(np.float32).tiny, 1e-45, -1e-45,
                  1.0039062, 1.0117188], np.float32),  # RNE ties
    ])
    fast = host_cast(x, ml_dtypes.bfloat16)
    ref = x.astype(ml_dtypes.bfloat16)
    assert fast.dtype == ref.dtype
    assert np.array_equal(fast.view(np.uint16), ref.view(np.uint16))
    # NaNs must stay NaN (the rounding add alone would wrap negative
    # high-mantissa NaN bits around uint32 and emit +0.0)
    nans = np.array([0xFFFFFFFF, 0x7FFFFFFF, 0xFFC00000, 0x7F800001],
                    np.uint32).view(np.float32)
    out = host_cast(nans, ml_dtypes.bfloat16)
    assert np.isnan(out.astype(np.float32)).all()
    # sign bit preserved through the NaN path
    assert (out.view(np.uint16) >> 15).tolist() == [1, 0, 1, 0]
    # non-fast-path combinations fall back to np.asarray semantics
    y64 = host_cast(x.astype(np.float64), np.float32)
    assert y64.dtype == np.float32
