"""v2 synthetic-corpus generator invariants (tools/make_synth_corpus.py).

The corpus design carries the round-3 ensemble evaluation: song FAMILIES
(shared continuous-root scale + timbre + tempo, per-song note sequences)
must make sibling songs NN-confusable while keeping landmark peak-pair
hashes family-specific.  These tests pin the structural contracts; the
capability itself is measured by the accuracy harness (ACCURACY_r03)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_family_scale_is_continuous_and_detuned():
    from make_synth_corpus import make_family

    rng = np.random.default_rng(0)
    fams = [make_family(rng) for _ in range(8)]
    roots = np.array([f["scale"][0] for f in fams])
    # continuous roots: no two families share a root (v1's discrete
    # 36-note grid collided landmark hashes corpus-wide)
    assert np.unique(np.round(roots, 6)).size == len(fams)
    for f in fams:
        ratios = np.diff(np.log2(f["scale"]) * 12)
        # detuned 12-TET-ish: steps near 1 semitone but NOT exact
        assert np.all(np.abs(ratios - 1.0) < 1.0)
        assert np.abs(ratios - 1.0).max() > 1e-3


def test_songs_share_family_but_differ_in_sequence():
    from make_synth_corpus import make_family, make_song

    rng = np.random.default_rng(1)
    fam = make_family(rng)
    a = make_song(rng, 3.0, fam)
    b = make_song(rng, 3.0, fam)
    assert a.shape == b.shape == (24000,)
    for x in (a, b):
        assert np.abs(x).max() <= 0.61 and np.isfinite(x).all()
    # siblings are different signals (own note sequences)
    assert np.corrcoef(a, b)[0, 1] < 0.5


def test_noise_kinds_all_finite():
    from make_synth_corpus import make_noise_clip

    rng = np.random.default_rng(2)
    for kind in ("white", "pink", "amband", "hum", "babble", "bursts",
                 "sweep"):
        clip = make_noise_clip(rng, kind, 2.0)
        assert clip.shape == (16000,), kind
        assert np.isfinite(clip).all(), kind
        assert 0.05 < np.abs(clip).max() <= 0.51, kind


@pytest.mark.slow
def test_cli_layout_and_family_pooling(tmp_path):
    """db+test share one family pool: every test song must have an
    in-DB sibling (the confusability requirement); CLI writes the full
    list/IR/noise layout."""
    root = str(tmp_path / "c")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_corpus.py"),
         "--root", root, "--train-songs", "4", "--val-songs", "2",
         "--db-songs", "6", "--test-songs", "4", "--seconds", "4",
         "--family-size", "3"],
        check=True, cwd=REPO,
    )
    lists = os.path.join(root, "lists")
    for f in ("music_train.csv", "music_val.csv", "music_test.csv",
              "db.txt", "noise_train.csv", "noise_val.csv",
              "air_train.csv", "micirp_train.csv"):
        assert os.path.exists(os.path.join(lists, f)), f
    db = open(os.path.join(lists, "db.txt")).read().splitlines()
    assert len(db) == 10  # 6 dummies + 4 test songs, all in DB
    import csv

    with open(os.path.join(lists, "music_test.csv")) as f:
        test_names = [r["file"] for r in csv.DictReader(f)]
    assert all(any(n in line for line in db) for n in test_names)
