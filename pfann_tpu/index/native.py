"""ctypes bindings for the native CPU retrieval core (native/seqscore.cpp).

Parity role: the reference loads cpp/seqscore via ctypes with a version
handshake (database.py:12-32).  Here the native core is an optional CPU
acceleration for hosts without an accelerator; the TPU engines in
index/search.py / index/align.py are the primary path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

NATIVE_VERSION = 20260816001
_LIB = None


def lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libpfannseq.so",
    )


def build(quiet: bool = True) -> bool:
    """Build the native library with make; returns success."""
    native_dir = os.path.dirname(lib_path())
    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load(auto_build: bool = True):
    """Load (building if needed) the native core; returns the CDLL or
    None.  Refuses version-mismatched binaries (database.py:29-32)."""
    global _LIB
    if _LIB is not None:
        return _LIB
    path = lib_path()
    if not os.path.exists(path) and auto_build:
        if not build():
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.cdll.LoadLibrary(path)
    lib.pfann_version.restype = ctypes.c_int64
    if lib.pfann_version() != NATIVE_VERSION:
        print("native core wrong version! please `make -C native clean all`")
        return None
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pfann_query.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_int, c_i64p, ctypes.c_int,
        c_f32p, ctypes.c_int, ctypes.c_int, c_f32p, ctypes.c_int,
        ctypes.c_float,
    ]
    lib.pfann_query.restype = ctypes.c_int
    lib.pfann_seq_score.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_int, c_i64p, ctypes.c_int,
        c_f32p, ctypes.c_int, c_i64p, ctypes.c_int, c_f32p, ctypes.c_int,
        ctypes.c_float,
    ]
    lib.pfann_seq_score.restype = ctypes.c_int
    lib.pfann_topk.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_int, c_f32p, ctypes.c_int,
        ctypes.c_int, c_i64p, c_f32p,
    ]
    _LIB = lib
    return lib


def native_query(
    emb: np.ndarray,
    song_pos: np.ndarray,
    query: np.ndarray,
    top_k: int,
    frame_shift_mul: int = 1,
    score_alpha: float = 0.0,
) -> tuple[int, np.ndarray]:
    """Full native query; returns (best_song, song_scores [n_songs, 2]
    with times in sub-hop units)."""
    lib = load()
    assert lib is not None, "native core unavailable"
    emb = np.ascontiguousarray(emb, dtype=np.float32)
    song_pos = np.ascontiguousarray(song_pos, dtype=np.int64)
    query = np.ascontiguousarray(query, dtype=np.float32)
    n_songs = len(song_pos) - 1
    song_scores = np.zeros((n_songs, 2), dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    best = lib.pfann_query(
        emb.ctypes.data_as(f32p), emb.shape[0], emb.shape[1],
        song_pos.ctypes.data_as(i64p), n_songs,
        query.ctypes.data_as(f32p), query.shape[0],
        top_k, song_scores.ctypes.data_as(f32p),
        frame_shift_mul, score_alpha,
    )
    return best, song_scores
