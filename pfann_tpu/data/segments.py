"""Training dataset: cached music corpus -> augmented segment pairs.

Parity target: datautil/dataset_v2.py:38-307 —
  * int16 memmap of the pre-resampled concatenated corpus (the cache
    format of preprocess.py, byte-compatible with the reference's)
  * per-segment cue table with allowed left/right shifts
    (dataset_v2.py:82-104)
  * pair cropping: eval_time_shift mode (org fixed at +T/4, aug random in
    [0, T/2]) vs train mode (both random in time_offset - segment)
    (dataset_v2.py:126-149)
  * fftconv_n = next pow2 >= segment + pad_start + air_len + ir_len
    (dataset_v2.py:52-58)
  * TwoStageShuffler + BatchSampler(batch_size // 2) plumbing
    (dataset_v2.py:268-307)

TPU-first split: the host only computes per-row crop CUES (a few int32
per segment); ALL sample movement and math happen on device.  When the
int16 corpus fits in HBM (device_corpus auto, <= ~2 GB) it is uploaded
ONCE and every batch window is cropped on device with vmapped
dynamic_slice — per step only [B]-sized cue arrays cross the host
boundary, not megabytes of audio (the tunneled-TPU H2D path was the
dominant cost of the round-3 pipeline: ~10 MB/step at ~30 MB/s).  The
host fallback (corpus too big / device_corpus false) gathers windows
with one vectorized fancy-index per batch instead of the old per-segment
Python slicing.  Augmentation (noise mix, IR fft-convolution) and the
mel front-end stay one jitted device program per batch (ops/augment.py)
— the reference burns 4 CPU worker processes on all of this
(train.py HOT LOOP, SURVEY.md 3.1).
"""

from __future__ import annotations

from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pfann_tpu.data.preprocess import ensure_music_cache
from pfann_tpu.data.shuffler import TwoStageShuffler, batched
from pfann_tpu.ops.augment import make_augment_fn
from pfann_tpu.ops.melspec import build_mel_spec_layer


class MusicSegmentDataset:
    def __init__(self, params: dict[str, Any], train_val: str, num_workers: int = 4):
        assert train_val in {"train", "validate"}
        sample_rate = params["sample_rate"]
        self.segment_size = int(params["segment_size"] * sample_rate)
        self.hop_size = int(params["hop_size"] * sample_rate)
        self.time_offset = int(params["time_offset"] * sample_rate)
        self.pad_start = int(params["pad_start"] * sample_rate)
        self.params = params

        # fft size needed for reverb (dataset_v2.py:52-58)
        fftconv_n = 1024
        air_len = int(params.get("air", {}).get("length", 0) * sample_rate)
        ir_len = int(params.get("micirp", {}).get("length", 0) * sample_rate)
        fft_needed = self.segment_size + self.pad_start + air_len + ir_len
        while fftconv_n < fft_needed:
            fftconv_n *= 2
        self.fftconv_n = fftconv_n

        # augmentation corpora (host load; device banks built by the loader)
        self.noise = self.air = self.micirp = None
        if params.get("noise", {}).get(train_val):
            from pfann_tpu.data.noise import NoiseData

            self.noise = NoiseData(
                noise_dir=params["noise"]["dir"],
                list_csv=params["noise"][train_val],
                sample_rate=sample_rate,
                cache_dir=params["cache_dir"],
            )
        if params.get("air", {}).get(train_val):
            from pfann_tpu.data.ir import AIR

            self.air = AIR(
                air_dir=params["air"]["dir"],
                list_csv=params["air"][train_val],
                length=params["air"]["length"],
                fftconv_n=fftconv_n,
                sample_rate=sample_rate,
            )
        if params.get("micirp", {}).get(train_val):
            from pfann_tpu.data.ir import MicIRP

            self.micirp = MicIRP(
                mic_dir=params["micirp"]["dir"],
                list_csv=params["micirp"][train_val],
                length=params["micirp"]["length"],
                fftconv_n=fftconv_n,
                sample_rate=sample_rate,
            )

        # music cache (memmap)
        prefix = ensure_music_cache(params, train_val, num_workers=num_workers)
        self.f = np.memmap(prefix + ".bin", dtype=np.int16, mode="r")
        song_len = np.load(prefix + ".npy")

        # cue tables (dataset_v2.py:82-104)
        cues, offset_left, offset_right, song_range = [], [], [], []
        t = 0
        for duration in song_len.tolist():
            num_segs = (duration - self.segment_size + self.hop_size) // self.hop_size
            start_cue = len(cues)
            for idx in range(num_segs):
                my_time = idx * self.hop_size
                cues.append(t + my_time)
                offset_left.append(my_time)
                offset_right.append(duration - my_time)
            song_range.append((start_cue, len(cues)))
            t += duration
        self.cues = np.asarray(cues, dtype=np.int64)
        self.offset_left = np.asarray(offset_left, dtype=np.int64)
        self.offset_right = np.asarray(offset_right, dtype=np.int64)
        self.song_range = song_range

    def __len__(self) -> int:
        return len(self.cues)

    def get_num_songs(self) -> int:
        return len(self.song_range)

    def get_single_segment(self, idx: int, offset: int, length: int) -> np.ndarray:
        """One window of pad_start + length samples, zero-padded at the
        song edges (dataset_v2.py:109-124).  Returned as raw int16 — the
        1/32768 scaling happens on device, so host->device transfers stay
        2 bytes/sample."""
        cue = int(self.cues[idx]) + offset
        left = int(self.offset_left[idx]) + offset
        right = int(self.offset_right[idx]) - offset
        seg = self.f[cue - min(left, self.pad_start) : cue + min(right, length)]
        return np.pad(
            seg, [max(0, self.pad_start - left), max(0, length - right)]
        )

    def get_batch_cues(
        self, indices: list[int], eval_time_shift: bool, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Crop cues for one batch (the host part of dataset_v2.py:126-149
        reduced to index math): returns int64 (org_start [B], aug_start
        [B], lo [B], hi [B]) where org/aug windows are the absolute-sample
        slices [start, start + W) of the corpus and [lo, hi) is the valid
        sample range of each row's song (outside -> zero, the
        get_single_segment edge-padding convention).  The rng draw order
        matches the round-3 per-segment implementation exactly, so batch
        streams are bit-identical."""
        idx = np.asarray(indices)
        seg = self.segment_size
        c0 = self.cues[idx]
        l0 = self.offset_left[idx]
        r0 = self.offset_right[idx]
        if eval_time_shift:
            shift_range = seg // 2
            # org fixed at +T/4, aug random in [0, T/2] around cue-T/4
            cue = c0 - seg // 4
            left = l0 - seg // 4
            right = r0 + seg // 4
            length = seg + shift_range
            offset1 = np.full(len(idx), seg // 4)
            offset2 = rng.integers(0, shift_range + 1, len(idx))
        else:
            shift_range = self.time_offset - seg
            cue, left, right, length = c0, l0, r0, self.time_offset
            if self.params.get("time_shift_type", "triangle") == "uniform":
                # uniform RELATIVE shift (legacy v1 semantics,
                # dataset.py:266-274): draw the gap uniformly, then place
                # the pair randomly and randomly order org/aug
                n = len(idx)
                shft = rng.integers(0, shift_range + 1, n)
                mov = rng.integers(0, shift_range - shft + 1, n)
                swap = rng.random(n) > 0.5
                offset1 = np.where(swap, shft + mov, mov)
                offset2 = np.where(swap, mov, shft + mov)
            else:
                # independent uniform positions => triangular relative
                # shift (dataset_v2.py:143-144)
                offset1 = rng.integers(0, shift_range + 1, len(idx))
                offset2 = rng.integers(0, shift_range + 1, len(idx))
        lo = cue - np.minimum(left, self.pad_start)
        hi = cue + np.minimum(right, length)
        org_start = cue + offset1
        aug_start = cue - self.pad_start + offset2
        return org_start, aug_start, lo, hi

    def _gather_host(
        self, starts: np.ndarray, lo: np.ndarray, hi: np.ndarray, W: int
    ) -> np.ndarray:
        """One vectorized fancy-index gather of [B, W] int16 windows with
        song-edge zeroing (replaces the round-3 per-segment Python
        slicing+padding loop — the 'vectorize host segment assembly' item
        of VERDICT r3 next #3)."""
        idx = starts[:, None] + np.arange(W, dtype=np.int64)[None, :]
        x = self.f[np.clip(idx, 0, self.f.shape[0] - 1)]
        ok = (idx >= lo[:, None]) & (idx < hi[:, None])
        return np.where(ok, x, np.int16(0))

    def get_batch(
        self, indices: list[int], eval_time_shift: bool, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host part of __getitem__ (dataset_v2.py:126-149): returns
        (x_org [B, segment], x_aug_raw [B, pad_start + segment])."""
        org_start, aug_start, lo, hi = self.get_batch_cues(
            indices, eval_time_shift, rng
        )
        x_org = self._gather_host(org_start, lo, hi, self.segment_size)
        x_aug = self._gather_host(
            aug_start, lo, hi, self.pad_start + self.segment_size
        )
        return x_org, x_aug


import functools


@functools.partial(jax.jit, static_argnames=("w_org", "w_aug", "shift"))
def gather_windows(
    corpus, org_start, aug_start, lo, hi, *, w_org: int, w_aug: int, shift: int
):
    """Device-side batch crop: corpus is the int16 cache padded with
    ``shift`` zeros at both ends; starts/lo/hi are absolute sample cues
    (get_batch_cues).  vmapped dynamic_slice = one contiguous DMA per
    row; song-edge samples outside [lo, hi) are zeroed, reproducing the
    host path bit-for-bit."""

    def take(starts, W):
        sl = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(corpus, s + shift, W)
        )(starts)
        idx = starts[:, None] + jnp.arange(W, dtype=starts.dtype)[None, :]
        ok = (idx >= lo[:, None]) & (idx < hi[:, None])
        return jnp.where(ok, sl, 0)

    return take(org_start, w_org), take(aug_start, w_aug)


class SegmentedDataLoader:
    """Builds the dataset, shuffler, device augmentation pipeline, and
    yields mel-spectrogram pair batches [b, 2 (or 1), F, T] as device
    arrays (dataset_v2.py:268-307 interface)."""

    # device_corpus 'auto' uploads caches up to this size; int32 cue
    # arithmetic on device needs total samples < 2^31 anyway
    DEVICE_CORPUS_MAX_BYTES = 2 << 30

    def __init__(self, train_val: str, configs: dict[str, Any], num_workers: int = 4):
        assert train_val in {"train", "validate"}
        self.dataset = MusicSegmentDataset(configs, train_val, num_workers)
        assert configs["batch_size"] % 2 == 0
        self.batch_size = configs["batch_size"]
        self.configs = configs
        self.shuffler = TwoStageShuffler(
            len(self.dataset),
            configs.get("shuffle_size"),
            song_ranges=self.dataset.song_range,
        )
        self.shuffle = True
        self.augmented = True
        self.eval_time_shift = False
        self.epoch = 0

        ds = self.dataset
        mel = build_mel_spec_layer(configs)
        from pfann_tpu.ops.augment import complex_bank

        # IR spectra travel as f32 real/imag pairs: complex arrays can't
        # cross the host<->device boundary on some TPU runtimes
        noise_bank = (
            jnp.asarray(ds.noise.data) if ds.noise is not None else None
        )
        air_spec = (
            jnp.asarray(complex_bank(ds.air.data)) if ds.air is not None else None
        )
        mic_spec = (
            jnp.asarray(complex_bank(ds.micirp.data))
            if ds.micirp is not None else None
        )
        noise_cfg = configs.get("noise", {})
        band_power = None
        if noise_cfg.get("snr_only_in_f_range", False):
            # SNR measured after a -24 dB bass shelf below f_min
            # (reference dataset.py:209-226, configs/snr.json)
            from pfann_tpu.ops.augment import bass_shelf_power_response

            band_power = jnp.asarray(
                bass_shelf_power_response(
                    ds.pad_start + ds.segment_size,
                    configs["sample_rate"],
                    -24.0,
                    configs["f_min"],
                )
            )
        self._augment_fn = make_augment_fn(
            mel,
            noise_bank,
            air_spec,
            mic_spec,
            fftconv_n=ds.fftconv_n,
            pad_start=ds.pad_start,
            segment_size=ds.segment_size,
            snr_min=noise_cfg.get("snr_min", 0),
            snr_max=noise_cfg.get("snr_max", 10),
            band_power=band_power,
        )

        # device-resident corpus: 'auto' (default) uploads the int16
        # cache to HBM once when it fits, so per step only [B]-sized cue
        # arrays cross the host boundary (module docstring); True forces
        # it, False keeps the host gather (the >HBM fallback)
        mode = configs.get("device_corpus", "auto")
        total_bytes = ds.f.shape[0] * 2
        use_dev = mode is True or (
            mode == "auto"
            and jax.default_backend() == "tpu"
            and total_bytes <= self.DEVICE_CORPUS_MAX_BYTES
        )
        self._corpus_dev = None
        if use_dev:
            assert ds.f.shape[0] < 2**31, "int32 cue overflow"
            self._gather_shift = ds.pad_start + ds.segment_size + max(
                ds.time_offset, ds.segment_size
            )
            self._corpus_dev = jax.device_put(
                jnp.asarray(
                    np.pad(ds.f, (self._gather_shift, self._gather_shift))
                )
            )
        # per-epoch host/dispatch phase split, read by bench.py
        # --train-epoch (VERDICT r3 next #3's measured breakdown)
        self.last_stats: dict[str, float] = {}

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.shuffler.set_epoch(epoch)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        import time

        self.shuffler.shuffle = self.shuffle
        rng = np.random.default_rng(1000 + self.epoch)
        key = jax.random.fold_in(jax.random.key(777), self.epoch)
        stats = {"host_s": 0.0, "dispatch_s": 0.0, "steps": 0}
        self.last_stats = stats
        ds = self.dataset
        for step, idx in enumerate(batched(iter(self.shuffler), self.batch_size // 2)):
            t0 = time.time()
            if self._corpus_dev is not None:
                org_start, aug_start, lo, hi = ds.get_batch_cues(
                    idx, self.eval_time_shift, rng
                )
                args = [
                    jnp.asarray(a.astype(np.int32))
                    for a in (org_start, aug_start, lo, hi)
                ]
                t1 = time.time()
                x_org, x_aug = gather_windows(
                    self._corpus_dev, *args,
                    w_org=ds.segment_size,
                    w_aug=ds.pad_start + ds.segment_size,
                    shift=self._gather_shift,
                )
            else:
                x_org, x_aug = ds.get_batch(idx, self.eval_time_shift, rng)
                t1 = time.time()
                x_org = jnp.asarray(x_org)
                x_aug = jnp.asarray(x_aug)
            out = self._augment_fn(
                jax.random.fold_in(key, step),
                x_org,
                x_aug,
                augmented=self.augmented,
            )
            t2 = time.time()
            stats["host_s"] += t1 - t0
            stats["dispatch_s"] += t2 - t1
            stats["steps"] += 1
            yield out

    def __len__(self) -> int:
        return -(-len(self.dataset) // (self.batch_size // 2))
