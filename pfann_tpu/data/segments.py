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

TPU-first split: the host only slices int16 windows out of the memmap
(I/O-bound); ALL augmentation math (noise mix, IR fft-convolution) and the
mel front-end run as one jitted device program per batch
(ops/augment.py) — the reference burns 4 CPU worker processes on this
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

    def get_batch(
        self, indices: list[int], eval_time_shift: bool, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host part of __getitem__ (dataset_v2.py:126-149): returns
        (x_org [B, segment], x_aug_raw [B, pad_start + segment])."""
        seg = self.segment_size
        if eval_time_shift:
            shift_range = seg // 2
            x = [self.get_single_segment(i, -(seg // 4), seg + shift_range)
                 for i in indices]
            offset1 = np.full(len(x), seg // 4)
            offset2 = rng.integers(0, shift_range + 1, len(x))
        else:
            shift_range = self.time_offset - seg
            x = [self.get_single_segment(i, 0, self.time_offset) for i in indices]
            if self.params.get("time_shift_type", "triangle") == "uniform":
                # uniform RELATIVE shift (legacy v1 semantics,
                # dataset.py:266-274): draw the gap uniformly, then place
                # the pair randomly and randomly order org/aug
                n = len(x)
                shft = rng.integers(0, shift_range + 1, n)
                mov = rng.integers(0, shift_range - shft + 1, n)
                swap = rng.random(n) > 0.5
                offset1 = np.where(swap, shft + mov, mov)
                offset2 = np.where(swap, mov, shft + mov)
            else:
                # independent uniform positions => triangular relative
                # shift (dataset_v2.py:143-144)
                offset1 = rng.integers(0, shift_range + 1, len(x))
                offset2 = rng.integers(0, shift_range + 1, len(x))

        window = self.pad_start + seg
        x_org = np.stack(
            [xi[o + self.pad_start : o + window] for xi, o in zip(x, offset1)]
        )
        x_aug = np.stack([xi[o : o + window] for xi, o in zip(x, offset2)])
        return x_org, x_aug


class SegmentedDataLoader:
    """Builds the dataset, shuffler, device augmentation pipeline, and
    yields mel-spectrogram pair batches [b, 2 (or 1), F, T] as device
    arrays (dataset_v2.py:268-307 interface)."""

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

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.shuffler.set_epoch(epoch)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        self.shuffler.shuffle = self.shuffle
        rng = np.random.default_rng(1000 + self.epoch)
        key = jax.random.fold_in(jax.random.key(777), self.epoch)
        for step, idx in enumerate(batched(iter(self.shuffler), self.batch_size // 2)):
            x_org, x_aug = self.dataset.get_batch(idx, self.eval_time_shift, rng)
            yield self._augment_fn(
                jax.random.fold_in(key, step),
                jnp.asarray(x_org),
                jnp.asarray(x_aug),
                augmented=self.augmented,
            )

    def __len__(self) -> int:
        return -(-len(self.dataset) // (self.batch_size // 2))
