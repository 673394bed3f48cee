"""Contrastive training loop.

Parity target: reference train.py:54-262 —
  * NT-Xent over interleaved (org, aug) pairs, tau from config
  * SpecAugment applied batch-wide on device (train.py:80-81)
  * Adam (lr 1e-4) or LAMB (wd 1e-6) (train.py:204-209)
  * CosineAnnealingWarmRestarts(T_0=epochs, eta_min=1e-7) stepped per
    epoch (train.py:60-61)
  * per-epoch validation ranking: rank of each val positive among all
    train + val-org embeddings; top-1/10/20/100 (train.py:111-163)
  * checkpoint / epochs.txt / date.txt / final model export contract
    (train.py:169-185,213-237)

TPU-first: one fused jitted train step (mel-space batch in, params out) —
no AMP GradScaler (bf16 compute needs no loss scaling) and no
gradient-cache two-pass (the full reference batch fits on one chip; larger
batches scale via data parallelism over a mesh, not host chunking).
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
from functools import partial
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pfann_tpu.models.fp_network import build_fp_network
from pfann_tpu.ops.specaug import SpecAugment
from pfann_tpu.train.loss import similarity_loss
from pfann_tpu.train.schedule import cosine_warm_restarts
from pfann_tpu.utils import checkpoint as ckpt
from pfann_tpu.utils.logging import get_logger


def make_optimizer(params_cfg: dict[str, Any]) -> optax.GradientTransformation:
    """Adam lr=1e-4 default, or LAMB wd=1e-6 (train.py:204-209).  The lr is
    injected as a hyperparameter so the per-epoch cosine schedule can be
    set on the host without retracing."""
    lr = params_cfg.get("lr", 1e-4)
    name = params_cfg.get("optimizer", "adam")
    if name == "lamb":
        return optax.inject_hyperparams(optax.lamb)(
            learning_rate=lr, weight_decay=1e-6
        )
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


class MetricsWriter:
    """tensorboardX when available (parity with train.py:240-244) plus an
    always-on JSONL log in the model dir."""

    def __init__(self, model_dir: str, run_name: str):
        self.jsonl = open(os.path.join(model_dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            import tensorboardX

            self.tb = tensorboardX.SummaryWriter("runs/" + run_name)
        except ImportError:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self.jsonl.flush()
        if self.tb:
            self.tb.add_scalar(tag, value, step)

    def flush(self) -> None:
        if self.tb:
            self.tb.flush()


class Trainer:
    def __init__(
        self,
        params: dict[str, Any],
        compute_dtype=jnp.bfloat16,
        mesh: jax.sharding.Mesh | None = None,
        data_axis: str = "dp",
    ):
        self.params = params
        self.model = build_fp_network(params, compute_dtype=compute_dtype)
        self.tau = params.get("tau", 0.05)
        self.total_epoch = params.get("epoch", 100)
        self.specaug = SpecAugment(params)
        self.tx = make_optimizer(params)
        self.lr_fn = cosine_warm_restarts(
            params.get("lr", 1e-4), t0=self.total_epoch, eta_min=1e-7
        )
        self.mesh = mesh
        self.data_axis = data_axis
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        model, specaug, tau, tx = self.model, self.specaug, self.tau, self.tx

        def train_step(params, opt_state, x, key):
            # x: [n, F, T] interleaved (org, aug) rows, already mel-space
            x = specaug.augment(key, x)

            def loss_fn(p):
                y = model.apply(p, x)
                return similarity_loss(y, tau)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def embed_step(params, x, norm=True):
            return model.apply(params, x, norm=norm)

        def rank_step(embeds, y_aug, self_score):
            # counts per val row of reference embeddings scoring >= self
            # (train.py:147-153)
            a = jnp.matmul(embeds, y_aug.T, preferred_element_type=jnp.float32)
            return jnp.sum(a >= self_score[None, :], axis=0)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            row_sharded = NamedSharding(self.mesh, P(self.data_axis))
            self.train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, row_sharded, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            self.embed_step = jax.jit(
                embed_step,
                in_shardings=(repl, row_sharded),
                static_argnums=(2,),
            )
        else:
            self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self.embed_step = jax.jit(embed_step, static_argnums=(2,))
        self.rank_step = jax.jit(rank_step)

    # ------------------------------------------------------------------
    def init_state(self, seed: int = 123):
        F, T = self.model.F, self.model.T
        # jit the init: eager flax init runs hundreds of tiny eager op
        # compiles (~17 s on the single-core CPU backend); one jitted
        # program also lands in the persistent compilation cache.
        params = jax.jit(self.model.init)(
            jax.random.key(seed), jnp.zeros((2, F, T))
        )
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)
        return params, opt_state

    def set_lr(self, opt_state, epoch: int):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            self.lr_fn(epoch), dtype=jnp.float32
        )
        return opt_state

    # ------------------------------------------------------------------
    def train_epoch(self, params, opt_state, loader, epoch: int, seed: int = 123):
        logger = get_logger()
        loader.shuffle = True
        loader.eval_time_shift = False
        loader.augmented = True
        loader.set_epoch(epoch)
        opt_state = self.set_lr(opt_state, epoch)
        losses = []
        base_key = jax.random.fold_in(jax.random.key(seed), epoch)
        t0 = time.time()
        from pfann_tpu.data.prefetch import prefetch

        for step, x in enumerate(prefetch(iter(loader))):
            x = jnp.asarray(x)  # no-op for device-resident loader outputs
            x = x.reshape((-1,) + x.shape[2:])  # flatten pairs (train.py:80)
            key = jax.random.fold_in(base_key, step)
            params, opt_state, loss = self.train_step(
                params, opt_state, x, key
            )
            losses.append(loss)
        losses = [float(l) for l in losses]
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        logger.info("epoch %d train loss %f (%.1fs)", epoch + 1, mean_loss, time.time() - t0)
        return params, opt_state, mean_loss

    def _embed_all(self, params, batches: Iterable, chunk: int = 1280):
        """Embed a stream of [n, F, T] arrays (host or device resident)
        with a fixed-chunk jitted step (tail padded so every call hits the
        same compiled program).  Only the [chunk, d] embeddings come back
        to the host — batches stay on device."""
        from pfann_tpu.index.search import bucket_tail_rows

        outs, buf, count = [], [], 0
        F, T = self.model.F, self.model.T
        # CPU pads ragged tails to power-of-two buckets, TPU keeps the
        # one fixed chunk shape — policy shared with Embedder._pad_to
        bucket_tail = jax.default_backend() != "tpu"

        def flush(arr, n_valid):
            target = bucket_tail_rows(arr.shape[0], chunk, bucket_tail)
            pad = target - arr.shape[0]
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.zeros((pad, F, T), arr.dtype)]
                )
            y = self.embed_step(params, arr)
            outs.append(np.asarray(y)[:n_valid])

        for x in batches:
            buf.append(jnp.asarray(x, dtype=jnp.float32))
            count += buf[-1].shape[0]
            if count >= chunk:
                arr = jnp.concatenate(buf)
                for i in range(0, arr.shape[0] - chunk + 1, chunk):
                    flush(arr[i : i + chunk], chunk)
                rem = arr.shape[0] % chunk
                buf = [arr[arr.shape[0] - rem :]] if rem else []
                count = rem
        if count:
            flush(jnp.concatenate(buf) if len(buf) > 1 else buf[0], count)
        return np.concatenate(outs) if outs else np.zeros((0, self.model.d), np.float32)

    def validate(self, params, train_loader, val_loader) -> dict[str, float]:
        """Ranking validation (train.py:111-163).  The train set is
        embedded clean (augmented=False, org crop only); the val set keeps
        augmentation ON — ranking measures retrieval of the *noisy* pair
        (train.py:115-135 flag settings)."""
        for ld in (train_loader, val_loader):
            ld.shuffle = False
            ld.eval_time_shift = True
        train_loader.augmented = False
        val_loader.augmented = True

        x_embed = self._embed_all(
            params, (jnp.asarray(x)[:, 0] for x in train_loader)
        )
        y_embed = self._embed_all(
            params,
            (jnp.asarray(x).reshape((-1,) + x.shape[2:]) for x in val_loader),
        )
        y_org, y_aug = y_embed[0::2], y_embed[1::2]
        v = y_org.shape[0]
        self_score = jnp.asarray(np.sum(y_org * y_aug, axis=1))
        y_aug_d = jnp.asarray(y_aug)
        ranks = np.zeros(v, dtype=np.int64)
        chunk = 4096
        for source in (x_embed, y_org):
            for i in range(0, source.shape[0], chunk):
                part = source[i : i + chunk]
                if part.shape[0] < chunk:
                    part = np.concatenate(
                        [part, np.full((chunk - part.shape[0], part.shape[1]), -10.0, np.float32)]
                    )
                ranks += np.asarray(self.rank_step(jnp.asarray(part), y_aug_d, self_score))
        return {
            "accuracy": float((ranks == 1).sum() / max(v, 1)),
            "top10": float((ranks <= 10).sum() / max(v, 1)),
            "top20": float((ranks <= 20).sum() / max(v, 1)),
            "top100": float((ranks <= 100).sum() / max(v, 1)),
        }

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader, config_path: str | None = None):
        """Full training with resume, mirroring test_train + train
        (train.py:54-262).  Returns final params."""
        params_cfg = self.params
        model_dir = params_cfg["model_dir"]
        os.makedirs(model_dir, exist_ok=True)
        logger = get_logger()

        date_path = os.path.join(model_dir, "date.txt")
        if os.path.exists(date_path):
            date_str = open(date_path).read().strip()
        else:
            date_str = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
            with open(date_path, "w") as f:
                f.write(date_str + "\n")

        params, opt_state = self.init_state()
        start_epoch = ckpt.last_epoch(model_dir)
        if start_epoch >= 0:
            if start_epoch + 1 >= self.total_epoch:
                print("This model has finished training!")
                return None
            print("Load from epoch %d" % (start_epoch + 1))
            state = ckpt.load_checkpoint(
                model_dir,
                start_epoch,
                {"epoch": 0, "params": params, "opt_state": opt_state},
            )
            params, opt_state = state["params"], state["opt_state"]
        elif config_path:
            shutil.copyfile(config_path, os.path.join(model_dir, "configs.json"))

        safe_name = os.path.basename(os.path.normpath(model_dir))
        writer = MetricsWriter(model_dir, safe_name + "-" + date_str)

        for epoch in range(start_epoch + 1, self.total_epoch):
            print("epoch %d" % (epoch + 1))
            params, opt_state, mean_loss = self.train_epoch(
                params, opt_state, train_loader, epoch
            )
            writer.add_scalar("train/loss", mean_loss, epoch)
            print("loss: %f" % mean_loss)

            metrics = self.validate(params, train_loader, val_loader)
            print("validate score: %f" % metrics["accuracy"])
            writer.add_scalar("validation/accuracy", metrics["accuracy"], epoch)
            writer.add_scalar("validation/top10", metrics["top10"], epoch)
            writer.add_scalar("validation/top20", metrics["top20"], epoch)
            writer.add_scalar("validation/top100", metrics["top100"], epoch)
            writer.flush()

            ckpt.save_checkpoint(
                model_dir,
                epoch,
                {"epoch": epoch, "params": params, "opt_state": opt_state},
            )
            logger.info("epoch %d done", epoch + 1)

        ckpt.save_model(os.path.join(model_dir, ckpt.MODEL_FILE_NAME), params)
        return params
