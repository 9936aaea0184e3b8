"""Training engine: jitted SGD loop with hooks, schedule, and checkpoints.

Replaces detectron2's DefaultTrainer that the reference subclasses
(reference data_utils.py:135-177; call stack SURVEY.md §3.2): SGD momentum
with linear warmup + multistep decay, backbone freezing (FREEZE_AT), hook
protocol (used by ampis_tpu.data_utils.LossEvalHook for validation loss,
mirroring the reference's LossEvalHook at data_utils.py:37-132), periodic
orbax checkpoints, and EventStorage metrics.

TPU design: ONE compiled train-step family per (canvas, batch) shape —
resize/normalize/pad run in-graph; the loss path and the validation-loss
path (train-mode losses on val data, the reference's hard part #5 in
SURVEY.md §7) share the same compiled loss function. Data parallelism:
batch sharded over a 1-D 'data' mesh, params replicated; XLA inserts the
gradient all-reduce (ampis_tpu.parallel).
"""
from __future__ import annotations

import time

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..input.transforms import photometric_jitter, preprocess_image
from ..models.mask_rcnn import MaskRCNN, build_model, init_params
from ..utils.compile_cache import enable_persistent_cache
from ..parallel.mesh import data_parallel_mesh, replicate, shard_batch
from .checkpoint import (graft_backbone, latest_checkpoint, load_weights,
                         restore_checkpoint, save_checkpoint)
from .data import loader_from_config
from .events import EventStorage

LOSS_KEYS = ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
             "loss_mask")


def build_lr_schedule(cfg, host=False):
    """Linear warmup + multistep gamma decay (detectron2 WarmupMultiStepLR).

    host=True returns a pure-python mirror (for logging: eager jnp ops
    would round-trip the device tunnel every step).
    """
    base = cfg.SOLVER.BASE_LR
    steps = sorted(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR

    if host:
        def schedule_host(step):
            alpha = min(max(step / max(warmup_iters, 1), 0.0), 1.0)
            warmup = warmup_factor * (1 - alpha) + alpha
            decay = gamma ** sum(1 for s in steps if step >= s)
            return base * warmup * decay
        return schedule_host

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warmup = warmup_factor * (1 - alpha) + alpha
        decay = jnp.asarray(1.0)
        for s in steps:
            decay = decay * jnp.where(step >= s, gamma, 1.0)
        return base * warmup * decay

    return schedule


def trainable_mask(params, freeze_at=2, train_norm=False):
    """False for frozen leaves: norm affines (FrozenBN stats) unless
    train_norm (GN backbones train their norms); stem/res2 at
    freeze_at>=1/2 (detectron2 BACKBONE.FREEZE_AT semantics)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if "norm" in path and not train_norm:
            return False
        if freeze_at >= 1 and "stem" in path:
            return False
        if freeze_at >= 2 and any(p.startswith("res2") for p in path):
            return False
        return True

    return walk(params, ())


def param_labels(params, freeze_at=2, train_norm=False):
    """Optimizer group per leaf: 'frozen' (zero updates), 'norm'
    (trainable norm affines — weight-decayed with SOLVER.
    WEIGHT_DECAY_NORM, detectron2 default 0: the He et al. 2019
    from-scratch GN recipe excludes norm params from decay), or
    'trainable' (everything else). Freezing rules match
    trainable_mask."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if "norm" in path and not train_norm:
            return "frozen"
        if freeze_at >= 1 and "stem" in path:
            return "frozen"
        if freeze_at >= 2 and any(p.startswith("res2") for p in path):
            return "frozen"
        return "norm" if "norm" in path else "trainable"

    return walk(params, ())


class Trainer:
    """trainer = Trainer(cfg); trainer.resume_or_load(); trainer.train()."""

    def __init__(self, cfg):
        enable_persistent_cache()
        self.cfg = cfg
        self.model = build_model(cfg)
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.iter = 0
        self.storage = EventStorage(cfg.OUTPUT_DIR)
        # persist the exact training config next to the checkpoints
        # (detectron2 writes config.yaml the same way): predictors built
        # later from a checkpoint can recover run-specific keys such as
        # PIXEL_MEAN/PIXEL_STD (see examples/powder_workflow.py).
        if cfg.OUTPUT_DIR:
            out = Path(cfg.OUTPUT_DIR)
            out.mkdir(parents=True, exist_ok=True)
            (out / "config.json").write_text(cfg.dump())
        self._hooks = []
        self._rng = jax.random.PRNGKey(max(cfg.SEED, 0))

        # params
        if cfg.MODEL.WEIGHTS:
            self.params = load_weights(cfg.MODEL.WEIGHTS, self.model)
        else:
            self.params = init_params(self.model, jax.random.PRNGKey(0))
            if cfg.MODEL.BACKBONE.WEIGHTS:
                self.params = graft_backbone(
                    self.params, cfg.MODEL.BACKBONE.WEIGHTS,
                    expect_norm=cfg.MODEL.RESNETS.NORM)

        # optimizer: SGD momentum + weight decay; frozen params (FrozenBN
        # stats, stem/res2 per FREEZE_AT) get zero updates
        self.schedule = build_lr_schedule(cfg)
        train_norm = cfg.MODEL.RESNETS.NORM.lower() == "gn"
        self._mask = trainable_mask(
            self.params, freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            train_norm=train_norm)
        labels = param_labels(
            self.params, freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            train_norm=train_norm)

        def make_sgd(decay):
            sgd = optax.chain(
                optax.add_decayed_weights(decay),
                optax.sgd(self.schedule, momentum=cfg.SOLVER.MOMENTUM))
            if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
                clip = (optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
                        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value"
                        else optax.clip_by_global_norm(
                            cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
                sgd = optax.chain(clip, sgd)
            return sgd

        self.tx = optax.multi_transform(
            {"trainable": make_sgd(cfg.SOLVER.WEIGHT_DECAY),
             "norm": make_sgd(cfg.SOLVER.WEIGHT_DECAY_NORM),
             "frozen": optax.set_to_zero()}, labels)
        self.opt_state = self.tx.init(self.params)

        # EMA shadow weights (SOLVER.EMA_DECAY; 0 = off): updated inside
        # the jitted train step, saved with every checkpoint, preferred by
        # load_weights at inference.
        self.ema_decay = float(getattr(cfg.SOLVER, "EMA_DECAY", 0.0) or 0.0)
        # real copies, not jnp.asarray: the shadow must own its buffers —
        # the train step donates params and ema_params independently
        self.ema_params = (jax.tree.map(lambda x: jnp.array(x, copy=True),
                                        self.params)
                           if self.ema_decay else None)

        # data
        self.train_loader = (
            loader_from_config(cfg, tuple(cfg.DATASETS.TRAIN), train=True)
            if cfg.DATASETS.TRAIN else None)

        # mesh (data parallelism) when multiple devices are available and
        # batch divides evenly
        n_dev = len(jax.devices())
        bs = cfg.SOLVER.IMS_PER_BATCH
        if cfg.TPU.MESH_SHAPE:
            n_mesh = int(np.prod(cfg.TPU.MESH_SHAPE))
        else:
            n_mesh = n_dev if bs % max(n_dev, 1) == 0 and n_dev > 1 else 1
        self.mesh = data_parallel_mesh(n_mesh) if n_mesh > 1 else None
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
            if self.ema_params is not None:
                self.ema_params = replicate(self.ema_params, self.mesh)

        # device-resident sample cache (engine.device_cache): upload each
        # (image, scale, flip) variant once, assemble batches on-device —
        # zero steady-state host->device data transfer. On a mesh the
        # variants are cached replicated and the stacked batch comes out
        # sharded over 'data' (see device_cache.py), so the multi-chip
        # path gets the same property.
        cache_mb = int(getattr(cfg.TPU, "DEVICE_DATA_CACHE_MB", 0) or 0)
        self.device_batcher = None
        if cache_mb > 0 and self.train_loader:
            from .device_cache import DeviceBatcher
            self.device_batcher = DeviceBatcher(self.train_loader,
                                                cache_mb << 20,
                                                mesh=self.mesh)

        self._build_step_fns()

    # ------------------------------------------------------------------ API

    def register_hook(self, hook, index=None):
        hook.trainer = self
        if index is None:
            self._hooks.append(hook)
        else:
            self._hooks.insert(index, hook)

    def build_val_loader(self, dataset_name):
        return loader_from_config(self.cfg, dataset_name, train=False)

    def resume_or_load(self, resume=True):
        if resume:
            ckpt = latest_checkpoint(self.cfg.OUTPUT_DIR)
            if ckpt is not None:
                target = {"params": self.params,
                          "opt_state": self.opt_state,
                          "step": 0}
                if self.ema_params is not None:
                    target["ema_params"] = self.ema_params
                try:
                    state = restore_checkpoint(ckpt, target=target)
                except (KeyError, ValueError):
                    # tree-structure mismatch on the EMA shadow, in either
                    # direction: checkpoint predates EMA (EMA newly
                    # enabled) -> restore without and re-seed the shadow
                    # from the params below; or the checkpoint carries an
                    # EMA shadow but EMA is now off -> restore into a
                    # throwaway target and drop it
                    if "ema_params" in target:
                        target.pop("ema_params")
                    else:
                        target["ema_params"] = jax.tree.map(
                            lambda x: x, self.params)
                    state = restore_checkpoint(ckpt, target=target)
                self.params = state["params"]
                self.opt_state = state["opt_state"]
                if self.ema_params is not None:
                    self.ema_params = jax.tree.map(
                        lambda x: jnp.array(x, copy=True),
                        state.get("ema_params", self.params))
                self.iter = int(state["step"])
                self.storage.iter = self.iter
                self._step_dev = None  # reseed from the restored iter
        return self

    # ----------------------------------------------------------- jit steps
    # Built as plain closure-jitted functions (not method-jits): donated
    # method-jits stalled the axon remote backend on re-execution.

    def _build_step_fns(self):
        model = self.model
        tx = self.tx
        mean = tuple(self.cfg.MODEL.PIXEL_MEAN)
        std = tuple(self.cfg.MODEL.PIXEL_STD)
        bright = tuple(self.cfg.INPUT.RANDOM_BRIGHTNESS)
        contrast = tuple(self.cfg.INPUT.RANDOM_CONTRAST)
        jitter = bright != (1.0, 1.0) or contrast != (1.0, 1.0)

        def loss_fn(params, images, gt_boxes, gt_classes, gt_valid,
                    gt_masks, gt_mask_meta, image_hw, rng, new_shape,
                    canvas):
            if jitter:
                # in-graph photometric augmentation (INPUT.RANDOM_BRIGHTNESS
                # / RANDOM_CONTRAST); keys derived by fold_in so the model's
                # sampling rng stream is unchanged when jitter is off.
                # image_hw masks the contrast mean/blend to each sample's
                # true extent (fixed-canvas zero padding stays zero).
                keys = jax.random.split(jax.random.fold_in(rng, 0x9d),
                                        images.shape[0])
                if image_hw is None:
                    images = jax.vmap(
                        lambda im, k: photometric_jitter(
                            im, k, bright, contrast))(images, keys)
                else:
                    images = jax.vmap(
                        lambda im, k, hw: photometric_jitter(
                            im, k, bright, contrast, valid_hw=hw)
                    )(images, keys, image_hw)
            batch = jax.vmap(
                lambda im: preprocess_image(im, new_shape, canvas, mean, std)
            )(images)
            sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                             (images.shape[0], 1))
            losses = model.apply(params, batch, sizes, gt_boxes, gt_classes,
                                 gt_valid, gt_masks, rng,
                                 gt_mask_meta=gt_mask_meta,
                                 method=MaskRCNN.losses)
            return sum(losses.values()), losses

        ema_decay = self.ema_decay

        def train_step(params, opt_state, ema_params, step, images,
                       gt_boxes, gt_classes, gt_valid, gt_masks,
                       gt_mask_meta, image_hw, rng, new_shape, canvas):
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, images, gt_boxes, gt_classes,
                                       gt_valid, gt_masks, gt_mask_meta,
                                       image_hw, rng, new_shape, canvas)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay:
                # TF-style warmup: early steps track the params closely so
                # the shadow never carries the random init for long
                d = jnp.minimum(ema_decay,
                                (1.0 + step) / (10.0 + step)).astype(
                    jnp.float32)
                ema_params = jax.tree.map(
                    lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)
                                  ).astype(e.dtype), ema_params, params)
            # step stays device-resident across calls (like params /
            # opt_state / ema): zero per-step host->device transfers
            return params, new_opt_state, ema_params, step + 1.0, total, \
                losses

        self._loss_fn = jax.jit(loss_fn,
                                static_argnames=("new_shape", "canvas"))
        self._train_step = jax.jit(
            train_step, static_argnames=("new_shape", "canvas"),
            donate_argnames=("params", "opt_state", "ema_params", "step"))
        self._step_dev = None  # device step counter, seeded in run_step

    # ------------------------------------------------------------ run loop

    def _device_batch(self, batch):
        keys = ["images", "gt_boxes", "gt_classes", "gt_valid", "gt_masks"]
        for opt in ("gt_mask_meta", "image_hw"):
            if opt in batch:
                keys.append(opt)
        arrays = {k: batch[k] for k in keys}
        if self.mesh is not None:
            arrays = shard_batch(arrays, self.mesh)
        return arrays

    def run_step(self, batch):
        self._rng, rng = jax.random.split(self._rng)
        arrays = self._device_batch(batch)
        if self._step_dev is None:  # first step / after resume
            self._step_dev = jnp.float32(self.iter)
        (self.params, self.opt_state, self.ema_params, self._step_dev,
         total, losses) = self._train_step(
            self.params, self.opt_state, self.ema_params, self._step_dev,
            arrays["images"],
            arrays["gt_boxes"], arrays["gt_classes"], arrays["gt_valid"],
            arrays["gt_masks"], arrays.get("gt_mask_meta"),
            arrays.get("image_hw"), rng,
            tuple(batch["new_shape"]), tuple(batch["canvas"]))
        return total, losses

    def _flush_pending(self, schedule_host):
        """Materialize queued device scalars into storage (one transfer).

        Loss scalars stay on device between flushes so the train loop
        never blocks on a host round-trip per step (the device queue keeps
        several steps in flight); one batched device_get every
        ``log_period`` iters fetches them all, and every fetched iteration
        gets its own metrics.json record (a crash loses at most one log
        period; NaNs surface at the next flush).
        """
        if not self._pending:
            return
        fetched = jax.device_get(self._pending)
        saved_iter = self.storage.iter
        for it_i, total, losses, dt in fetched:
            rec = {"total_loss": float(total)}
            for k, v in losses.items():
                rec[k] = float(v)
            rec["lr"] = schedule_host(int(it_i))
            rec["time"] = float(dt)
            self.storage.iter = int(it_i)
            for k, v in rec.items():
                self.storage.put_scalar(k, v)
            self.storage.write_record(it_i, rec)
        self.storage.iter = saved_iter
        self._pending = []

    def train(self, start_iter=None, max_iter=None):
        start = self.iter if start_iter is None else start_iter
        end = self.max_iter if max_iter is None else max_iter
        it = (self.device_batcher.infinite() if self.device_batcher
              else self.train_loader.infinite())
        t_last = time.time()
        schedule_host = build_lr_schedule(self.cfg, host=True)
        self._pending = []
        log_period = max(int(self.storage.log_period), 1)
        for self.iter in range(start, end):
            self.storage.iter = self.iter
            batch = next(it)
            total, losses = self.run_step(batch)
            now = time.time()
            self._pending.append((self.iter, total, losses, now - t_last))
            t_last = now
            next_iter = self.iter + 1
            if (next_iter % log_period == 0 or next_iter == end
                    or next_iter % self.cfg.SOLVER.CHECKPOINT_PERIOD == 0):
                self._flush_pending(schedule_host)
                self.storage.write()
            for h in self._hooks:
                h.after_step()
            if (next_iter % self.cfg.SOLVER.CHECKPOINT_PERIOD == 0
                    or next_iter == end):
                self.save(next_iter)
        self.iter = end
        for h in self._hooks:
            after_train = getattr(h, "after_train", None)
            if after_train is not None:
                after_train()
        return self

    def save(self, step=None):
        step = self.iter + 1 if step is None else step
        path = Path(self.cfg.OUTPUT_DIR) / f"ckpt_{step}"
        tree = {"params": jax.device_get(self.params),
                "opt_state": jax.device_get(self.opt_state),
                "step": step}
        if self.ema_params is not None:
            tree["ema_params"] = jax.device_get(self.ema_params)
        save_checkpoint(path, tree)
        return path

    # ----------------------------------------------- validation loss (hook)

    def eval_loss(self, batch):
        """Train-mode loss dict on a validation batch (LossEvalHook)."""
        self._rng, rng = jax.random.split(self._rng)
        keys = ["images", "gt_boxes", "gt_classes", "gt_valid", "gt_masks"]
        for opt in ("gt_mask_meta", "image_hw"):
            if opt in batch:
                keys.append(opt)
        arrays = {k: jnp.asarray(batch[k]) for k in keys}
        _, losses = self._loss_fn(
            self.params, arrays["images"], arrays["gt_boxes"],
            arrays["gt_classes"], arrays["gt_valid"], arrays["gt_masks"],
            arrays.get("gt_mask_meta"), arrays.get("image_hw"), rng,
            tuple(batch["new_shape"]), tuple(batch["canvas"]))
        losses = jax.device_get(losses)
        return {k: float(v) for k, v in losses.items()}
