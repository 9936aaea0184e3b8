"""Data-parallel sharding over the virtual 8-device CPU mesh.

The framework's entire parallelism story (SURVEY.md §5): a 1-D 'data'
mesh, batch sharded along axis 0, parameters replicated, XLA-emitted
gradient all-reduce. These tests assert (a) the sharded train step
produces the same loss and gradients as the unsharded one, and (b)
sharded batched inference matches per-device inference — on 8 virtual
CPU devices (conftest sets xla_force_host_platform_device_count=8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params
from ampis_tpu.parallel.mesh import (batch_sharding, data_parallel_mesh,
                                     replicate, shard_batch)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    # full train-step grad compiles on the 8-device mesh: minutes cold,
    # seconds with the persistent compile cache (conftest)
    pytest.mark.slow,
]


def _tiny_model():
    return MaskRCNN(
        num_classes=1, dtype=jnp.float32,
        pre_nms_topk_train=64, post_nms_topk_train=32,
        pre_nms_topk_test=64, post_nms_topk_test=32,
        detections_per_image=8, roi_batch_per_image=16,
        mask_rois_per_image=4, roi_chunk=32)


def _batch(b=8, h=64, w=64, g=4):
    rng = np.random.RandomState(0)
    images = rng.rand(b, h, w, 3).astype(np.float32)
    sizes = np.tile([[h, w]], (b, 1)).astype(np.float32)
    gt_boxes = np.tile([[8, 8, 40, 40], [20, 20, 60, 50], [0] * 4,
                        [0] * 4], (b, 1, 1)).astype(np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_valid = np.tile([True, True, False, False], (b, 1))
    masks = np.zeros((b, g, h, w), np.uint8)
    masks[:, 0, 8:40, 8:40] = 1
    masks[:, 1, 20:50, 20:60] = 1
    return {"images": images, "sizes": sizes, "gt_boxes": gt_boxes,
            "gt_classes": gt_classes, "gt_valid": gt_valid,
            "gt_masks": masks}


def test_dp_train_step_matches_single_device():
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))
    tx = optax.sgd(0.001, momentum=0.9)
    batch = _batch()
    key = jax.random.PRNGKey(1)

    def loss_fn(p, arrs):
        losses = model.apply(p, arrs["images"], arrs["sizes"],
                             arrs["gt_boxes"], arrs["gt_classes"],
                             arrs["gt_valid"], arrs["gt_masks"], key,
                             method=MaskRCNN.losses)
        return sum(losses.values())

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # single device
    arrs1 = {k: jnp.asarray(v) for k, v in batch.items()}
    loss1, grads1 = grad_fn(params, arrs1)

    # 8-way data parallel
    mesh = data_parallel_mesh(8)
    params_r = replicate(params, mesh)
    arrs8 = shard_batch(batch, mesh)
    with mesh:
        loss8, grads8 = grad_fn(params_r, arrs8)

    assert np.allclose(float(loss1), float(loss8), rtol=1e-5)
    flat1 = jax.tree.leaves(grads1)
    flat8 = jax.tree.leaves(grads8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_dp_inference_matches_per_shard():
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))
    batch = _batch()
    images = jnp.asarray(batch["images"])
    sizes = jnp.asarray(batch["sizes"])

    fn = jax.jit(lambda p, im, sz: model.apply(
        p, im, sz, method=MaskRCNN.inference))
    ref = fn(params, images, sizes)

    mesh = data_parallel_mesh(8)
    sh = batch_sharding(mesh)
    with mesh:
        out = fn(replicate(params, mesh),
                 jax.device_put(images, sh), jax.device_put(sizes, sh))
    for k in ("boxes", "scores", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_trainer_uses_mesh_for_divisible_batch(tmp_path):
    """Trainer auto-enables the data mesh when batch % n_devices == 0."""
    from ampis_tpu.engine import DatasetCatalog, get_cfg
    from ampis_tpu.engine.trainer import Trainer
    from tools.overfit_smoke import make_dataset

    ddicts = make_dataset(str(tmp_path), n_images=8)
    name = f"dp_train_{tmp_path.name}"
    DatasetCatalog.register(name, lambda: ddicts)
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TPU.DEVICE_DATA_CACHE_MB = 512  # exercise the mesh cache path
    trainer = Trainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.size == 8
    assert trainer.device_batcher is not None  # VERDICT r5 #6
    assert trainer.device_batcher.mesh is trainer.mesh
    trainer.train()
    hist = trainer.storage.history("total_loss")
    assert len(hist) == 2 and all(np.isfinite(v) for _, v in hist)
    assert trainer.device_batcher.n_cached > 0


def test_trainer_mesh_production_shape_step(tmp_path):
    """One multi-device train step at the production input shape
    (800x1216 canvas — the powder 1536x1024 -> MIN_SIZE 800 resize),
    VERDICT r5 #6: the tiny-shape dryrun proves the program wiring; this
    pins correctness at the shapes the flagship recipe actually runs."""
    from ampis_tpu.engine import DatasetCatalog, get_cfg
    from ampis_tpu.engine.trainer import Trainer
    from tools.overfit_smoke import make_dataset

    ddicts = make_dataset(str(tmp_path), n_images=8, size=(1024, 1536))
    name = f"dp_prod_{tmp_path.name}"
    DatasetCatalog.register(name, lambda: ddicts)
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (800,)
    cfg.INPUT.MAX_SIZE_TRAIN = 1216
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TPU.DEVICE_DATA_CACHE_MB = 2048
    trainer = Trainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.size == 8
    images_key = "images"
    trainer.train()
    hist = trainer.storage.history("total_loss")
    assert len(hist) == 1 and np.isfinite(hist[0][1])
    # the cached batch really is sharded over the mesh
    batch = next(trainer.device_batcher.infinite())
    sh = batch[images_key].sharding
    assert sh.spec == P("data")
    # contract: the device cache holds RAW canvases (resize/normalize
    # runs in-graph — engine/trainer.py module docstring,
    # docs/performance.md "No full-resolution masks on device"), so the
    # batch carries the 1024x1536 input canvas and the in-graph resize
    # target (1536 * 800/1024 = 1200; the /32 canvas pad to 1216 also
    # happens in-graph) separately
    assert batch[images_key].shape[1:3] == (1024, 1536)
    assert tuple(batch["new_shape"]) == (800, 1200)
    # steady state: the cache fills monotonically up to the loader's
    # variant count (8 images x 2 flip codes = 16 here), then further
    # draws issue zero new uploads. Materialize every variant
    # deterministically rather than waiting on random draws to cover
    # the set, then verify an epoch of draws adds nothing.
    batcher = trainer.device_batcher
    loader = batcher.loader
    n_var = loader.n_variants()
    for idx in range(len(loader.ddicts)):
        for code in range(n_var // len(loader.ddicts) // len(loader.min_sizes)):
            for ms in loader.min_sizes:
                batcher._get(idx, ms, code)
    assert batcher.n_cached == n_var == 16
    for _ in range(4):
        next(batcher.infinite())
    assert batcher.n_cached == n_var  # zero steady-state uploads
