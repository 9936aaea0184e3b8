"""End-to-end train -> checkpoint -> predict -> compress exercise.

Run as a subprocess by tests/test_engine_e2e.py with a clean single-device
CPU backend (the axon TPU tunnel and virtual-device flags interact badly
with large single-device programs on this host; see tests/conftest.py).
Prints E2E_OK plus checks on success.
"""
import os
import sys
import tempfile

os.environ.pop("XLA_FLAGS", None)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402

from ampis_tpu import rle as RLE  # noqa: E402
from ampis_tpu.structures import BoxMode  # noqa: E402
from ampis_tpu.engine import DatasetCatalog, get_cfg  # noqa: E402


def make_dataset(tmp):
    ddicts = []
    rs = np.random.RandomState(0)
    for i in range(4):
        img = (rs.rand(96, 128) * 80).astype(np.uint8)
        p = f"{tmp}/im{i}.png"
        annos = []
        for _ in range(3):
            r0, c0 = rs.randint(5, 60), rs.randint(5, 90)
            rh, cw = rs.randint(12, 30), rs.randint(12, 30)
            img[r0:r0 + rh, c0:c0 + cw] = 255
            m = np.zeros((96, 128), np.uint8, order="F")
            m[r0:r0 + rh, c0:c0 + cw] = 1
            annos.append({"bbox": np.array([c0, r0, c0 + cw, r0 + rh],
                                           np.float64),
                          "bbox_mode": BoxMode.XYXY_ABS,
                          "segmentation": RLE.encode(np.asfortranarray(m)),
                          "category_id": 0})
        Image.fromarray(img).save(p)
        ddicts.append({"file_name": p, "height": 96, "width": 128,
                       "mask_format": "bitmask", "image_id": i,
                       "annotations": annos, "num_instances": 3})
    return ddicts


def main():
    tmp = tempfile.mkdtemp()
    ddicts = make_dataset(tmp)
    DatasetCatalog.register("e2e_train", lambda: ddicts)
    DatasetCatalog.register("e2e_val", lambda: ddicts[:1])

    n_iter = 24

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATASETS.TRAIN = ("e2e_train",)
    cfg.DATASETS.TEST = ("e2e_val",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = n_iter
    cfg.SOLVER.CHECKPOINT_PERIOD = n_iter
    cfg.SOLVER.BASE_LR = 5e-3
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.MODEL.BACKBONE.FREEZE_AT = 0  # training from scratch
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # From-scratch conditioning: with FrozenBN (identity at random init)
    # and caffe-style PIXEL_STD=1, activations carry the raw ~100-scale
    # input variance through the whole backbone — init losses land at
    # ~120 and lr 5e-3 diverges to NaN within 4 iters. Standardizing the
    # input restores textbook init losses (~0.7-0.9 per component). The
    # reference never hits this because its recipe always starts from
    # COCO weights whose BN statistics normalize each stage.
    cfg.MODEL.PIXEL_STD = [60.0, 60.0, 60.0]
    cfg.SOLVER.EMA_DECAY = 0.999  # exercise the EMA shadow-weights path
    cfg.OUTPUT_DIR = tmp + "/out"

    from ampis_tpu.data_utils import AmpisTrainer, format_outputs
    trainer = AmpisTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()

    # the device-resident sample cache is the default single-device path
    assert trainer.device_batcher is not None
    assert 0 < trainer.device_batcher.n_cached <= 4 * 1 * 2  # img x ms x flip

    latest = trainer.storage.latest()
    assert "validation_loss" in latest, "LossEvalHook must fire at final iter"
    assert np.isfinite(latest["total_loss"]), latest
    assert np.isfinite(latest["validation_loss"]), latest

    # (a) the loss actually goes down over the short run
    hist = [v for _, v in trainer.storage.history("total_loss")]
    assert len(hist) == n_iter, f"expected {n_iter} scalar records: {len(hist)}"
    head, tail = np.mean(hist[:6]), np.mean(hist[-6:])
    assert tail < head, f"loss did not decrease: head={head:.3f} tail={tail:.3f}"
    print("TRAIN_OK", {"head_loss": round(float(head), 3),
                       "tail_loss": round(float(tail), 3),
                       "validation_loss": round(latest["validation_loss"], 3)})

    # (c) checkpoint-resume restores step and parameters exactly
    import jax as _jax
    from ampis_tpu.engine.checkpoint import latest_checkpoint
    ck = latest_checkpoint(cfg.OUTPUT_DIR)
    assert ck is not None
    resumed = AmpisTrainer(cfg).resume_or_load(resume=True)
    assert resumed.iter == n_iter, resumed.iter
    for a, b in zip(_jax.tree.leaves(trainer.params),
                    _jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA shadow: saved with the checkpoint, restored exactly, and a real
    # average (differs from the raw final iterate after a warmed-up run)
    assert trainer.ema_params is not None and resumed.ema_params is not None
    ema_diff = False
    for a, b, p in zip(_jax.tree.leaves(trainer.ema_params),
                       _jax.tree.leaves(resumed.ema_params),
                       _jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ema_diff |= not np.array_equal(np.asarray(a), np.asarray(p))
    assert ema_diff, "EMA shadow identical to raw params"
    batch = next(resumed.train_loader.infinite())
    total, _ = resumed.run_step(batch)
    assert np.isfinite(float(total))
    print("RESUME_OK", resumed.iter)

    # (b) predictions round-trip the shipped-pickle schema into scoring
    import pickle

    from ampis_tpu import analyze
    from ampis_tpu.engine.predictor import DefaultPredictor
    from ampis_tpu.structures import InstanceSet
    # inference weights of record are the EMA shadow, not the raw iterate
    from ampis_tpu.engine.checkpoint import load_weights
    loaded = load_weights(str(ck))
    np.testing.assert_array_equal(
        np.asarray(_jax.tree.leaves(loaded["params"])[0]),
        np.asarray(_jax.tree.leaves(trainer.ema_params["params"])[0]))
    cfg2 = cfg.clone()
    cfg2.MODEL.WEIGHTS = str(ck)
    pred = DefaultPredictor(cfg2)
    img = np.asarray(Image.open(ddicts[0]["file_name"]))
    out = pred(np.stack([img] * 3, axis=-1)[:, :, ::-1])
    inst = out["instances"]
    assert inst.image_size == (96, 128)
    res = format_outputs(ddicts[0]["file_name"], "e2e_Train", out)

    # exact shipped-pickle schema (SURVEY.md §4: {'file_name','dataset',
    # 'pred': {'instances': Instances(pred_boxes f4, scores f4,
    # pred_classes i8, pred_masks RLE list)}})
    assert set(res) == {"file_name", "dataset", "pred"}
    rt = pickle.loads(pickle.dumps(res))  # survives pickling like the samples
    ri = rt["pred"]["instances"]
    assert ri.pred_boxes.dtype == np.float32
    assert ri.scores.dtype == np.float32
    assert ri.pred_classes.dtype == np.int64
    assert isinstance(ri.pred_masks, list)
    if ri.pred_masks:
        m0 = ri.pred_masks[0]
        assert isinstance(m0, dict) and {"size", "counts"} <= set(m0)
        assert m0["size"] == [96, 128]

    iset_pred = InstanceSet().read_from_model_out(rt, inplace=False)
    iset_gt = InstanceSet().read_from_ddict(ddicts[0], inplace=False)
    scores = analyze.det_seg_scores(iset_gt, iset_pred, size=(96, 128))
    assert {"det_precision", "det_recall", "seg_precision",
            "seg_recall"} <= set(scores)
    print("PREDICT_OK", len(inst))
    print("E2E_OK")


if __name__ == "__main__":
    main()
