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

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATASETS.TRAIN = ("e2e_train",)
    cfg.DATASETS.TEST = ("e2e_val",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = tmp + "/out"

    from ampis_tpu.data_utils import AmpisTrainer, format_outputs
    trainer = AmpisTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()

    latest = trainer.storage.latest()
    assert "validation_loss" in latest, "LossEvalHook must fire at final iter"
    assert np.isfinite(latest["total_loss"]), latest
    assert np.isfinite(latest["validation_loss"]), latest
    print("TRAIN_OK", {k: round(v, 3) for k, v in latest.items()
                       if k.startswith(("total", "validation"))})

    from ampis_tpu.engine.checkpoint import latest_checkpoint
    from ampis_tpu.engine.predictor import DefaultPredictor
    ck = latest_checkpoint(cfg.OUTPUT_DIR)
    assert ck is not None
    cfg2 = cfg.clone()
    cfg2.MODEL.WEIGHTS = str(ck)
    pred = DefaultPredictor(cfg2)
    img = np.asarray(Image.open(ddicts[0]["file_name"]))
    out = pred(np.stack([img] * 3, axis=-1)[:, :, ::-1])
    inst = out["instances"]
    assert inst.image_size == (96, 128)
    res = format_outputs(ddicts[0]["file_name"], "e2e_Train", out)
    masks = res["pred"]["instances"].pred_masks
    assert isinstance(masks, list)
    if masks:
        assert isinstance(masks[0], dict) and "counts" in masks[0]
    print("PREDICT_OK", len(inst))
    print("E2E_OK")


if __name__ == "__main__":
    main()
