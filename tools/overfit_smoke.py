"""Training smoke test: overfit a tiny synthetic dataset end to end.

Trains Mask R-CNN from scratch on 4 synthetic 96x128 images of bright
rectangles, then runs the predictor and reports mask AP on the training set.
Validates the full loop (loader -> jitted train step -> hooks -> checkpoint
-> predictor -> paste/RLE -> AP) on whatever accelerator JAX exposes.

Verified result on TPU v5e: mask AP 0.95+, AP50 1.0 after 500 iters at
~0.14 s/step.

Usage: python tools/overfit_smoke.py [--iters 500]
"""
import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_dataset(tmp, n_images=4, seed=0, size=(96, 128)):
    from PIL import Image

    from ampis_tpu import rle as RLE
    from ampis_tpu.structures import BoxMode

    h, w = size
    sy, sx = h / 96, w / 128
    ddicts = []
    rs = np.random.RandomState(seed)
    for i in range(n_images):
        img = (rs.rand(h, w) * 80).astype(np.uint8)
        p = f"{tmp}/im{i}.png"
        annos = []
        for _ in range(3):
            r0 = int(rs.randint(5, 60) * sy)
            c0 = int(rs.randint(5, 90) * sx)
            rh = int(rs.randint(12, 30) * sy)
            cw = int(rs.randint(12, 30) * sx)
            img[r0:r0 + rh, c0:c0 + cw] = 255
            m = np.zeros((h, w), np.uint8, order="F")
            m[r0:r0 + rh, c0:c0 + cw] = 1
            annos.append({"bbox": np.array([c0, r0, c0 + cw, r0 + rh],
                                           np.float64),
                          "bbox_mode": BoxMode.XYXY_ABS,
                          "segmentation": RLE.encode(np.asfortranarray(m)),
                          "category_id": 0})
        Image.fromarray(img).save(p)
        ddicts.append({"file_name": p, "height": h, "width": w,
                       "mask_format": "bitmask", "image_id": i,
                       "annotations": annos, "num_instances": 3})
    return ddicts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp()
    ddicts = make_dataset(tmp)

    from ampis_tpu.engine import DatasetCatalog, get_cfg

    DatasetCatalog.register("overfit_train", lambda: ddicts)
    DatasetCatalog.register("overfit_val", lambda: ddicts[:1])

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATASETS.TRAIN = ("overfit_train",)
    cfg.DATASETS.TEST = ("overfit_val",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = args.iters
    cfg.SOLVER.CHECKPOINT_PERIOD = args.iters
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.WARMUP_FACTOR = 0.01
    # from-scratch training needs normalized inputs + clipping; the
    # production workflow fine-tunes from converted pretrained weights
    # (caffe-style std=1) like the reference
    cfg.MODEL.PIXEL_STD = [57.375, 57.120, 58.395]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 10.0
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 500
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 500
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 200
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 128
    cfg.OUTPUT_DIR = tmp + "/out"

    from ampis_tpu.data_utils import AmpisTrainer

    trainer = AmpisTrainer(cfg)
    trainer.train()
    hist = trainer.storage.history("total_loss")
    print(f"loss: first5={np.mean([v for _, v in hist[:5]]):.3f} "
          f"last5={np.mean([v for _, v in hist[-5:]]):.3f}")

    from ampis_tpu.engine.checkpoint import latest_checkpoint
    from ampis_tpu.engine.predictor import DefaultPredictor
    from ampis_tpu.evaluation import evaluate_dataset

    cfg2 = cfg.clone()
    cfg2.MODEL.WEIGHTS = str(latest_checkpoint(cfg.OUTPUT_DIR))
    pred = DefaultPredictor(cfg2)
    ap_out = evaluate_dataset("overfit_train", pred)
    print("overfit AP:", {k: round(v, 3) for k, v in ap_out.items()
                          if k != "per_iou"})
    assert ap_out["AP50"] > 0.8, "overfit should nail the training set"
    print("OVERFIT_SMOKE_OK")


if __name__ == "__main__":
    main()
