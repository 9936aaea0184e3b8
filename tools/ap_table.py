"""Mask-AP table for one checkpoint across inference modes.

Runs a trained checkpoint over a dataset's validation split in one or
more inference configurations (bf16, int8 mask head, int8 backbone/neck,
mask-stage compaction, TTA) and prints one AP row per mode — the
measurement harness behind docs/parity.md's int8 and recipe tables.

Usage:
    python tools/ap_table.py --ckpt runs/x/train/ckpt_9000 \
        --dataset powder_particle [--modes bf16,int8] [--tta] \
        [--mask-cap 288]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ampis_tpu import analyze, data_utils, structures  # noqa: E402
from ampis_tpu.engine import DatasetCatalog, MetadataCatalog, get_cfg  # noqa: E402
from ampis_tpu.evaluation import evaluate_mask_ap  # noqa: E402

DATA = Path("/root/reference/examples")

DATASETS = {
    "powder_particle": ("via2", DATA / "powder/data/via_2.0.8/"
                        "via_powder_particle_masks_validation.json", {}),
    "powder_satellite": ("via2", DATA / "powder/data/via_2.0.8/"
                         "via_powder_satellite_masks_validation.json", {}),
    "spheroidite": ("binary", DATA / "spheroidite/data/images",
                    {"ann_root": DATA / "spheroidite/data/annotations",
                     "pattern": "valid_*"}),
}


def register(name):
    fmt, path, kw = DATASETS[name]
    reg = f"ap_table_{name}"
    if reg not in DatasetCatalog.list():
        DatasetCatalog.register(
            reg, lambda: data_utils.get_ddicts(fmt, path, **kw))
        MetadataCatalog.get(reg).set(thing_classes=[name])
    return reg


def build_cfg(ckpt, detections):
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = detections
    cfg.MODEL.WEIGHTS = str(ckpt)
    saved_path = Path(ckpt).parent / "config.json"
    if saved_path.is_file():
        saved = json.loads(saved_path.read_text())
        cfg.MODEL.PIXEL_MEAN = saved["MODEL"]["PIXEL_MEAN"]
        cfg.MODEL.PIXEL_STD = saved["MODEL"]["PIXEL_STD"]
        cfg.MODEL.RESNETS.NORM = saved["MODEL"]["RESNETS"].get(
            "NORM", "FrozenBN")
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = \
            saved["MODEL"]["ANCHOR_GENERATOR"]["SIZES"]
        cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = \
            saved["MODEL"]["ROI_MASK_HEAD"].get("POOLER_RESOLUTION", 14)
        cfg.INPUT.MIN_SIZE_TEST = saved["INPUT"]["MIN_SIZE_TEST"]
        cfg.INPUT.MAX_SIZE_TEST = saved["INPUT"]["MAX_SIZE_TEST"]
    return cfg


def evaluate(cfg, reg_name, tta=False, tta_scales=None, vote_iou=0.0,
             extra_cfgs=(), score_mode="max", rot90=False, tiled=0,
             tile_overlap=128):
    from ampis_tpu.utils.io import imread_bgr
    if tta:
        from ampis_tpu.engine.predictor import DefaultPredictor
        from ampis_tpu.engine.tta import TTAPredictor
        predictor = TTAPredictor(cfg, min_sizes=tta_scales, flip=True,
                                 vflip=True, rot90=rot90,
                                 vote_iou=vote_iou,
                                 score_mode=score_mode,
                                 extra_predictors=[DefaultPredictor(c)
                                                   for c in extra_cfgs])
    elif tiled:
        from ampis_tpu.engine.tta import TiledPredictor
        predictor = TiledPredictor(cfg, tile=tiled,
                                   overlap=tile_overlap,
                                   vote_iou=vote_iou)
    else:
        from ampis_tpu.engine.predictor import DefaultPredictor
        predictor = DefaultPredictor(cfg)
    ddicts = DatasetCatalog.get(reg_name)
    preds, gt_sets = [], []
    t0 = time.time()
    for d in ddicts:
        out = predictor(imread_bgr(d["file_name"]))
        preds.append(structures.InstanceSet().read_from_model_out(
            data_utils.format_outputs(d["file_name"], reg_name, out),
            inplace=False))
        gt_sets.append(structures.InstanceSet().read_from_ddict(
            d, inplace=False))
    dt = time.time() - t0
    ap = evaluate_mask_ap(gt_sets, preds)
    det = [analyze.det_seg_scores(g, p, size=g.instances.image_size)
           for g, p in zip(gt_sets, preds)]
    return {
        "AP": round(ap["AP"], 3), "AP50": round(ap["AP50"], 3),
        "AP75": round(ap["AP75"], 3), "AR": round(ap["AR"], 3),
        "det_P": round(float(np.mean([s["det_precision"] for s in det])), 3),
        "det_R": round(float(np.mean([s["det_recall"] for s in det])), 3),
        "seg_P": round(float(np.mean(
            [np.median(s["seg_precision"]) for s in det])), 3),
        "seg_R": round(float(np.mean(
            [np.median(s["seg_recall"]) for s in det])), 3),
        "sec": round(dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="powder_particle",
                    choices=sorted(DATASETS))
    ap.add_argument("--modes", default="bf16",
                    help="comma list of: bf16, int8 (mask head), "
                         "int8bb (backbone+neck+mask head; FrozenBN only)")
    ap.add_argument("--detections", type=int, default=None)
    ap.add_argument("--mask-cap", type=int, default=0,
                    help="cfg.TPU.MASK_CAPACITY_PER_IMAGE for every mode")
    ap.add_argument("--tta", action="store_true",
                    help="add a TTA row (flips + --tta-scales) per mode")
    ap.add_argument("--tta-scales", default=None)
    ap.add_argument("--tta-rot", action="store_true",
                    help="add 90-degree-rotated TTA views (full D4 "
                         "symmetry group; 2x the views)")
    ap.add_argument("--vote", type=float, default=0.0,
                    help="TTA box+mask voting IoU (engine.tta.vote_merge); "
                         "0 = keep the top view's geometry (plain NMS)")
    ap.add_argument("--tta-only", action="store_true",
                    help="skip the base (non-TTA) row per mode — saves a "
                         "full-split pass when the base number is already "
                         "recorded")
    ap.add_argument("--wbf", action="store_true",
                    help="TTA score_mode='wbf': cluster-mean score scaled "
                         "by view-confirmation (requires --vote > 0)")
    ap.add_argument("--ensemble", default=None,
                    help="comma list of extra checkpoints whose TTA views "
                         "join the same merge (checkpoint ensemble; "
                         "requires --tta)")
    ap.add_argument("--min-size-test", type=int, default=0,
                    help="override cfg.INPUT.MIN_SIZE_TEST (e.g. 1024 = "
                         "native resolution for the 1536x1024 powder "
                         "images; crop-trained models see native-scale "
                         "objects in training)")
    ap.add_argument("--max-size-test", type=int, default=0,
                    help="raise cfg.INPUT.MAX_SIZE_TEST (upscale TTA "
                         "scales above the native shortest edge are "
                         "otherwise clipped by the saved max size)")
    ap.add_argument("--maskness", type=float, default=0.0,
                    help="cfg.TEST.MASKNESS_RESCORE alpha: score *= "
                         "maskness**alpha (SOLOv2-style mask-confidence "
                         "recalibration; try 0.5 or 1.0)")
    ap.add_argument("--pixel-stats", default=None,
                    help="'MEAN,STD' override for checkpoints that predate "
                         "the saved train config.json (applied to all 3 "
                         "channels)")
    ap.add_argument("--mask-res", type=int, default=0,
                    help="override the mask-head output resolution (28 or "
                         "56; pooler res is half). Every mask-head param "
                         "(3x3 convs, 2x2 deconv, 1x1 predictor) is "
                         "resolution-independent, so any checkpoint loads "
                         "unchanged — this measures the inference-time "
                         "quality of the high-res mask mode on a model "
                         "trained at 28. bf16 mode only: static-int8 "
                         "activation scales were calibrated at 28 res")
    ap.add_argument("--tiled", type=int, default=0,
                    help="tile size for TiledPredictor (engine.tta): "
                         "overlapping native-resolution tiles merged in "
                         "original coordinates — the tiny-object "
                         "resolution-regime lever (e.g. 512 for the "
                         "satellite model, matching its training crops). "
                         "Combines with --vote for cross-tile voting in "
                         "the overlap bands; mutually exclusive with "
                         "--tta")
    ap.add_argument("--tile-overlap", type=int, default=128,
                    help="tile overlap in px (objects larger than this "
                         "can be clipped in every tile)")
    args = ap.parse_args()
    if args.tiled and args.tta:
        ap.error("--tiled and --tta are mutually exclusive")

    reg = register(args.dataset)
    detections = args.detections or (
        150 if args.dataset == "powder_satellite" else 400)
    scales = (tuple(int(s) for s in args.tta_scales.split(","))
              if args.tta_scales else None)

    rows = {}
    # Non-default eval knobs must be visible in the row key, or sweep logs
    # collected by tools/collect_evals.py become ambiguous except by
    # filename (round-3 advisor finding).
    knobs = ""
    if args.maskness:
        knobs += f"+mn{args.maskness:g}"
    if args.min_size_test:
        knobs += f"+sz{args.min_size_test}"
    if args.pixel_stats:
        knobs += f"+ps{args.pixel_stats}"
    if args.mask_res:
        knobs += f"+mr{args.mask_res}"
    for mode in args.modes.split(","):
        cfg = build_cfg(args.ckpt, detections)
        if args.pixel_stats:
            mean, std = (float(v) for v in args.pixel_stats.split(","))
            cfg.MODEL.PIXEL_MEAN = [mean] * 3
            cfg.MODEL.PIXEL_STD = [std] * 3
        if args.mask_cap:
            cfg.TPU.MASK_CAPACITY_PER_IMAGE = args.mask_cap
        if args.mask_res:
            cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = args.mask_res // 2
        if args.maskness:
            cfg.TEST.MASKNESS_RESCORE = args.maskness
        if args.min_size_test:
            cfg.INPUT.MAX_SIZE_TEST = int(round(
                cfg.INPUT.MAX_SIZE_TEST
                * args.min_size_test / cfg.INPUT.MIN_SIZE_TEST))
            cfg.INPUT.MIN_SIZE_TEST = args.min_size_test
        if args.max_size_test:
            cfg.INPUT.MAX_SIZE_TEST = args.max_size_test
        if mode in ("int8", "int8bb"):
            cfg.TPU.INT8_MASK_HEAD = "static"
        if mode == "int8bb":
            cfg.TPU.INT8_BACKBONE = "static"
            cfg.TPU.INT8_NECK = "static"
        if not args.tta_only:
            base_key = mode + knobs
            if args.tiled:
                base_key += (f"+tiled{args.tiled}"
                             + (f"+vote{args.vote}" if args.vote else ""))
            rows[base_key] = evaluate(cfg, reg, tiled=args.tiled,
                                      tile_overlap=args.tile_overlap,
                                      vote_iou=(args.vote if args.tiled
                                                else 0.0))
            print(f"{args.dataset} [{base_key}] {rows[base_key]}",
                  flush=True)
        if args.tta:
            key = (mode + knobs + "+tta"
                   + (f"+vote{args.vote}" if args.vote else ""))
            if args.tta_rot:
                key += "+rot"
            if args.wbf:
                key += "+wbf"
            extra = []
            if args.ensemble:
                extra = [build_cfg(c, detections)
                         for c in args.ensemble.split(",")]
                for c in extra:
                    c.TEST.MASKNESS_RESCORE = args.maskness
                key += f"+ens{len(extra)}"
            rows[key] = evaluate(cfg, reg, tta=True, tta_scales=scales,
                                 vote_iou=args.vote, extra_cfgs=extra,
                                 score_mode="wbf" if args.wbf else "max",
                                 rot90=args.tta_rot)
            print(f"{args.dataset} [{key}] {rows[key]}", flush=True)
    print(json.dumps({"ckpt": args.ckpt, "dataset": args.dataset,
                      "mask_cap": args.mask_cap, "rows": rows}))


if __name__ == "__main__":
    main()
