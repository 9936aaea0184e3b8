"""Self-training pseudo-labels: predict unlabeled images, emit RLE GT.

The powder dataset ships 11 raw SEM tiles but only 4 carry particle
annotations (reference examples/powder/data/images_png vs
via_powder_particle_masks_training.json) — the remaining tiles are
unlabeled. This tool runs the best available predictor (optionally a
TTA + voting + checkpoint ensemble, the highest-precision inference
mode measured in docs/parity.md) over those images, keeps detections
above a score threshold, and writes them in the 'rle' annotation format
data_utils.get_ddicts already ingests (JSON list of per-image
segmentation sets, reference data_utils.py:482-525) — so a pseudo
dataset registers exactly like a labeled one and trains through the
standard loader via cfg.DATASETS.TRAIN concatenation.

Usage:
    python tools/pseudo_label.py --ckpt runs/t1_crop/train/ckpt_9000 \
        --images img1.png,img2.png --out pseudo/particles.json \
        --score-thresh 0.7 --tta --tta-scales 704,800,896 --vote 0.5 \
        [--ensemble other_ckpt] [--tta-rot]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from ampis_tpu.data_utils import compress_pred  # noqa: E402
from ampis_tpu.utils.io import imread_bgr  # noqa: E402
from ap_table import build_cfg  # noqa: E402


def build_predictor(args):
    from ampis_tpu.engine.predictor import DefaultPredictor

    def _cfg(ckpt):
        cfg = build_cfg(ckpt, args.detections)
        if args.maskness:
            # maskness rescoring reorders detections by mask confidence
            # (predictor.maskness_rescore) — measured +0.02 AP on the
            # powder models, so pseudo-label score thresholds cut on a
            # better-calibrated score.
            cfg.TEST.MASKNESS_RESCORE = args.maskness
        return cfg

    cfg = _cfg(args.ckpt)
    if args.tta:
        from ampis_tpu.engine.tta import TTAPredictor
        scales = (tuple(int(s) for s in args.tta_scales.split(","))
                  if args.tta_scales else None)
        extra = [DefaultPredictor(_cfg(c))
                 for c in args.ensemble.split(",")] if args.ensemble else []
        return TTAPredictor(cfg, min_sizes=scales, flip=True, vflip=True,
                            rot90=args.tta_rot, vote_iou=args.vote,
                            extra_predictors=extra)
    return DefaultPredictor(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--images", required=True,
                    help="comma-separated image paths, or a directory "
                         "(every .png/.jpg/.tif inside)")
    ap.add_argument("--exclude", default="",
                    help="comma-separated substrings; any image whose "
                         "name contains one is skipped (keep validation "
                         "images out of the pseudo set)")
    ap.add_argument("--out", required=True,
                    help="output JSON (get_ddicts 'rle' format)")
    ap.add_argument("--score-thresh", type=float, default=0.7)
    ap.add_argument("--detections", type=int, default=400)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--tta-scales", default=None)
    ap.add_argument("--tta-rot", action="store_true")
    ap.add_argument("--vote", type=float, default=0.0)
    ap.add_argument("--ensemble", default=None)
    ap.add_argument("--maskness", type=float, default=0.0,
                    help="TEST.MASKNESS_RESCORE alpha for every ensemble "
                         "member (mask-confidence score recalibration)")
    args = ap.parse_args()

    p = Path(args.images)
    if p.is_dir():
        paths = sorted(q for ext in ("*.png", "*.jpg", "*.tif")
                       for q in p.glob(ext))
    else:
        paths = [Path(s) for s in args.images.split(",")]
    excludes = [s for s in args.exclude.split(",") if s]
    paths = [q for q in paths
             if not any(e in q.name for e in excludes)]

    predictor = build_predictor(args)
    entries = []
    for img_path in paths:
        inst = predictor(imread_bgr(str(img_path)))["instances"]
        compress_pred(inst)
        scores = np.asarray(inst.scores)
        keep = np.nonzero(scores >= args.score_thresh)[0]
        print(f"{img_path.name}: {len(keep)}/{len(scores)} detections "
              f">= {args.score_thresh}", flush=True)
        if not len(keep):
            continue
        segs = []
        for i in keep:
            r = inst.pred_masks[int(i)]
            segs.append({"size": [int(r["size"][0]), int(r["size"][1])],
                         "counts": r["counts"].decode("ascii")})
        entries.append({"file_name": str(img_path.resolve()),
                        "segmentations": segs})

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(entries))
    print(f"wrote {out}: {len(entries)} images, "
          f"{sum(len(e['segmentations']) for e in entries)} instances")


if __name__ == "__main__":
    main()
