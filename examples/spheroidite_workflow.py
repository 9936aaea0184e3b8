"""Spheroidite example: binary-annotation workflow (BASELINE config 2).

Mirrors the reference's spheroidite example: load binary mask annotations
via connected components, visualize, load (or produce) predictions, and
score them against ground truth.

Usage:
    python examples/spheroidite_workflow.py \
        --data /root/reference/examples/spheroidite/data \
        [--weights /path/to/ckpt] [--outdir ./spheroidite_out]
"""
import argparse
import sys
from pathlib import Path

import matplotlib
matplotlib.use("Agg")
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ampis_tpu import analyze, data_utils, structures, visualize  # noqa: E402
from ampis_tpu.compat import load_pickle  # noqa: E402
from ampis_tpu.engine import DatasetCatalog, MetadataCatalog, get_cfg  # noqa: E402
from ampis_tpu.evaluation import evaluate_mask_ap  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data",
                    default="/root/reference/examples/spheroidite/data")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--outdir", default="./spheroidite_out")
    args = ap.parse_args()
    data_root = Path(args.data)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    for split, pattern in (("Training", "train_*"), ("Validation",
                                                     "valid_*")):
        name = f"spheroidite_{split}"
        DatasetCatalog.register(
            name, lambda p=pattern, s=split: data_utils.get_ddicts(
                "binary", data_root / "images", data_root / "annotations",
                pattern=p, dataset_class=s))
        MetadataCatalog.get(name).set(thing_classes=["spheroidite"])

    ddicts = DatasetCatalog.get("spheroidite_Validation")
    print(f"validation: {len(ddicts)} images, "
          f"{[d['num_instances'] for d in ddicts]} instances")
    visualize.display_ddicts(ddicts[0], outpath=outdir,
                             dataset="spheroidite_Validation", gt=True,
                             summary=True)

    # predictions: shipped sample results, or run the predictor
    if args.weights:
        cfg = get_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
        cfg.TEST.DETECTIONS_PER_IMAGE = 400
        cfg.MODEL.WEIGHTS = args.weights
        from ampis_tpu.engine.predictor import DefaultPredictor
        from ampis_tpu.utils.io import imread_bgr
        predictor = DefaultPredictor(cfg)
        results = [data_utils.format_outputs(
            d["file_name"], "spheroidite_Validation",
            predictor(imread_bgr(d["file_name"]))) for d in ddicts]
    else:
        results = load_pickle(data_root / "sample-spheroidite-results.pickle")

    pred_sets = [structures.InstanceSet().read_from_model_out(o,
                                                              inplace=False)
                 for o in results]
    gt_sets = [structures.InstanceSet().read_from_ddict(d, inplace=False)
               for d in ddicts]
    gt_m, pred_m = analyze.align_instance_sets(gt_sets, pred_sets)
    for gt, pr in zip(gt_m, pred_m):
        s = analyze.det_seg_scores(gt, pr, size=gt.instances.image_size)
        print(f"{Path(gt.filepath).name}: det P={s['det_precision']:.3f} "
              f"R={s['det_recall']:.3f}")
    if gt_m:
        ap_out = evaluate_mask_ap(gt_m, pred_m)
        print("mask AP:", {k: round(v, 3) for k, v in ap_out.items()
                           if k != "per_iou"})
    print("SPHEROIDITE_WORKFLOW_OK")


if __name__ == "__main__":
    main()
