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
    ap.add_argument("--train", action="store_true",
                    help="fine-tune on the training split before predicting")
    ap.add_argument("--resume", action="store_true",
                    help="with --train: resume from the latest checkpoint "
                         "in the output dir instead of starting fresh")
    ap.add_argument("--max-iter", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=2.5e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--standardize", default="auto",
                    choices=("auto", "on", "off"),
                    help="PIXEL_MEAN/PIXEL_STD from the training images "
                         "(auto = on for from-scratch training; see "
                         "examples/powder_workflow.py --standardize)")
    ap.add_argument("--flip", default=None,
                    choices=("horizontal", "vertical", "both", "none"),
                    help="training flip augmentation (cfg.INPUT.RANDOM_FLIP)")
    ap.add_argument("--norm", default="auto",
                    choices=("auto", "GN", "FrozenBN"),
                    help="backbone norm; 'auto' = GN when training from "
                         "scratch (see examples/powder_workflow.py --norm)")
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="random brightness/contrast in [1-x, 1+x] "
                         "(in-graph, detectron2 transform semantics)")
    ap.add_argument("--rotate", default=None,
                    help="comma-separated rotation-augmentation angles in "
                         "degrees (cfg.INPUT.RANDOM_ROTATION; include 0; "
                         "see examples/powder_workflow.py --rotate)")
    ap.add_argument("--copy-paste", type=float, default=0.0,
                    help="instance copy-paste probability "
                         "(cfg.INPUT.COPY_PASTE; see powder workflow)")
    ap.add_argument("--copy-paste-max", type=int, default=20)
    ap.add_argument("--copy-paste-scale", default="1.0,1.0")
    ap.add_argument("--crop", type=int, default=0,
                    help="native-scale crop training window "
                         "(cfg.INPUT.CROP_SIZE)")
    ap.add_argument("--min-size-test", type=int, default=0,
                    help="inference shortest-edge target (cfg.INPUT."
                         "MIN_SIZE_TEST; MAX_SIZE_TEST scales by the "
                         "same factor) — pair native-scale crop "
                         "training with native-resolution inference")
    ap.add_argument("--tta", action="store_true",
                    help="flip TTA at inference (engine.tta.TTAPredictor)")
    ap.add_argument("--tta-rot", action="store_true",
                    help="add 90-degree-rotated TTA views (full D4 group)")
    ap.add_argument("--edge-loss", type=float, default=0.0,
                    help="edge-agreement aux mask loss weight "
                         "(cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT)")
    ap.add_argument("--mask-res", type=int, default=0,
                    help="mask head output resolution (28 default, 56 = "
                         "quality mode; sets MODEL.ROI_MASK_HEAD."
                         "POOLER_RESOLUTION to half this)")
    ap.add_argument("--cache-mb", type=int, default=None,
                    help="device sample-cache cap in MB "
                         "(cfg.TPU.DEVICE_DATA_CACHE_MB)")
    ap.add_argument("--pseudo", default=None,
                    help="pseudo-label JSON (tools/pseudo_label.py) added "
                         "to DATASETS.TRAIN; with no unlabeled spheroidite "
                         "images this is self-distillation on the train "
                         "split")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for shadow weights "
                         "(cfg.SOLVER.EMA_DECAY, e.g. 0.999)")
    ap.add_argument("--init-backbone", default=None,
                    help="orbax checkpoint from tools/pretrain_backbone"
                         ".py: graft the SSL-pretrained R50 subtree over "
                         "the fresh init (cfg.MODEL.BACKBONE.WEIGHTS)")
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

    # predictions: shipped sample results, or train/run the predictor
    if args.weights or args.train:
        cfg = get_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
        cfg.TEST.DETECTIONS_PER_IMAGE = 400
        cfg.DATASETS.TRAIN = ("spheroidite_Training",)
        cfg.DATASETS.TEST = ("spheroidite_Validation",)
        if args.pseudo:
            # Self-distillation pool: the spheroidite dataset ships no
            # unlabeled images (all 10 are annotated), so --pseudo here
            # re-labels the training images with a stronger predictor
            # (TTA-voted, maskness-rescored — tools/pseudo_label.py) and
            # trains on GT + the model's own dense labels.
            pname = "spheroidite_Pseudo"
            if pname not in DatasetCatalog.list():
                DatasetCatalog.register(
                    pname, lambda p=args.pseudo:
                    data_utils.get_ddicts("rle", p))
                MetadataCatalog.get(pname).set(
                    thing_classes=["spheroidite"])
            cfg.DATASETS.TRAIN = cfg.DATASETS.TRAIN + (pname,)
        if args.flip:
            cfg.INPUT.RANDOM_FLIP = args.flip
        if args.jitter:
            cfg.INPUT.RANDOM_BRIGHTNESS = (1 - args.jitter, 1 + args.jitter)
            cfg.INPUT.RANDOM_CONTRAST = (1 - args.jitter, 1 + args.jitter)
        if args.rotate:
            cfg.INPUT.RANDOM_ROTATION = tuple(
                float(a) for a in args.rotate.split(","))
        if args.copy_paste:
            cfg.INPUT.COPY_PASTE = args.copy_paste
            cfg.INPUT.COPY_PASTE_MAX = args.copy_paste_max
            cfg.INPUT.COPY_PASTE_SCALE = tuple(
                float(s) for s in args.copy_paste_scale.split(","))
        if args.crop:
            cfg.INPUT.CROP_SIZE = args.crop
        if args.min_size_test:
            cfg.INPUT.MAX_SIZE_TEST = int(round(
                cfg.INPUT.MAX_SIZE_TEST
                * args.min_size_test / cfg.INPUT.MIN_SIZE_TEST))
            cfg.INPUT.MIN_SIZE_TEST = args.min_size_test
        if args.edge_loss:
            cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT = args.edge_loss
        if args.mask_res:
            if args.mask_res % 2:
                raise SystemExit("--mask-res must be even (deconv x2)")
            cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = args.mask_res // 2
        if args.cache_mb:
            cfg.TPU.DEVICE_DATA_CACHE_MB = args.cache_mb
        if args.ema:
            cfg.SOLVER.EMA_DECAY = args.ema
        if args.norm == "auto":
            cfg.MODEL.RESNETS.NORM = ("GN" if args.train and not args.weights
                                      else "FrozenBN")
        else:
            cfg.MODEL.RESNETS.NORM = args.norm
        if args.init_backbone and args.train and not args.weights:
            cfg.MODEL.BACKBONE.WEIGHTS = args.init_backbone
        if args.weights:
            cfg.MODEL.WEIGHTS = args.weights
            ckpt_cfg = Path(args.weights).parent / "config.json"
            if ckpt_cfg.is_file():
                import json
                saved = json.loads(ckpt_cfg.read_text())
                cfg.MODEL.PIXEL_MEAN = saved["MODEL"]["PIXEL_MEAN"]
                cfg.MODEL.PIXEL_STD = saved["MODEL"]["PIXEL_STD"]
                cfg.MODEL.RESNETS.NORM = saved["MODEL"]["RESNETS"].get(
                    "NORM", "FrozenBN")
                # mask-head resolution must match training (--mask-res)
                cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = \
                    saved["MODEL"]["ROI_MASK_HEAD"].get(
                        "POOLER_RESOLUTION", 14)
        if args.train:
            if args.standardize == "on" or (args.standardize == "auto"
                                            and not args.weights):
                from ampis_tpu.utils.io import imread_bgr
                px = np.concatenate([
                    imread_bgr(d["file_name"]).reshape(-1, 3)
                    .astype(np.float32)
                    for d in DatasetCatalog.get("spheroidite_Training")])
                cfg.MODEL.PIXEL_MEAN = [
                    round(float(v), 3) for v in px.mean(axis=0)]
                cfg.MODEL.PIXEL_STD = [
                    round(float(v), 3) for v in px.std(axis=0) + 1e-6]
                print(f"standardized input: mean={cfg.MODEL.PIXEL_MEAN} "
                      f"std={cfg.MODEL.PIXEL_STD}")
            cfg.SOLVER.IMS_PER_BATCH = args.batch
            cfg.SOLVER.MAX_ITER = args.max_iter
            cfg.SOLVER.CHECKPOINT_PERIOD = max(args.max_iter // 4, 1)
            cfg.SOLVER.BASE_LR = args.lr
            cfg.SOLVER.STEPS = (int(args.max_iter * 0.7),
                                int(args.max_iter * 0.9))
            cfg.SOLVER.WARMUP_ITERS = min(1000, max(args.max_iter // 10, 1))
            cfg.MODEL.BACKBONE.FREEZE_AT = 0 if not args.weights else 2
            cfg.OUTPUT_DIR = str(outdir / "train")
            from ampis_tpu.data_utils import AmpisTrainer
            trainer = AmpisTrainer(cfg)
            trainer.resume_or_load(resume=args.resume)
            trainer.train()
            from ampis_tpu.engine.checkpoint import latest_checkpoint
            cfg.MODEL.WEIGHTS = str(latest_checkpoint(cfg.OUTPUT_DIR))
        from ampis_tpu.engine.predictor import DefaultPredictor
        from ampis_tpu.utils.io import imread_bgr
        if args.tta:
            from ampis_tpu.engine.tta import TTAPredictor
            predictor = TTAPredictor(cfg, flip=True, vflip=True,
                                     rot90=args.tta_rot)
        else:
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
