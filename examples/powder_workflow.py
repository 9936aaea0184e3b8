"""Powder example: the reference's tutorial workflow on ampis_tpu.

Mirrors `colab/AMPIS Tutorial.ipynb` (the reference's de-facto integration
test, SURVEY.md §3): register VIA2 datasets, visualize ground truth,
load predictions (shipped sample pickles by default, or run the TPU
predictor with --weights), evaluate detection/segmentation scores and mask
AP, match satellites to particles, and compute the particle size
distribution.

Usage:
    python examples/powder_workflow.py --data /root/reference/examples/powder/data \
        [--weights /path/to/ckpt_or_d2.pkl] [--train] [--outdir ./powder_out]
"""
import argparse
import pickle
import sys
from pathlib import Path

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ampis_tpu import analyze, data_utils, structures, visualize  # noqa: E402
from ampis_tpu.applications import powder  # noqa: E402
from ampis_tpu.compat import load_pickle  # noqa: E402
from ampis_tpu.engine import DatasetCatalog, MetadataCatalog, get_cfg  # noqa: E402
from ampis_tpu.evaluation import evaluate_mask_ap  # noqa: E402


def register(data_root: Path):
    via = data_root / "via_2.0.8"
    names = {}
    for thing, cls in (("particle", "particle"), ("satellite", "satellite")):
        for split in ("training", "validation"):
            json_path = via / f"via_powder_{thing}_masks_{split}.json"
            name = f"powder_{thing}_{split.capitalize()}"
            DatasetCatalog.register(
                name, lambda p=json_path, s=split.capitalize():
                data_utils.get_ddicts("via2", p, dataset_class=s))
            MetadataCatalog.get(name).set(thing_classes=[cls])
            names[(thing, split)] = name
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/examples/powder/data")
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir or detectron2 .pkl; if unset "
                         "the shipped sample prediction pickles are used")
    ap.add_argument("--train", action="store_true",
                    help="fine-tune on the training split before predicting")
    ap.add_argument("--resume", action="store_true",
                    help="with --train: resume from the latest checkpoint "
                         "in the output dir instead of starting fresh")
    ap.add_argument("--max-iter", type=int, default=2000,
                    help="training iterations (reference recipe: 2000)")
    ap.add_argument("--lr", type=float, default=2.5e-4,
                    help="base learning rate (reference recipe: 2.5e-4)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--freeze-at", type=int, default=None,
                    help="backbone freeze stage; defaults to 0 when "
                         "training from scratch, 2 with pretrained weights")
    ap.add_argument("--int8", default="off",
                    choices=("off", "static", "dynamic"),
                    help="int8 mask-head mode at inference "
                         "(cfg.TPU.INT8_MASK_HEAD; 'static' auto-"
                         "calibrates on the first predicted batch)")
    ap.add_argument("--int8-backbone", action="store_true",
                    help="also quantize res2-res5 at inference "
                         "(cfg.TPU.INT8_BACKBONE='static'; FrozenBN "
                         "checkpoints only)")
    ap.add_argument("--int8-neck", action="store_true",
                    help="also quantize the FPN + RPN head at inference "
                         "(cfg.TPU.INT8_NECK='static')")
    ap.add_argument("--standardize", default="auto",
                    choices=("auto", "on", "off"),
                    help="set PIXEL_MEAN/PIXEL_STD to the training set's "
                         "pixel statistics. 'auto' = on when training from "
                         "scratch: with FrozenBN (identity at random init) "
                         "and caffe-style PIXEL_STD=1, activations carry "
                         "the raw input scale through the backbone and "
                         "init losses are ~100x too large (the reference "
                         "recipe never hits this: it always starts from "
                         "COCO weights whose BN statistics normalize each "
                         "stage)")
    ap.add_argument("--satellite-weights", default=None,
                    help="orbax checkpoint dir or detectron2 .pkl for the "
                         "satellite model; enables own-model satellite "
                         "predictions (default: shipped sample pickles)")
    ap.add_argument("--train-satellites", action="store_true",
                    help="also fine-tune a satellite model (same solver "
                         "flags, DETECTIONS_PER_IMAGE=150) and use it for "
                         "the satellite side of the pipeline")
    ap.add_argument("--flip", default=None,
                    choices=("horizontal", "vertical", "both", "none"),
                    help="training flip augmentation (cfg.INPUT."
                         "RANDOM_FLIP; default horizontal — SEM images "
                         "are orientation-free, 'both' doubles the "
                         "augmentation diversity)")
    ap.add_argument("--norm", default="auto",
                    choices=("auto", "GN", "FrozenBN"),
                    help="backbone norm (cfg.MODEL.RESNETS.NORM). 'auto' "
                         "= GN when training from scratch (FrozenBN is a "
                         "bare affine at random init — the from-scratch "
                         "handicap), FrozenBN otherwise (required for "
                         "converted d2 checkpoints)")
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="photometric augmentation strength x: random "
                         "brightness/contrast in [1-x, 1+x] per image "
                         "(cfg.INPUT.RANDOM_BRIGHTNESS/RANDOM_CONTRAST, "
                         "in-graph; detectron2 transform semantics)")
    ap.add_argument("--min-sizes", default=None,
                    help="comma-separated train scale-jitter targets "
                         "(cfg.INPUT.MIN_SIZE_TRAIN; default 640..800 — "
                         "widen downward, e.g. 480,560,640,704,768,800, "
                         "for stronger scale augmentation; each distinct "
                         "size compiles one train program)")
    ap.add_argument("--rotate", default=None,
                    help="comma-separated rotation-augmentation angles in "
                         "degrees, drawn uniformly per sample (cfg.INPUT."
                         "RANDOM_ROTATION; include 0 to keep unrotated "
                         "variants, e.g. 0,15,-15,30,-30). Host-side, so "
                         "no extra compiles; each angle multiplies the "
                         "device sample-cache variants")
    ap.add_argument("--copy-paste", type=float, default=0.0,
                    help="instance copy-paste probability per train sample "
                         "variant (cfg.INPUT.COPY_PASTE; Ghiasi et al. "
                         "2021). The strongest few-shot augmentation "
                         "lever: pastes instances between training images "
                         "with occlusion-aware GT updates")
    ap.add_argument("--copy-paste-max", type=int, default=20,
                    help="max instances pasted per sample "
                         "(cfg.INPUT.COPY_PASTE_MAX)")
    ap.add_argument("--copy-paste-scale", default="1.0,1.0",
                    help="per-pasted-instance rescale range lo,hi "
                         "(cfg.INPUT.COPY_PASTE_SCALE, e.g. 0.8,1.25)")
    ap.add_argument("--crop", type=int, default=0,
                    help="crop training: sample one CROP x CROP window "
                         "per train variant at native scale "
                         "(cfg.INPUT.CROP_SIZE; pair with --min-sizes "
                         "near CROP for native-resolution training)")
    ap.add_argument("--min-size-test", type=int, default=0,
                    help="inference shortest-edge target (cfg.INPUT."
                         "MIN_SIZE_TEST; MAX_SIZE_TEST scales by the "
                         "same factor). Crop training at native scale "
                         "needs native-resolution inference to match "
                         "the trained object-size distribution, e.g. "
                         "--crop 704 --min-sizes 576,640,704 "
                         "--min-size-test 1024")
    ap.add_argument("--cache-mb", type=int, default=None,
                    help="device sample-cache cap in MB (cfg.TPU."
                         "DEVICE_DATA_CACHE_MB; raise when rotation x "
                         "scale x flip variants exceed the 2048 default)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for shadow weights (cfg.SOLVER."
                         "EMA_DECAY, e.g. 0.999); checkpoints carry both "
                         "and inference prefers the EMA weights")
    ap.add_argument("--edge-loss", type=float, default=0.0,
                    help="edge-agreement auxiliary mask loss weight "
                         "(cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT, "
                         "arXiv:1809.07069; try 0.5)")
    ap.add_argument("--mask-res", type=int, default=0,
                    help="mask head output resolution (28 default, 56 = "
                         "quality mode; sets MODEL.ROI_MASK_HEAD."
                         "POOLER_RESOLUTION to half this — the whole "
                         "mask branch is resolution-agnostic)")
    ap.add_argument("--sat-native", action="store_true",
                    help="satellite tiny-object recipe: anchors fit to "
                         "the satellite GT size distribution (sqrt-area "
                         "p5/p50/p95 = 7/15/37 px at native scale), "
                         "512-px crop training at native resolution, "
                         "copy-paste, and native-resolution inference "
                         "(MIN_SIZE_TEST=1024). Overrides the generic "
                         "--min-sizes/--rotate/--crop flags for the "
                         "satellite model only")
    ap.add_argument("--tta", action="store_true",
                    help="test-time augmentation: merge h/v-flipped and "
                         "multi-scale views by NMS (engine.tta."
                         "TTAPredictor; each extra scale compiles one "
                         "more inference graph)")
    ap.add_argument("--tta-scales", default=None,
                    help="comma-separated TTA shortest-edge scales "
                         "(default: MIN_SIZE_TEST only, flips-only TTA)")
    ap.add_argument("--sat-pseudo", default=None,
                    help="pseudo-label JSON for the satellite dataset "
                         "(tools/pseudo_label.py on the satellite model); "
                         "added to the satellite DATASETS.TRAIN like "
                         "--pseudo is for particles")
    ap.add_argument("--pseudo", default=None,
                    help="pseudo-label JSON (tools/pseudo_label.py, "
                         "get_ddicts 'rle' format) appended to the "
                         "particle training set for self-training")
    ap.add_argument("--tta-rot", action="store_true",
                    help="add 90-degree-rotated TTA views (full D4 "
                         "symmetry group)")
    ap.add_argument("--tta-vote", type=float, default=0.0,
                    help="TTA box+mask voting IoU (0 = plain NMS merge)")
    ap.add_argument("--init-backbone", default=None,
                    help="orbax checkpoint from tools/pretrain_backbone"
                         ".py: graft the SSL-pretrained R50 subtree over "
                         "the fresh init (cfg.MODEL.BACKBONE.WEIGHTS) — "
                         "the in-environment stand-in for the reference's "
                         "COCO transfer learning")
    ap.add_argument("--synth-train", default=None,
                    help="synthetic-scene JSON (tools/synth_scenes.py, "
                         "get_ddicts 'rle' format): REPLACES the training "
                         "split of whichever model this invocation trains "
                         "— full-detector pretraining on procedural SEM "
                         "scenes, the in-environment stand-in for COCO "
                         "detection pretraining (validation stays the "
                         "real split, so val-loss curves remain "
                         "comparable). Fine-tune afterwards by passing "
                         "the resulting checkpoint via --weights --train")
    ap.add_argument("--outdir", default="./powder_out")
    args = ap.parse_args()

    data_root = Path(args.data)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    names = register(data_root)

    # --- 1. GT visualization (notebook cells 14-16) ---
    ddicts_val = DatasetCatalog.get(names[("particle", "validation")])
    visualize.display_ddicts(ddicts_val[0], outpath=outdir,
                             dataset=names[("particle", "validation")],
                             gt=True, summary=True)
    print(f"wrote GT overlay to {outdir}")

    # --- 2. predictions ---
    def run_model(thing, weights, do_train, detections, train_dir):
        """Train (optional) + predict one model; returns format_outputs
        dicts over the thing's validation split."""
        cfg = get_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
        cfg.TEST.DETECTIONS_PER_IMAGE = detections
        if args.int8 != "off":
            cfg.TPU.INT8_MASK_HEAD = args.int8
        if args.int8_backbone:
            cfg.TPU.INT8_BACKBONE = "static"
        if args.int8_neck:
            cfg.TPU.INT8_NECK = "static"
        cfg.DATASETS.TRAIN = (names[(thing, "training")],)
        cfg.DATASETS.TEST = (names[(thing, "validation")],)
        if args.synth_train and do_train:
            sname = f"synth_{thing}_{Path(args.synth_train).stem}"
            if sname not in DatasetCatalog.list():
                DatasetCatalog.register(
                    sname, lambda p=args.synth_train:
                    data_utils.get_ddicts("rle", p))
                MetadataCatalog.get(sname).set(thing_classes=[thing])
            cfg.DATASETS.TRAIN = (sname,)
        pseudo_json = (args.pseudo if thing == "particle"
                       else args.sat_pseudo)
        if pseudo_json and do_train:
            pname = f"powder_{thing}_Pseudo"
            if pname not in DatasetCatalog.list():
                DatasetCatalog.register(
                    pname, lambda p=pseudo_json:
                    data_utils.get_ddicts("rle", p))
                MetadataCatalog.get(pname).set(thing_classes=[thing])
            cfg.DATASETS.TRAIN = cfg.DATASETS.TRAIN + (pname,)
        if args.flip:
            cfg.INPUT.RANDOM_FLIP = args.flip
        if args.min_sizes:
            cfg.INPUT.MIN_SIZE_TRAIN = tuple(
                int(s) for s in args.min_sizes.split(","))
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
        if args.jitter:
            cfg.INPUT.RANDOM_BRIGHTNESS = (1 - args.jitter, 1 + args.jitter)
            cfg.INPUT.RANDOM_CONTRAST = (1 - args.jitter, 1 + args.jitter)
        if args.norm == "auto":
            cfg.MODEL.RESNETS.NORM = ("GN" if do_train and not weights
                                      else "FrozenBN")
        else:
            cfg.MODEL.RESNETS.NORM = args.norm
        if args.init_backbone and do_train and not weights:
            cfg.MODEL.BACKBONE.WEIGHTS = args.init_backbone
        if thing == "satellite" and args.sat_native:
            # tiny-object recipe (see --sat-native help). Satellites are
            # ~15 px median at native scale: the stock 32-px smallest
            # anchor plus the 800-px test resize starve P2 of positive
            # anchors — train on native-scale crops with 16-px anchors
            # and infer at native resolution instead.
            cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64],
                                                [128], [256]]
            cfg.INPUT.CROP_SIZE = 512
            cfg.INPUT.MIN_SIZE_TRAIN = (448, 512)
            cfg.INPUT.MAX_SIZE_TRAIN = 512
            cfg.INPUT.MIN_SIZE_TEST = 1024
            cfg.INPUT.MAX_SIZE_TEST = 1536
            cfg.INPUT.RANDOM_ROTATION = ()  # crops supply the diversity
            if not args.copy_paste:
                cfg.INPUT.COPY_PASTE = 0.5
                cfg.INPUT.COPY_PASTE_MAX = 30
                cfg.INPUT.COPY_PASTE_SCALE = (0.8, 1.25)
        if weights:
            cfg.MODEL.WEIGHTS = weights
            # recover run-specific keys from the config the trainer
            # persisted next to the checkpoint (input statistics, norm)
            ckpt_cfg = Path(weights).parent / "config.json"
            if ckpt_cfg.is_file():
                import json
                saved = json.loads(ckpt_cfg.read_text())
                cfg.MODEL.PIXEL_MEAN = saved["MODEL"]["PIXEL_MEAN"]
                cfg.MODEL.PIXEL_STD = saved["MODEL"]["PIXEL_STD"]
                cfg.MODEL.RESNETS.NORM = saved["MODEL"]["RESNETS"].get(
                    "NORM", "FrozenBN")
                # anchors + test resolution must match training (the
                # --sat-native recipe changes both)
                cfg.MODEL.ANCHOR_GENERATOR.SIZES = \
                    saved["MODEL"]["ANCHOR_GENERATOR"]["SIZES"]
                # mask-head resolution must match training (--mask-res);
                # the weights are shape-agnostic, so a mismatch would
                # silently serve lower-resolution masks, not fail
                cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = \
                    saved["MODEL"]["ROI_MASK_HEAD"].get(
                        "POOLER_RESOLUTION", 14)
                cfg.INPUT.MIN_SIZE_TEST = saved["INPUT"]["MIN_SIZE_TEST"]
                cfg.INPUT.MAX_SIZE_TEST = saved["INPUT"]["MAX_SIZE_TEST"]
                print(f"input stats from {ckpt_cfg}: "
                      f"mean={cfg.MODEL.PIXEL_MEAN} "
                      f"std={cfg.MODEL.PIXEL_STD} "
                      f"norm={cfg.MODEL.RESNETS.NORM}")
        if do_train and (args.standardize == "on" or (
                args.standardize == "auto" and not weights)):
            from ampis_tpu.utils.io import imread_bgr
            px = np.concatenate([
                imread_bgr(d["file_name"]).reshape(-1, 3).astype(np.float32)
                for d in DatasetCatalog.get(cfg.DATASETS.TRAIN[0])])
            mean, std = px.mean(axis=0), px.std(axis=0) + 1e-6
            cfg.MODEL.PIXEL_MEAN = [round(float(v), 3) for v in mean]
            cfg.MODEL.PIXEL_STD = [round(float(v), 3) for v in std]
            print(f"standardized input ({thing}): "
                  f"mean={cfg.MODEL.PIXEL_MEAN} std={cfg.MODEL.PIXEL_STD}")
        if do_train:
            cfg.SOLVER.IMS_PER_BATCH = args.batch
            cfg.SOLVER.MAX_ITER = args.max_iter
            cfg.SOLVER.CHECKPOINT_PERIOD = max(args.max_iter // 5, 1)
            cfg.SOLVER.BASE_LR = args.lr
            cfg.SOLVER.STEPS = (int(args.max_iter * 0.7),
                                int(args.max_iter * 0.9))
            cfg.SOLVER.WARMUP_ITERS = min(1000, max(args.max_iter // 10, 1))
            # a frozen random backbone can't learn: only freeze stages
            # when starting from pretrained weights
            cfg.MODEL.BACKBONE.FREEZE_AT = (
                args.freeze_at if args.freeze_at is not None
                else (2 if weights else 0))
            cfg.OUTPUT_DIR = str(outdir / train_dir)
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
            scales = (tuple(int(s) for s in args.tta_scales.split(","))
                      if args.tta_scales else None)
            predictor = TTAPredictor(cfg, min_sizes=scales, flip=True,
                                     vflip=True, rot90=args.tta_rot,
                                     vote_iou=args.tta_vote)
        else:
            predictor = DefaultPredictor(cfg)
        results = []
        for d in DatasetCatalog.get(names[(thing, "validation")]):
            out = predictor(imread_bgr(d["file_name"]))
            results.append(data_utils.format_outputs(
                d["file_name"], f"{thing}_Validation", out))
        with open(outdir / f"{thing}_predictions.pickle", "wb") as f:
            pickle.dump(results, f)
        return results

    if args.weights or args.train:
        particle_results = run_model("particle", args.weights, args.train,
                                     400, "train")
    else:
        particle_results = load_pickle(
            data_root / "sample_particle_outputs.pickle")
    if args.satellite_weights or args.train_satellites:
        # DETECTIONS_PER_IMAGE=150 per the reference satellite recipe
        # (colab cell 20 variant / BASELINE config 3)
        satellite_results = run_model(
            "satellite", args.satellite_weights, args.train_satellites,
            150, "train_satellites")
        # score the satellite model against its own validation GT
        sat_gt = [structures.InstanceSet().read_from_ddict(d, inplace=False)
                  for d in DatasetCatalog.get(
                      names[("satellite", "validation")])]
        sat_pr = [structures.InstanceSet().read_from_model_out(
            o, inplace=False) for o in satellite_results]
        g_al, p_al_s = analyze.align_instance_sets(sat_gt, sat_pr)
        for gt, pr in zip(g_al, p_al_s):
            s = analyze.det_seg_scores(gt, pr,
                                       size=gt.instances.image_size)
            print(f"[satellite] {Path(gt.filepath).name}: "
                  f"det P={s['det_precision']:.3f} "
                  f"R={s['det_recall']:.3f} "
                  f"seg P={np.median(s['seg_precision']):.3f} "
                  f"R={np.median(s['seg_recall']):.3f}")
        if g_al:
            sat_ap = evaluate_mask_ap(g_al, p_al_s)
            print("[satellite] mask AP:",
                  {k: round(v, 3) for k, v in sat_ap.items()
                   if k != "per_iou"})
    else:
        satellite_results = load_pickle(
            data_root / "sample_satellite_outputs.pickle")

    pred_sets = [structures.InstanceSet().read_from_model_out(o,
                                                              inplace=False)
                 for o in particle_results]
    sat_sets = [structures.InstanceSet().read_from_model_out(o,
                                                             inplace=False)
                for o in satellite_results]

    # --- 3. evaluation vs GT (notebook cells 34-46) ---
    gt_sets = [structures.InstanceSet().read_from_ddict(d, inplace=False)
               for d in ddicts_val]
    gt_m, pred_m = analyze.align_instance_sets(gt_sets, pred_sets)
    for gt, pr in zip(gt_m, pred_m):
        scores = analyze.det_seg_scores(gt, pr,
                                        size=gt.instances.image_size)
        print(f"{Path(gt.filepath).name}: det P={scores['det_precision']:.3f}"
              f" R={scores['det_recall']:.3f} "
              f"seg P={np.median(scores['seg_precision']):.3f} "
              f"R={np.median(scores['seg_recall']):.3f}")
    if gt_m:
        ap_out = evaluate_mask_ap(gt_m, pred_m)
        print("mask AP:", {k: round(v, 3) for k, v in ap_out.items()
                           if k != "per_iou"})

    # detection-performance overlay (notebook cells 47-50)
    if gt_m:
        iset_perf, colormap = analyze.det_perf_iset(gt_m[0], pred_m[0])
        from ampis_tpu.utils.io import imread
        img = imread(gt_m[0].filepath)
        fig, ax = plt.subplots(figsize=(8, 5), dpi=150)
        visualize.display_iset(np.stack([img] * 3, -1) if img.ndim == 2
                               else img, iset_perf, ax=ax)
        fig.savefig(outdir / "det_perf.png", bbox_inches="tight")
        plt.close(fig)

    # --- 4. satellite matching + measurements (cells 56-66) ---
    p_al, s_al = analyze.align_instance_sets(pred_sets, sat_sets)
    psis = []
    for p, s in zip(p_al, s_al):
        psi = powder.PowderSatelliteImage(particles=p, satellites=s)
        psi.compute_matches()
        psis.append(psi)
    powder.satellite_measurements(psis, print_summary=True)

    # --- 5. particle size distribution (cells 52-55) ---
    fig, ax = plt.subplots(dpi=150)
    powder.psd(p_al, xvals="d_eq", yvals="cvf", c=(1036 / 1536, "um"),
               ax=ax, plot=False)
    fig.savefig(outdir / "psd.png", bbox_inches="tight")
    plt.close(fig)
    print(f"wrote PSD curve to {outdir / 'psd.png'}")
    print("POWDER_WORKFLOW_OK")


if __name__ == "__main__":
    main()
