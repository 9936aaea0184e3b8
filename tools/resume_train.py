"""Resume an interrupted powder fine-tune from its latest checkpoint.

Same config the `examples/powder_workflow.py --train` path builds (keep in
sync), but with resume=True: restores params/opt_state/step from the
newest ckpt_* in OUTPUT_DIR and continues to --max-iter.

Usage: python tools/resume_train.py --outdir ./powder_out_r2 \
           --max-iter 6000 --batch 2 --lr 2.5e-3
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.powder_workflow import register  # noqa: E402
from ampis_tpu.engine import get_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/examples/powder/data")
    ap.add_argument("--outdir", default="./powder_out_r2")
    ap.add_argument("--max-iter", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2.5e-3)
    args = ap.parse_args()

    names = register(Path(args.data))
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 400
    cfg.DATASETS.TRAIN = (names[("particle", "training")],)
    cfg.DATASETS.TEST = (names[("particle", "validation")],)
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.SOLVER.MAX_ITER = args.max_iter
    cfg.SOLVER.CHECKPOINT_PERIOD = max(args.max_iter // 5, 1)
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.STEPS = (int(args.max_iter * 0.7), int(args.max_iter * 0.9))
    cfg.SOLVER.WARMUP_ITERS = min(1000, max(args.max_iter // 10, 1))
    cfg.MODEL.BACKBONE.FREEZE_AT = 0  # from-scratch run
    cfg.OUTPUT_DIR = str(Path(args.outdir) / "train")

    # the trainer persists its exact config next to the checkpoints —
    # recover run-specific keys (e.g. PIXEL_MEAN/PIXEL_STD from
    # --standardize) rather than trusting the CLI to repeat them
    saved = Path(cfg.OUTPUT_DIR) / "config.json"
    if saved.is_file():
        import json
        prev = json.loads(saved.read_text())
        cfg.MODEL.PIXEL_MEAN = prev["MODEL"]["PIXEL_MEAN"]
        cfg.MODEL.PIXEL_STD = prev["MODEL"]["PIXEL_STD"]
        print(f"input stats from {saved}: mean={cfg.MODEL.PIXEL_MEAN} "
              f"std={cfg.MODEL.PIXEL_STD}")

    from ampis_tpu.data_utils import AmpisTrainer
    trainer = AmpisTrainer(cfg)
    trainer.resume_or_load(resume=True)
    print(f"resuming at iter {trainer.iter} -> {args.max_iter}",
          flush=True)
    trainer.train()
    print("RESUME_TRAIN_OK", trainer.iter)


if __name__ == "__main__":
    main()
