"""Flagship benchmark: batched SEM-image Mask R-CNN inference throughput.

Measures images/sec/chip for the powder workload (BASELINE config 5:
batched high-density inference, 1536x1024 SEM images resized to
shortest-edge 800, up to 400 detections/image) on whatever accelerator JAX
exposes (the driver runs this on one real TPU chip).

Baseline: detectron2 model-zoo mask_rcnn_R_50_FPN_3x inference on V100 =
0.043 s/img = 23.3 img/s (the reference's engine; BASELINE.md north star is
>= 5x that per chip).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

V100_BASELINE_IMG_S = 23.3

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
# 24 iters: 8 measured within ~2-3% run-to-run noise through the axon
# tunnel; 24 brings repeat runs within ~1%
ITERS = int(os.environ.get("BENCH_ITERS", "24"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "4"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ampis_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from ampis_tpu.input.transforms import (get_resize_shape,
                                            pad_to_canvas_shape)
    from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params
    from ampis_tpu.input.transforms import preprocess_image

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    # powder workload geometry
    raw_h, raw_w = 1024, 1536
    new_shape = get_resize_shape(raw_h, raw_w, 800, 1333)
    canvas = pad_to_canvas_shape(*new_shape)

    # BENCH_INT8 selects the int8 mask-head mode (see
    # MaskRCNN.int8_mask_head): 0/1 = off/dynamic, "static" = calibrated
    # static scales (calibration pass runs below). Default: static — the
    # production inference config; AP-neutral on the trained powder model
    # (0.537 int8 vs 0.536 bf16, docs/parity.md).
    int8_env = os.environ.get("BENCH_INT8", "static")
    kw = {"int8_mask_head": ("static" if int8_env == "static"
                             else bool(int(int8_env)))}
    # BENCH_INT8_BB: also quantize the res2-res5 backbone stages
    # (cfg.TPU.INT8_BACKBONE="static"; requires BENCH_INT8=static and a
    # FrozenBN checkpoint — the pinned bench weights are). Default ON:
    # measured +8.3 img/s and AP-neutral on the pinned checkpoint
    # (docs/performance.md round-3 table, docs/parity.md int8 table).
    # BENCH_INT8_NECK=1: same for the FPN + RPN head — measured
    # NEGATIVE (-12.8 img/s, requant breaks FPN fusion); kept for
    # reproduction.
    if int(os.environ.get("BENCH_INT8_BB", "1")):
        kw["int8_backbone"] = "static"
    if int(os.environ.get("BENCH_INT8_NECK", "0")):
        kw["int8_neck"] = "static"
    # BENCH_MASK_CAP: mask-stage capacity per image (see
    # cfg.TPU.MASK_CAPACITY_PER_IMAGE) — identical outputs unless the
    # batch overflows, which the run reports on stderr. 0 = exact path.
    # Default 288: real powder workloads fill 197-277 of the 400 mask
    # slots, so compacting the mask stage to a shared 288/img budget is
    # measured AP-neutral (0.473 vs 0.473 on the pinned checkpoint,
    # runs/logs/eval_cap288.log) and +9% throughput (129.7 -> 141.4
    # img/s, runs/logs/bench_cap288.log; 0 dropped detections).
    mask_cap = int(os.environ.get("BENCH_MASK_CAP", "288"))
    if mask_cap:
        kw["mask_capacity_per_image"] = mask_cap

    # Prefer trained weights (realistic score distributions and NMS
    # workload): BENCH_WEIGHTS env var, else the checkpoint pinned in the
    # committed bench_weights.json pointer (an explicit pin — a newest-
    # mtime glob would let any training experiment silently change what
    # the driver benchmarks), else random init. Resolved before model
    # construction so architecture knobs saved with the checkpoint (e.g.
    # the 56x56 mask head's pooler resolution) shape the benched model.
    ckpt = os.environ.get("BENCH_WEIGHTS")
    if ckpt is None:
        pin = Path(__file__).parent / "bench_weights.json"
        if pin.is_file():
            pinned = Path(__file__).parent / json.loads(
                pin.read_text())["checkpoint"]
            if pinned.is_dir():
                ckpt = str(pinned)
            else:
                print(f"# pinned bench checkpoint missing: {pinned}",
                      file=sys.stderr)
    if ckpt:
        ckpt_cfg_path = Path(ckpt).parent / "config.json"
        if ckpt_cfg_path.is_file():
            saved_cfg = json.loads(ckpt_cfg_path.read_text())
            mask_pr = saved_cfg["MODEL"].get("ROI_MASK_HEAD", {}).get(
                "POOLER_RESOLUTION", 14)
            if mask_pr != 14:
                kw["mask_pooler_resolution"] = mask_pr
                print(f"# mask pooler resolution: {mask_pr} "
                      f"({2 * mask_pr}x{2 * mask_pr} masks)",
                      file=sys.stderr)
            norm = saved_cfg["MODEL"].get("RESNETS", {}).get(
                "NORM", "FrozenBN")
            if norm != "FrozenBN":
                kw["backbone_norm"] = norm
                print(f"# backbone norm: {norm}", file=sys.stderr)

    # BENCH_MASK_RES: override the mask-head output resolution (28 or 56;
    # pooler resolution is half). Every mask-head parameter (3x3 convs,
    # 2x2 deconv, 1x1 predictor) is resolution-independent, so the pinned
    # 28-res checkpoint loads unchanged and this isolates the 56x56
    # quality mode's *throughput* cost on a realistic workload. Use with
    # BENCH_INT8=0: the cached static-int8 activation scales were
    # calibrated at 28 res.
    mask_res_env = int(os.environ.get("BENCH_MASK_RES", "0"))
    if mask_res_env:
        kw["mask_pooler_resolution"] = mask_res_env // 2

    model = MaskRCNN(num_classes=1, detections_per_image=400,
                     dtype=jnp.bfloat16, **kw)
    params = init_params(model, jax.random.PRNGKey(0))

    if ckpt:
        try:
            from ampis_tpu.engine.checkpoint import load_weights
            loaded = load_weights(ckpt, model)
            # merge per collection: int8-static init also carries a
            # "quant" collection that plain checkpoints lack (the
            # calibration pass below fills it)
            params = {**params, **{
                k: jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype),
                                params[k], v)
                for k, v in loaded.items()}}
            print(f"# weights: {ckpt}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — bench must still run
            print(f"# weights load failed ({e}); using random init",
                  file=sys.stderr)

    # load the real SEM images when available, else synthetic
    img_dir = Path("/root/reference/examples/powder/data/images_png")
    imgs = []
    if img_dir.exists():
        from ampis_tpu.utils.io import imread_bgr
        for p in sorted(img_dir.glob("*.png")):
            imgs.append(imread_bgr(p))
    if not imgs:
        rs = np.random.RandomState(0)
        imgs = [rs.randint(0, 255, (raw_h, raw_w, 3), np.uint8)
                for _ in range(BATCH)]
    while len(imgs) < BATCH:
        imgs = imgs + imgs
    raw = np.stack(imgs[:BATCH])

    mean = (103.53, 116.28, 123.675)
    std = (1.0, 1.0, 1.0)
    if ckpt:
        # run-specific input statistics persisted by the trainer (e.g.
        # examples/powder_workflow.py --standardize)
        ckpt_cfg = Path(ckpt).parent / "config.json"
        if ckpt_cfg.is_file():
            saved = json.loads(ckpt_cfg.read_text())
            mean = tuple(saved["MODEL"]["PIXEL_MEAN"])
            std = tuple(saved["MODEL"]["PIXEL_STD"])
            print(f"# input stats from {ckpt_cfg}", file=sys.stderr)

    @jax.jit
    def run(params, images):
        batch = jax.vmap(
            lambda im: preprocess_image(im, new_shape, canvas, mean, std)
        )(images)
        sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                         (images.shape[0], 1))
        return model.apply(params, batch, sizes, method=MaskRCNN.inference)

    import numpy as _np

    def sync(o):
        # explicit host fetch: block_until_ready does not reliably drain
        # the axon tunnel's execution queue
        return _np.asarray(o["scores"]).sum()

    images_dev = jax.device_put(jnp.asarray(raw))

    if kw.get("int8_mask_head") == "static":
        # Static int8 needs calibrated activation scales. They are
        # deterministic given (weights, bench images), so cache them in
        # bench_quant_scales.json to spare the driver the extra
        # calibration-pass compile; delete the file to recalibrate.
        import flax
        cache_path = Path(__file__).parent / "bench_quant_scales.json"
        key = str(ckpt or "random-init")
        if kw.get("int8_backbone"):
            key += "+bb"
        if kw.get("int8_neck"):
            key += "+neck"
        cached = {}
        if cache_path.exists():
            cached = json.loads(cache_path.read_text())
        if key in cached:
            flat = {tuple(k.split("/")): jnp.asarray(v, jnp.float32)
                    for k, v in cached[key].items()}
            quant = flax.traverse_util.unflatten_dict(flat)
            print(f"# int8 scales: cached ({key})", file=sys.stderr)
        else:
            calib_kw = dict(kw, int8_mask_head="calib")
            for m in ("int8_backbone", "int8_neck"):
                if kw.get(m):
                    calib_kw[m] = "calib"
            calib_model = MaskRCNN(num_classes=1, detections_per_image=400,
                                   dtype=jnp.bfloat16, **calib_kw)

            @jax.jit
            def calib(params, images):
                batch = jax.vmap(
                    lambda im: preprocess_image(im, new_shape, canvas,
                                                mean, std))(images)
                sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                                 (images.shape[0], 1))
                return calib_model.apply(
                    params, batch, sizes, method=MaskRCNN.inference,
                    mutable=["quant"])

            t0 = time.time()
            _, mut = calib(params, images_dev)
            quant = jax.device_get(mut["quant"])
            print(f"# int8 calibration: {time.time() - t0:.1f}s",
                  file=sys.stderr)
            flat = flax.traverse_util.flatten_dict(quant)
            cached[key] = {"/".join(k): float(v) for k, v in flat.items()}
            cache_path.write_text(json.dumps(cached, indent=1))
        params = {**params, "quant": quant}

    # compile + warmup
    t0 = time.time()
    out = run(params, images_dev)
    sync(out)
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    # --- model FLOPs for the MFU line (VERDICT r4 #8) ---
    # XLA's own cost model on the exact compiled program (one batch).
    # Convention: bf16 peak is the denominator even though the mask head/
    # backbone run int8 on the bench path — int8 work counted at bf16
    # peak understates MFU, never inflates it.
    flops_per_batch = None
    try:
        cost = run.lower(params, images_dev).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        f = float(cost.get("flops", 0.0))
        if f > 0:
            flops_per_batch = f
    except Exception as e:  # noqa: BLE001 — MFU is best-effort
        print(f"# cost analysis unavailable ({e})", file=sys.stderr)
    if mask_cap:
        n_valid = int(_np.asarray(out["valid"]).sum())
        n_drop = int(_np.asarray(out["mask_dropped"]))
        print(f"# mask capacity {mask_cap}/img: {n_valid} valid dets in "
              f"batch, {n_drop} dropped", file=sys.stderr)
    for _ in range(WARMUP):
        out = run(params, images_dev)
    sync(out)

    t0 = time.time()
    for _ in range(ITERS):
        out = run(params, images_dev)
    sync(out)
    dt = time.time() - t0

    img_s = BATCH * ITERS / dt
    print(f"# {BATCH} imgs x {ITERS} iters in {dt:.3f}s", file=sys.stderr)
    quant = [k for k, name in (("int8_mask_head", "mask head"),
                               ("int8_backbone", "backbone"),
                               ("int8_neck", "neck")) if kw.get(k)]
    precision = ("bf16 + int8 " + "/".join(
        {"int8_mask_head": "mask head", "int8_backbone": "backbone",
         "int8_neck": "neck"}[k] for k in quant)) if quant else "bf16"
    record = {
        "metric": "SEM images/sec/chip (Mask R-CNN R50-FPN inference, "
                  f"1536x1024->800, 400 dets/img, {precision})",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / V100_BASELINE_IMG_S, 3),
    }
    if flops_per_batch:
        # peak dense bf16 FLOPs/s per chip; override with BENCH_PEAK_FLOPS
        kind = getattr(jax.devices()[0], "device_kind", "")
        peaks = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
                 "TPU v4": 275e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12}
        peak = float(os.environ.get(
            "BENCH_PEAK_FLOPS",
            next((v for k, v in peaks.items() if k in kind), 0)) or 0)
        if peak:
            mfu = flops_per_batch * ITERS / dt / peak
            record["mfu"] = round(mfu, 4)
            record["model_gflops_per_image"] = round(
                flops_per_batch / BATCH / 1e9, 1)
            print(f"# MFU {100 * mfu:.1f}% of bf16 peak "
                  f"({record['model_gflops_per_image']} GFLOP/img, "
                  f"peak {peak / 1e12:.0f} TFLOP/s)", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
