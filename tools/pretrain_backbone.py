#!/usr/bin/env python
"""Pretrain the R50 backbone on shipped SEM imagery (masked-patch SSL).

Fills the COCO-transfer-learning slot of the reference workflow
(reference GETTING_STARTED.md:13,30 fine-tunes model_final_f10217.pkl;
no egress here) with in-environment self-supervised pretraining — see
ampis_tpu/models/pretrain.py for the pretext design.

Image pool: every shipped SEM image EXCEPT validation images (powder +
satellite VIA validation jsons, spheroidite valid_*). Validation stays
unseen end-to-end so downstream AP numbers remain honest.

TPU-first input pipeline: a multi-scale pyramid of the pool is uploaded
to HBM once (float16), and every augmentation — random scale level,
random crop (batched dynamic_slice), flips, 90-degree rotations,
photometric jitter, the patch mask — happens inside the jitted train
step from a PRNG key. Steady-state host->device traffic is zero (the
first host-side version of this script shipped 50 MB of crops per step
through the device tunnel and ran 10x slower than the compute).

Usage:
  python tools/pretrain_backbone.py --steps 16000 --batch 64 \
      --outdir runs/ssl_bb
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF = Path("/root/reference/examples")


def validation_filenames():
    """Basenames of every validation image in the shipped datasets."""
    if not REF.is_dir():
        raise SystemExit(
            f"reference example data not found at {REF} — point REF at "
            f"the shipped powder/spheroidite examples, or supply your "
            f"own image pool")
    names = set()
    via_dir = REF / "powder/data/via_2.0.8"
    for j in via_dir.glob("*validation*.json"):
        meta = json.loads(j.read_text())
        img_meta = meta.get("_via_img_metadata", meta)
        for v in img_meta.values():
            if isinstance(v, dict) and "filename" in v:
                names.add(v["filename"])
    for p in (REF / "spheroidite/data/images").glob("valid_*"):
        names.add(p.name)
    return names


def build_pool(verbose=True):
    """Load all non-validation SEM images as float32 grayscale arrays."""
    from ampis_tpu.utils.io import imread_bgr
    val = validation_filenames()
    paths = sorted((REF / "powder/data/images_png").glob("*.png")) + \
        sorted((REF / "spheroidite/data/images").glob("*.png"))
    pool, used = [], []
    for p in paths:
        if p.name in val:
            continue
        img = imread_bgr(str(p)).astype(np.float32).mean(axis=-1)
        pool.append(img)
        used.append(p.name)
    if verbose:
        print(f"image pool: {len(pool)} images "
              f"(excluded {len(val)} validation files)")
        for n in used:
            print("  ", n)
    return pool


def powder_train_pixel_stats():
    """Per-channel BGR mean/std over the powder particle training set —
    the exact statistics examples/powder_workflow.py --standardize
    computes, so the grafted backbone sees the same input scale at
    fine-tune time."""
    from ampis_tpu.utils.io import imread_bgr
    j = json.loads((REF / "powder/data/via_2.0.8/"
                    "via_powder_particle_masks_training.json").read_text())
    img_meta = j.get("_via_img_metadata", j)
    px = np.concatenate([
        imread_bgr(str(REF / "powder/data/images_png" / v["filename"]))
        .reshape(-1, 3).astype(np.float32)
        for v in img_meta.values()
        if isinstance(v, dict) and "filename" in v])
    return px.mean(axis=0), px.std(axis=0) + 1e-6


def build_pyramid(pool, scales, size):
    """Resize every pool image to each scale (host, once), pad into one
    (N, H, W) float16 canvas. Crops of ``size`` from scale s see the
    original image at zoom 1/s. Entries smaller than the crop are
    dropped. Returns (canvas, hs, ws)."""
    import torch
    entries = []
    for img in pool:
        for s in scales:
            h = int(round(img.shape[0] * s))
            w = int(round(img.shape[1] * s))
            if h < size or w < size:
                continue
            if s == 1.0:
                r = img
            else:
                t = torch.from_numpy(np.ascontiguousarray(img))[None, None]
                r = torch.nn.functional.interpolate(
                    t, size=(h, w), mode="bilinear",
                    align_corners=False)[0, 0].numpy()
            entries.append(r)
    hmax = max(e.shape[0] for e in entries)
    wmax = max(e.shape[1] for e in entries)
    canvas = np.zeros((len(entries), hmax, wmax), np.float16)
    hs = np.zeros(len(entries), np.int32)
    ws = np.zeros(len(entries), np.int32)
    for i, e in enumerate(entries):
        canvas[i, :e.shape[0], :e.shape[1]] = e
        hs[i], ws[i] = e.shape
    return canvas, hs, ws


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--mask-ratio", type=float, default=0.6)
    ap.add_argument("--norm", default="GN", choices=("GN", "FrozenBN"))
    ap.add_argument("--ckpt-every", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scales", default="0.5,0.75,1.0,1.5,2.0")
    ap.add_argument("--outdir", default="runs/ssl_bb")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ampis_tpu.engine.checkpoint import save_checkpoint
    from ampis_tpu.models.pretrain import (MaskedReconstructor,
                                           init_pretrain_params)
    from ampis_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    pool = build_pool()
    mean, std = powder_train_pixel_stats()
    print(f"pixel stats (powder train, BGR): mean={mean} std={std}")

    scales = [float(s) for s in args.scales.split(",")]
    canvas, hs, ws = build_pyramid(pool, scales, args.size)
    print(f"device pyramid: {canvas.shape} float16 "
          f"({canvas.nbytes / 1e6:.0f} MB, {len(hs)} entries)")
    canvas_dev = jax.device_put(canvas)
    hs_dev = jax.device_put(hs)
    ws_dev = jax.device_put(ws)

    model = MaskedReconstructor(norm=args.norm)
    params = init_pretrain_params(model, jax.random.PRNGKey(args.seed),
                                  size=args.size)
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"pretrainer params: {n_par / 1e6:.1f}M")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps)
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    size = args.size
    n_patch = size // model.patch
    gray_mean = float(mean.mean())
    gray_std = float(std.mean())

    def sample_batch(key, canvas, hs, ws):
        """All augmentation on device from one PRNG key. The pyramid
        rides as a jit *argument* — as a closure constant it would be
        embedded into the HLO as a literal (and a ~1 GB program blows
        the remote-compile request limit)."""
        ks = jax.random.split(key, 9)
        n = hs.shape[0]
        idx = jax.random.randint(ks[0], (args.batch,), 0, n)
        ry = jax.random.uniform(ks[1], (args.batch,))
        rx = jax.random.uniform(ks[2], (args.batch,))
        y0 = (ry * (hs[idx] - size).astype(jnp.float32)).astype(
            jnp.int32)
        x0 = (rx * (ws[idx] - size).astype(jnp.float32)).astype(
            jnp.int32)

        def one(i, y, x):
            return jax.lax.dynamic_slice(canvas, (i, y, x),
                                         (1, size, size))[0]
        crops = jax.vmap(one)(idx, y0, x0).astype(jnp.float32)

        flip_h = jax.random.bernoulli(ks[3], shape=(args.batch,))
        flip_v = jax.random.bernoulli(ks[4], shape=(args.batch,))
        crops = jnp.where(flip_h[:, None, None], crops[:, :, ::-1], crops)
        crops = jnp.where(flip_v[:, None, None], crops[:, ::-1, :], crops)
        k_rot = jax.random.randint(ks[5], (args.batch,), 0, 4)
        rots = jnp.stack([crops,
                          jnp.rot90(crops, 1, axes=(1, 2)),
                          jnp.rot90(crops, 2, axes=(1, 2)),
                          jnp.rot90(crops, 3, axes=(1, 2))])
        crops = jnp.take_along_axis(
            rots, k_rot[None, :, None, None], axis=0)[0]

        a = 1.0 + jax.random.uniform(ks[6], (args.batch, 1, 1),
                                     minval=-0.25, maxval=0.25)
        b = jax.random.uniform(ks[7], (args.batch, 1, 1),
                               minval=-20.0, maxval=20.0)
        m = crops.mean(axis=(1, 2), keepdims=True)
        crops = a * (crops - m) + m + b
        crops = (crops - gray_mean) / gray_std
        images = jnp.repeat(crops[..., None], 3, axis=-1)
        mask = jax.random.bernoulli(
            ks[8], args.mask_ratio, (args.batch, n_patch, n_patch))
        return images, mask

    @jax.jit
    def step(params, opt_state, key, canvas, hs, ws):
        images, mask = sample_batch(key, canvas, hs, ws)
        def loss_fn(p):
            loss, aux = model.apply(p, images, mask)
            return loss, aux
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    outdir = Path(args.outdir)
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    last = t0
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub,
                                       canvas_dev, hs_dev, ws_dev)
        if it % 100 == 0 or it == args.steps - 1:
            now = time.time()
            print(f"iter {it}  recon_loss {float(loss):.4f}  "
                  f"lr {float(sched(it)):.2e}  "
                  f"elapsed {now - t0:.0f}s  "
                  f"({(now - last) / 100:.3f}s/it)", flush=True)
            last = now
        if (it + 1) % args.ckpt_every == 0 or it == args.steps - 1:
            path = outdir / f"ckpt_{it + 1}"
            save_checkpoint(path, {
                "params": jax.device_get(params)["params"],
            })
            # orbax StandardCheckpointer rejects string leaves —
            # metadata rides in a JSON sidecar (read by
            # engine.checkpoint.graft_backbone)
            (outdir / "pretrain_meta.json").write_text(json.dumps({
                "pixel_mean": [float(v) for v in mean],
                "pixel_std": [float(v) for v in std],
                "norm": args.norm,
                "pretext": "masked-patch-recon",
                "steps": args.steps, "batch": args.batch,
                "size": args.size, "mask_ratio": args.mask_ratio,
                "scales": scales,
            }))
            print(f"saved {path}", flush=True)
    print("PRETRAIN_OK")


if __name__ == "__main__":
    main()
