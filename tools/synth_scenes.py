#!/usr/bin/env python
"""Procedural SEM powder-scene generator for full-detector pretraining.

The reference workflow's quality comes from COCO transfer learning
(reference GETTING_STARTED.md:13,30 fine-tunes model_final_f10217.pkl);
this environment has no egress, so this tool synthesizes the pretraining
data instead: unlimited SEM-like dense powder scenes with EXACT instance
masks, statistically matched to the shipped powder example
(/root/reference/examples/powder/data/) --

* particle equivalent-circle diameters: log-normal fit of the shipped
  VIA training polygons (log d: mu 3.73, sigma 0.83 at 1536x1024 scale),
  truncated to the observed [8, 300] px range;
* satellite diameters: log-normal (log d: mu 2.66, sigma 0.50; median
  14 px, p95 ~35 px), attached to host-particle boundaries;
* gray statistics: background 21 +- 18, particle pixels 121 +- 46,
  pixel coverage ~0.65 (measured on Sc1Tile_001-001 against its GT);
* annotation conventions measured from the shipped GT: attached
  satellites are NOT separate particle instances (best sat-vs-particle
  IoU 0/201 above 0.5) but their area IS inside the host polygon (mean
  coverage 0.97) -- so a particle instance mask here is the visible
  union of the host and its attached satellites, while the satellite
  JSON annotates the attached satellites alone.

Rendering: painter's algorithm over per-particle z draws shaded
Fourier-perturbed spheroids (lambertian term + SEM edge-glow rim +
multi-octave value-noise surface texture) into an id map; visible-region
masks come from the id map, so occlusion boundaries are pixel-exact.

Output (get_ddicts 'rle' format, the same schema tools/pseudo_label.py
emits):
    <out>/scenes/scene_%04d.png      grayscale uint8
    <out>/particles.json             all particles (hosts merged w/ sats)
    <out>/satellites.json            attached satellites only
    <out>/meta.json                  generator parameters + seed

Usage:
    python tools/synth_scenes.py --out runs/synth --n 192 --size 704
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
from scipy import ndimage

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ampis_tpu import rle as RLE  # noqa: E402


def value_noise(shape, rng, octaves=((32, 0.5), (12, 0.33), (4, 0.17))):
    """Multi-octave bicubic value noise, ~N(0, 1) overall."""
    out = np.zeros(shape, np.float32)
    for wl, amp in octaves:
        g = rng.standard_normal(
            (shape[0] // wl + 4, shape[1] // wl + 4)).astype(np.float32)
        z = ndimage.zoom(g, wl, order=3, mode="nearest")
        out += amp * z[:shape[0], :shape[1]]
    return out / max(np.std(out), 1e-6)


def _shape_radius(theta, r0, coeffs):
    """Fourier-perturbed radius rho(theta); coeffs = [(k, a_k, phi_k)]."""
    rho = np.ones_like(theta)
    for k, a, phi in coeffs:
        rho = rho + a * np.cos(k * theta + phi)
    return r0 * np.clip(rho, 0.55, 1.6)


class Particle:
    __slots__ = ("cx", "cy", "d", "z", "coeffs", "aspect", "rot", "base",
                 "rim_amp", "rim_w", "tex_amp", "irr", "host", "sats",
                 "flat")

    def __init__(self, cx, cy, d, z, rng, irregular=False, host=None):
        self.cx, self.cy, self.d, self.z = cx, cy, d, z
        self.host = host            # Particle this satellite sits on
        self.sats = []
        self.irr = (rng.uniform(0.10, 0.28) if irregular
                    else rng.uniform(0.015, 0.06))
        self.coeffs = [(k, self.irr * rng.standard_normal() / (k - 1),
                        rng.uniform(0, 2 * np.pi)) for k in range(2, 7)]
        self.aspect = rng.uniform(0.82, 1.0) if not irregular else \
            rng.uniform(0.6, 1.0)
        self.rot = rng.uniform(0, np.pi)
        self.base = float(np.clip(rng.normal(133, 24), 75, 200))
        self.rim_amp = float(np.clip(rng.normal(55, 18), 15, 100))
        self.rim_w = rng.uniform(1.3, 3.2)
        self.tex_amp = (rng.uniform(0.15, 0.35) if irregular
                        else rng.uniform(0.06, 0.20))
        self.flat = rng.uniform(0.45, 1.0) if irregular else 1.0

    def render(self, img, idmap, zmap, noise, light, idx, rng):
        """Paint this particle where it is in front (painter + z test)."""
        H, W = img.shape
        rmax = self.d / 2 * 1.7 + 3
        y0, y1 = int(max(0, self.cy - rmax)), int(min(H, self.cy + rmax + 1))
        x0, x1 = int(max(0, self.cx - rmax)), int(min(W, self.cx + rmax + 1))
        if y0 >= y1 or x0 >= x1:
            return False
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        dx, dy = xx - self.cx, yy - self.cy
        c, s = np.cos(self.rot), np.sin(self.rot)
        u = (c * dx + s * dy)
        v = (-s * dx + c * dy) / self.aspect
        rad = np.hypot(u, v) + 1e-6
        theta = np.arctan2(v, u)
        rho = _shape_radius(theta, self.d / 2, self.coeffs)
        nr = rad / rho
        inside = nr <= 1.0
        if not inside.any():
            return False
        zlift = self.z + (self.host.z if self.host is not None else 0)
        front = inside & (zlift > zmap[y0:y1, x0:x1])
        if not front.any():
            return False
        # unit-sphere normal from the normalized footprint
        nz = np.sqrt(np.clip(1.0 - nr * nr, 0.0, 1.0))
        nxy = np.clip(nr, 0, 1)
        nx = nxy * (u / rad)
        ny = nxy * (v / rad)
        lam = np.clip(nx * light[0] + ny * light[1]
                      + (nz ** self.flat) * light[2], 0, 1.2)
        shade = 0.42 + 0.62 * lam + 0.22 * np.clip(lam, 0, 1) ** 8
        rim = self.rim_amp * np.exp(-(1.0 - nr) * (self.d / 2) / self.rim_w)
        # per-particle texture phase: sample the noise field at a random
        # toroidal offset (cheaper than rolling the full field)
        oy = int(rng.integers(0, noise.shape[0]))
        ox = int(rng.integers(0, noise.shape[1]))
        iy = (np.arange(y0, y1) + oy) % noise.shape[0]
        ix = (np.arange(x0, x1) + ox) % noise.shape[1]
        tex = 1.0 + self.tex_amp * noise[np.ix_(iy, ix)]
        val = (self.base * shade + rim) * np.clip(tex, 0.3, 2.0)
        img[y0:y1, x0:x1][front] = val[front]
        idmap[y0:y1, x0:x1][front] = idx
        zmap[y0:y1, x0:x1][front] = zlift
        return True


def make_scene(rng, size=704, max_parts=120, max_sats=60):
    H = W = size
    scale = rng.uniform(0.7, 1.35)
    target_cov = rng.uniform(0.48, 0.75)
    parts = []
    # coverage tracked on an 8x-coarse grid (placement only needs ~1%)
    cg = 8
    cover = np.zeros((H // cg, W // cg), bool)
    cyy, cxx = np.mgrid[0:H // cg, 0:W // cg].astype(np.float32)
    tries = 0
    while cover.mean() < target_cov and len(parts) < max_parts and tries < 600:
        tries += 1
        d = float(np.exp(rng.normal(3.73, 0.83))) * scale * (size / 1024.0)
        d = float(np.clip(d, 7.0, 0.75 * size))
        cx = rng.uniform(-0.12 * d, W + 0.12 * d)
        cy = rng.uniform(-0.12 * d, H + 0.12 * d)
        p = Particle(cx, cy, d, rng.uniform(0.1, 1.0), rng,
                     irregular=rng.uniform() < 0.16)
        parts.append(p)
        cover |= ((cxx - cx / cg) ** 2 + (cyy - cy / cg) ** 2
                  <= (d / (2 * cg)) ** 2)
    # attached satellites on large hosts
    n_sats = 0
    for host in list(parts):
        if host.d < 42 * scale * (size / 1024.0) or n_sats >= max_sats:
            continue
        for _ in range(rng.poisson(0.65)):
            if n_sats >= max_sats:
                break
            sd = float(np.exp(rng.normal(2.66, 0.50))) * scale * (size / 1024.0)
            sd = float(np.clip(sd, 4.5, 0.42 * host.d))
            ang = rng.uniform(0, 2 * np.pi)
            # on the host silhouette: radius at that angle
            c, s = np.cos(host.rot), np.sin(host.rot)
            # invert the ellipse transform approximately via sampling
            th = np.arctan2(np.sin(ang) / host.aspect, np.cos(ang))
            rr = _shape_radius(np.array([th]), host.d / 2, host.coeffs)[0]
            rr = rr * rng.uniform(0.9, 1.06)
            sx = host.cx + rr * np.cos(ang)
            sy = host.cy + rr * np.sin(ang)
            sat = Particle(sx, sy, sd, rng.uniform(0.05, 0.4), rng,
                           irregular=rng.uniform() < 0.1, host=host)
            host.sats.append(sat)
            parts.append(sat)
            n_sats += 1
    # render back-to-front
    img = np.zeros((H, W), np.float32)
    idmap = np.full((H, W), -1, np.int32)
    zmap = np.full((H, W), -np.inf, np.float32)
    # fine-grained bumpy surface texture for particles
    noise = value_noise((H, W), rng,
                        octaves=((12, 0.50), (5, 0.35), (2, 0.15)))
    # background: dark with smooth structure + a few out-of-focus blobs
    bg_noise = value_noise((H, W), rng, octaves=((64, 0.7), (16, 0.3)))
    img[:] = np.clip(19.0 + 7.0 * bg_noise, 2, 55)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(rng.integers(2, 8)):
        bd = rng.uniform(8, 60)
        bx, by = rng.uniform(0, W), rng.uniform(0, H)
        blob = np.exp(-(((xx - bx) ** 2 + (yy - by) ** 2)
                        / (bd / 2) ** 2)).astype(np.float32)
        img += rng.uniform(8, 25) * blob
    ldir = np.array([rng.uniform(-0.45, 0.45), rng.uniform(-0.45, 0.45),
                     rng.uniform(0.75, 0.95)])
    ldir /= np.linalg.norm(ldir)
    order = sorted(range(len(parts)),
                   key=lambda i: parts[i].z
                   + (parts[i].host.z if parts[i].host is not None else 0))
    rendered = set()
    for i in order:
        if parts[i].render(img, idmap, zmap, noise, ldir, i, rng):
            rendered.add(i)
    # finish: focus blur + detector noise
    img = ndimage.gaussian_filter(img, rng.uniform(0.45, 0.8))
    img += rng.normal(0, rng.uniform(3.5, 6.5), img.shape).astype(np.float32)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, idmap, parts, rendered


def masks_from_idmap(idmap, parts, rendered):
    """Visible-region instance masks per annotation convention (docstring).

    Returns (particle_masks, satellite_masks) as lists of bool arrays.
    """
    H, W = idmap.shape
    flat = idmap.ravel()
    # visible pixel count per id
    counts = np.bincount(flat[flat >= 0], minlength=len(parts))
    particle_masks, satellite_masks = [], []
    for i, p in enumerate(parts):
        if p.host is not None:
            continue                      # satellites merge into their host
        ids = [i] + [parts.index(s) for s in p.sats]
        ids = [j for j in ids if j in rendered]
        if not ids:
            continue
        vis = int(sum(counts[j] for j in ids))
        full = np.pi * (p.d / 2) ** 2
        if vis < 25 or vis < 0.10 * full:
            continue
        m = np.isin(idmap, ids)
        particle_masks.append(m)
    for i, p in enumerate(parts):
        if p.host is None or i not in rendered:
            continue
        vis = int(counts[i])
        full = np.pi * (p.d / 2) ** 2
        if vis < 10 or vis < 0.30 * full:
            continue
        satellite_masks.append(idmap == i)
    return particle_masks, satellite_masks


def encode(masks):
    segs = []
    for m in masks:
        r = RLE.encode(np.asfortranarray(m.astype(np.uint8)))
        segs.append({"size": [int(r["size"][0]), int(r["size"][1])],
                     "counts": r["counts"].decode("ascii")})
    return segs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/synth")
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--size", type=int, default=704)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix", default="scene")
    args = ap.parse_args()
    out = Path(args.out)
    (out / "scenes").mkdir(parents=True, exist_ok=True)
    from PIL import Image
    t0 = time.time()
    part_entries, sat_entries = [], []
    npart = nsat = 0
    for i in range(args.n):
        rng = np.random.default_rng(args.seed * 1000003 + i)
        img, idmap, parts, rendered = make_scene(rng, size=args.size)
        pm, sm = masks_from_idmap(idmap, parts, rendered)
        name = f"scenes/{args.prefix}_{i:04d}.png"
        Image.fromarray(img).save(out / name)
        if pm:
            part_entries.append({"file_name": name,
                                 "segmentations": encode(pm)})
        if sm:
            sat_entries.append({"file_name": name,
                                "segmentations": encode(sm)})
        npart += len(pm)
        nsat += len(sm)
        if (i + 1) % 20 == 0:
            print(f"  {i + 1}/{args.n} scenes, {npart} particles, "
                  f"{nsat} satellites, {time.time() - t0:.0f}s", flush=True)
    (out / "particles.json").write_text(json.dumps(part_entries))
    (out / "satellites.json").write_text(json.dumps(sat_entries))
    (out / "meta.json").write_text(json.dumps({
        "n": args.n, "size": args.size, "seed": args.seed,
        "particles": npart, "satellites": nsat,
        "generator": "tools/synth_scenes.py",
        "elapsed_s": round(time.time() - t0, 1)}))
    print(f"wrote {args.n} scenes ({npart} particle / {nsat} satellite "
          f"instances) to {out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
