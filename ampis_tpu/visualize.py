"""Visualization of images with instance masks overlaid.

Re-implementation of the reference's ampis/visualize.py (350 LoC) together
with its detectron2.utils.visualizer.Visualizer dependency (reference
visualize.py:14): mask/box/label overlay rendering is done here with numpy
compositing + PIL text, no detectron2/cv2 needed.

Public API preserved: ``random_colors`` (reference visualize.py:19-56),
``display_ddicts`` (:59-177), ``display_iset`` (:180-350), including the
``apply_correction`` fill-correction quirk (:333-337).
"""
from __future__ import annotations

import colorsys
from pathlib import Path

import matplotlib.pyplot as plt
import numpy as np

from . import structures
from . import rle as RLE
from .utils.io import imread_bgr


def random_colors(n, seed, bright=True):
    """Generate n visually distinct RGB colors (reference visualize.py:19).

    Colors are uniformly spaced hues in HSV, shuffled with a seeded
    RandomState for reproducibility.
    """
    rs = np.random.RandomState(seed=seed)
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = list(map(lambda c: colorsys.hsv_to_rgb(*c), hsv))
    rs.shuffle(colors)
    return np.asarray(colors)


# ---------------------------------------------------------------------------
# Visualizer (replaces detectron2.utils.visualizer.Visualizer)
# ---------------------------------------------------------------------------

class VisImage:
    def __init__(self, img: np.ndarray):
        self.img = img

    def get_image(self) -> np.ndarray:
        return self.img


class Visualizer:
    """Overlay instance masks, boxes, and labels on an image.

    API-compatible subset of detectron2's Visualizer used by the reference:
    ``overlay_instances(boxes, masks, labels, assigned_colors)``,
    ``draw_dataset_dict(ddict)``, ``draw_instance_predictions(instances)``.
    Rendering: alpha-blended mask fill, boundary emphasis, 2 px box
    outlines, PIL-drawn labels.
    """

    def __init__(self, img_rgb, metadata=None, scale=1.0, alpha=0.45):
        img = np.asarray(img_rgb)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        self.img = img.astype(np.float32).copy()
        if self.img.max() <= 1.0 + 1e-6 and self.img.dtype != np.uint8:
            # accept [0,1]-scaled input
            self.img *= 255.0
        self.metadata = metadata
        self.scale = scale
        self.alpha = alpha
        self.height, self.width = self.img.shape[:2]

    # -- mask conversion ----------------------------------------------------
    def _to_bitmask(self, mask) -> np.ndarray:
        if isinstance(mask, dict):  # RLE
            return RLE.decode(mask).astype(bool)
        if isinstance(mask, np.ndarray) and mask.ndim == 2:
            return mask.astype(bool)
        if isinstance(mask, (list, tuple)):  # polygon(s), flat coords
            from .utils.polygons import polygon2mask
            out = np.zeros((self.height, self.width), bool)
            polys = mask if isinstance(mask[0], (list, np.ndarray)) else [mask]
            for p in polys:
                p = np.asarray(p, np.float64).reshape(-1)
                out |= polygon2mask((self.height, self.width),
                                    np.stack([p[1::2], p[0::2]], axis=1))
            return out
        raise TypeError(f"unsupported mask type {type(mask)}")

    # -- drawing primitives -------------------------------------------------
    def _blend_mask(self, bitmask: np.ndarray, color_255: np.ndarray):
        a = self.alpha
        region = self.img[bitmask]
        self.img[bitmask] = region * (1 - a) + color_255 * a
        # boundary emphasis: edge pixels get near-opaque color
        edge = bitmask & ~(
            np.roll(bitmask, 1, 0) & np.roll(bitmask, -1, 0)
            & np.roll(bitmask, 1, 1) & np.roll(bitmask, -1, 1))
        self.img[edge] = self.img[edge] * 0.1 + color_255 * 0.9

    def _draw_box(self, box, color_255: np.ndarray, thickness=2):
        x0, y0, x1, y1 = [int(round(float(v))) for v in box]
        x0 = np.clip(x0, 0, self.width - 1)
        x1 = np.clip(x1, 0, self.width - 1)
        y0 = np.clip(y0, 0, self.height - 1)
        y1 = np.clip(y1, 0, self.height - 1)
        t = thickness
        self.img[y0:y0 + t, x0:x1 + 1] = color_255
        self.img[max(y1 - t + 1, 0):y1 + 1, x0:x1 + 1] = color_255
        self.img[y0:y1 + 1, x0:x0 + t] = color_255
        self.img[y0:y1 + 1, max(x1 - t + 1, 0):x1 + 1] = color_255

    def _draw_labels(self, labels, positions):
        texts = [(str(t), pos) for t, pos in zip(labels, positions)
                 if t and str(t).strip()]
        if not texts:
            return
        from PIL import Image, ImageDraw
        pil = Image.fromarray(self.img.clip(0, 255).astype(np.uint8))
        draw = ImageDraw.Draw(pil)
        for text, (x, y) in texts:
            draw.text((float(x), float(y)), text, fill=(255, 255, 255))
        self.img = np.asarray(pil).astype(np.float32)

    # -- public API ---------------------------------------------------------
    def overlay_instances(self, boxes=None, masks=None, labels=None,
                          assigned_colors=None) -> VisImage:
        n = 0
        for field in (boxes, masks, labels):
            if field is not None:
                n = len(field)
                break
        if assigned_colors is None:
            assigned_colors = random_colors(max(n, 1), seed=None)
        colors = np.asarray(assigned_colors, dtype=np.float64)
        if colors.ndim == 1:
            colors = np.tile(colors, (n, 1))

        positions = []
        for i in range(n):
            color = np.clip(colors[i][:3], 0, 1) * 255.0
            bm = None
            if masks is not None:
                m = masks[i] if not isinstance(masks, structures.RLEMasks) \
                    else masks.rle[i]
                bm = self._to_bitmask(m)
                self._blend_mask(bm, color)
            if boxes is not None:
                box = structures.boxes_to_array(boxes)[i] \
                    if not isinstance(boxes, np.ndarray) else boxes[i]
                self._draw_box(box, color)
                positions.append((box[0], box[1]))
            elif bm is not None and bm.any():
                ys, xs = np.nonzero(bm)
                positions.append((xs.min(), ys.min()))
            else:
                positions.append((0, 0))
        if labels is not None:
            self._draw_labels(labels, positions)
        return VisImage(self.img.clip(0, 255).astype(np.uint8))

    def draw_dataset_dict(self, ddict) -> VisImage:
        annos = ddict.get("annotations", [])
        boxes = np.asarray([a["bbox"] for a in annos], dtype=np.float64) \
            if annos else None
        masks = [a["segmentation"] for a in annos] if annos else None
        names = None
        if self.metadata is not None:
            names = (self.metadata.get("thing_classes")
                     if isinstance(self.metadata, dict)
                     else getattr(self.metadata, "thing_classes", None))
        labels = None
        if annos:
            if names:
                labels = [names[a["category_id"]] for a in annos]
            else:
                labels = [str(a["category_id"]) for a in annos]
        colors = random_colors(max(len(annos), 1), seed=0)
        return self.overlay_instances(boxes=boxes, masks=masks, labels=labels,
                                      assigned_colors=colors)

    def draw_instance_predictions(self, instances) -> VisImage:
        boxes = (structures.boxes_to_array(instances.pred_boxes)
                 if instances.has("pred_boxes") else None)
        masks = instances.pred_masks if instances.has("pred_masks") else None
        scores = instances.scores if instances.has("scores") else None
        classes = (np.asarray(instances.pred_classes)
                   if instances.has("pred_classes") else None)
        names = None
        if self.metadata is not None:
            names = (self.metadata.get("thing_classes")
                     if isinstance(self.metadata, dict)
                     else getattr(self.metadata, "thing_classes", None))
        labels = None
        if classes is not None:
            labels = []
            for i, cls in enumerate(classes):
                name = names[cls] if names and cls < len(names) else str(cls)
                if scores is not None:
                    labels.append(f"{name} {scores[i]:.0%}")
                else:
                    labels.append(name)
        colors = random_colors(max(len(instances), 1), seed=0)
        return self.overlay_instances(boxes=boxes, masks=masks, labels=labels,
                                      assigned_colors=colors)


# ---------------------------------------------------------------------------
# module-level display functions (reference API)
# ---------------------------------------------------------------------------

def display_ddicts(ddict, outpath=None, dataset='', gt=True, img_path=None,
                   suppress_labels=False, summary=True):
    """Overlay GT annotations (or predictions) on the image.

    Reference: visualize.py:59-177. Saves
    ``{dataset}-n={n}_{stem}.png`` under outpath, or shows the figure.
    """
    from .engine.catalog import MetadataCatalog

    if img_path is None:
        img_path = ddict['file_name']
    img_path = Path(img_path)

    if suppress_labels:
        if gt:
            ids = [x['category_id'] for x in ddict['annotations']]
        else:
            ids = ddict['instances'].pred_classes
        u = np.unique(np.asarray(ids))
        metadata = {'thing_classes': ['' for _ in u]}
    else:
        metadata = MetadataCatalog.get(dataset)

    visualizer = Visualizer(imread_bgr(str(img_path)), metadata=metadata,
                            scale=1)
    if gt:
        vis = visualizer.draw_dataset_dict(ddict)
        n = ddict['num_instances']
    else:
        vis = visualizer.draw_instance_predictions(ddict['instances'])
        n = len(ddict['instances'])

    fig, ax = plt.subplots(figsize=(5, 3), dpi=300)
    ax.imshow(vis.get_image())
    ax.axis('off')
    ax.set_title('{}\n{}'.format(dataset, img_path.name))
    fig.tight_layout()
    if outpath is not None:
        fig_path = Path(outpath, '{}-n={}_{}.png'.format(
            dataset, n, img_path.stem))
        fig.savefig(fig_path, bbox_inches='tight')
    else:
        plt.show()
    plt.close(fig)

    if summary:
        print('ddict info:\n\tpath: {}\n\tnum_instances: {}'.format(
            img_path, n))


def display_iset(img, iset, metadata=None, show_class_idx=False,
                 show_scores=False, ax=None, colors=None,
                 apply_correction=False, get_img=False):
    """Overlay the instances in ``iset`` on ``img``.

    Reference: visualize.py:180-350, including the hollow-mask fill
    correction (:333-337) used by the analyze perf visualizations.
    """
    if colors is None and iset.instances.has('colors'):
        colors = iset.instances.colors

    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)

    V = Visualizer(img, metadata, scale=1)

    if show_class_idx:
        extra = ': ' if show_scores else ''
        class_idx = ['{}{}'.format(metadata['thing_classes'][idx], extra)
                     for idx in iset.instances.class_idx]
    else:
        class_idx = ['' for _ in range(len(iset.instances))]

    if show_scores:
        scores = ['{:.3f}'.format(x) for x in iset.instances.scores]
    else:
        scores = ['' for _ in range(len(iset.instances))]

    labels = ['{}{}'.format(idx, score)
              for idx, score in zip(class_idx, scores)]

    if iset.instances.has('masks'):
        masks = iset.instances.masks
        if isinstance(masks, structures.RLEMasks):
            masks = masks.rle
        if isinstance(masks, dict):
            masks = [masks]
    else:
        masks = None

    boxes = iset.instances.boxes if iset.instances.has('boxes') else None

    vis = V.overlay_instances(boxes=boxes, masks=masks, labels=labels,
                              assigned_colors=colors)
    vis_img = vis.get_image()

    if apply_correction:
        bitmasks = structures.masks_to_bitmask_array(iset)
        bitmasks_reduced = np.logical_or.reduce(bitmasks, axis=0)
        mask_correction = np.logical_not(bitmasks_reduced)
        vis_img[mask_correction] = img[mask_correction]

    if get_img:
        return vis_img
    elif ax is None:
        fig, ax = plt.subplots(figsize=(10, 7), dpi=150)
        ax.imshow(vis_img)
        ax.axis('off')
        plt.show()
    else:
        ax.imshow(vis_img)
        ax.axis('off')
