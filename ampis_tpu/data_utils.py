"""Dataset loading, training helpers, and output formatting.

Re-implementation of the reference's ampis/data_utils.py (559 LoC):
``get_ddicts`` ingests the four annotation formats (binary / label images,
VIA 2 polygon JSON, RLE JSON), ``extract_boxes`` derives bounding boxes from
masks, ``compress_pred``/``format_outputs`` produce the on-disk prediction
schema, and ``AmpisTrainer``/``LossEvalHook`` add validation-loss tracking to
the training engine (here: the JAX trainer in ampis_tpu.engine, not
detectron2's DefaultTrainer).

Reference quirks intentionally fixed (SURVEY.md §2c): numpy>=1.24-dead
``np.bool/np.int/np.float`` aliases; the error message at reference
data_utils.py:530 that omitted the supported 'rle' format; the junk
``timetest=12`` scalar written every iteration (reference data_utils.py:132).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from . import rle as RLE
from .structures import BoxMode
from .utils.io import imread


# ---------------------------------------------------------------------------
# training hooks (validation loss) — see engine/trainer.py for the loop
# ---------------------------------------------------------------------------

class LossEvalHook:
    """Adds validation-loss statistics during training.

    Reference: data_utils.py:37-132 (a detectron2 HookBase). Every
    ``eval_period`` iterations (and at the final iteration) the training-mode
    loss is evaluated over the validation loader and written to the
    trainer's event storage as ``validation_loss`` plus per-component
    ``valid_<k>`` scalars.

    The heavy lifting runs inside the jitted eval-loss step that the trainer
    exposes (the same compiled family as the train step, without the
    parameter update), so this hook is a thin host-side accumulator.
    """

    def __init__(self, eval_period, model=None, data_loader=None):
        self._period = eval_period
        self._model = model
        self._data_loader = data_loader
        self.trainer = None  # set by trainer on registration

    def _do_loss_eval(self):
        losses = []
        metrics_dicts = []
        for inputs in self._data_loader:
            loss_batch, metrics_dict = self._get_loss(inputs)
            losses.append(loss_batch)
            metrics_dicts.append(metrics_dict)
        if not losses:
            return []
        mean_loss = float(np.mean(losses))
        valid_losses_all = np.asarray(
            [list(md.values()) for md in metrics_dicts]).mean(axis=0)
        rec = {'validation_loss': mean_loss}
        for k, v in zip(metrics_dicts[-1].keys(), valid_losses_all):
            rec['valid_' + k] = float(v)
        for k, v in rec.items():
            self.trainer.storage.put_scalar(k, v)
        self.trainer.storage.write_record(self.trainer.storage.iter, rec)
        return losses

    def _get_loss(self, data):
        metrics_dict = self.trainer.eval_loss(data)
        metrics_dict = {k: float(v) for k, v in metrics_dict.items()}
        total = sum(metrics_dict.values())
        return total, metrics_dict

    def after_step(self):
        next_iter = self.trainer.iter + 1
        is_final = next_iter == self.trainer.max_iter
        if is_final or (self._period > 0 and next_iter % self._period == 0):
            self._do_loss_eval()


def AmpisTrainer(cfg, val_dataset=None):
    """Trainer with validation-loss metrics during training.

    Reference: data_utils.py:135-177 (DefaultTrainer subclass). Returns the
    JAX trainer from ampis_tpu.engine with a LossEvalHook registered on
    ``cfg.SOLVER.CHECKPOINT_PERIOD``.
    """
    from .engine.trainer import Trainer

    if val_dataset is None:
        val_dataset = cfg.DATASETS.TEST[0]
    trainer = Trainer(cfg)
    hook = LossEvalHook(cfg.SOLVER.CHECKPOINT_PERIOD,
                        data_loader=trainer.build_val_loader(val_dataset))
    trainer.register_hook(hook, index=-1)
    trainer.val_dataset = val_dataset
    return trainer


# ---------------------------------------------------------------------------
# box extraction (reference data_utils.py:180-252)
# ---------------------------------------------------------------------------

def extract_boxes(masks, mask_mode='detectron2', box_mode='detectron2'):
    """Bounding boxes from boolean masks.

    Reference: data_utils.py:180-252. 'detectron2' conventions: masks
    (n, r, c), boxes [x1, y1, x2, y2] float; 'matterport': masks (r, c, n),
    boxes [r1, r2, c1, c2] int (end indices exclusive). Empty masks produce
    zero boxes.
    """
    if masks.ndim == 2:
        masks = masks[np.newaxis, :, :]
    elif mask_mode == 'matterport':
        masks = masks.transpose((2, 0, 1))

    dtype = np.float64 if box_mode == 'detectron2' else np.int64
    boxes = np.zeros((masks.shape[0], 4), dtype=dtype)
    for i, m in enumerate(masks):
        horizontal = np.where(np.any(m, axis=0))[0]
        vertical = np.where(np.any(m, axis=1))[0]
        if horizontal.shape[0]:
            x1, x2 = horizontal[[0, -1]]
            y1, y2 = vertical[[0, -1]]
        else:
            x1, x2, y1, y2 = 0, 0, 0, 0
        if box_mode == 'detectron2':
            boxes[i] = np.array([x1, y1, x2, y2], dtype=dtype)
        else:
            boxes[i] = np.array([y1, y2 + 1, x1, x2 + 1], dtype=dtype)
    return boxes


# ---------------------------------------------------------------------------
# prediction compression / formatting (reference data_utils.py:255-310)
# ---------------------------------------------------------------------------

def compress_pred(pred):
    """Compress predicted masks to RLE and other fields to numpy in-place.

    Reference: data_utils.py:255-279 (per-instance GPU->CPU->C encode loop).
    Here the hot path never materializes full-resolution bitmasks: when the
    predictor attaches soft low-res masks (ampis_tpu SoftMasks), paste +
    threshold + RLE-encode happen fused in one multithreaded C++ pass.
    """
    masks = pred.pred_masks
    if hasattr(masks, 'to_rle'):  # SoftMasks fast path
        pred.pred_masks = masks.to_rle()
    elif isinstance(masks, list) and (not masks or isinstance(masks[0], dict)):
        pass  # already RLE
    else:
        arr = np.asarray(getattr(masks, 'tensor', masks))
        if arr.ndim == 2:
            arr = arr[None]
        pred.pred_masks = [
            RLE.encode(np.asfortranarray(m.astype(np.uint8))) for m in arr]
    pred.pred_boxes = np.asarray(
        getattr(pred.pred_boxes, 'tensor', pred.pred_boxes), dtype=np.float32)
    pred.scores = np.asarray(pred.scores)
    pred.pred_classes = np.asarray(pred.pred_classes)
    return pred


def format_outputs(filename, dataset, pred):
    """Wrap compressed predictions in the on-disk result schema.

    Reference: data_utils.py:282-310. Schema: {'file_name', 'dataset',
    'pred': {'instances': Instances}} — pinned by the shipped pickles.
    """
    compress_pred(pred['instances'])
    return {'file_name': filename,
            'dataset': dataset,
            'pred': pred}


# ---------------------------------------------------------------------------
# dataset ingestion (reference data_utils.py:313-532)
# ---------------------------------------------------------------------------

def get_ddicts(label_fmt, im_root, ann_root=None, pattern='*',
               dataset_class=None):
    """Read images + ground-truth annotations into data dicts.

    Reference: data_utils.py:313-532. Four annotation formats:

    * ``binary``: per-image binary mask images/.npy; connected components
      (8-connectivity) split instances.
    * ``label``: per-image label images/.npy; unique pixel values are
      instance ids.
    * ``via2``: VGG Image Annotator v2 JSON polygons (+0.5 px center
      offset, reference data_utils.py:467).
    * ``rle``: JSON list of utf-8 RLE dicts per image.

    All labels are single-class (category_id=0). Output ddict keys:
    file_name, annotation_file, height, width, mask_format, image_id,
    dataset_class, HFW (via2 only), annotations[{bbox, bbox_mode,
    segmentation, category_id}], num_instances.
    """
    cwd = Path()
    im_root = Path(im_root)
    ann_root = Path(ann_root) if ann_root else None
    ddicts = []

    if label_fmt.lower() in ['binary', 'label']:
        img_paths = sorted(Path(im_root).glob(pattern))
        for idx, p in enumerate(img_paths):
            file_annotations = sorted(
                Path(ann_root).glob('*{}*'.format(p.stem)))
            n = len(file_annotations)
            assert n == 1, (f'There must be exactly 1 annotation file for '
                            f'{p.name}, but {n} were found')
            ann_path = file_annotations[0]
            try:
                ann_path = ann_path.relative_to(cwd)
            except ValueError:
                pass

            ann = (np.load(str(ann_path)) if ann_path.suffix == '.npy'
                   else imread(str(ann_path)))
            height, width = ann.shape[:2]
            try:
                file_name = str(p.relative_to(cwd))
            except ValueError:
                file_name = str(p)
            ddict = {'file_name': file_name,
                     'annotation_file': str(ann_path),
                     'height': height,
                     'width': width,
                     'mask_format': 'bitmask',
                     'image_id': idx,
                     'dataset_class': dataset_class}

            if label_fmt == 'binary':
                ann, _ = RLE.label(ann.astype(bool))

            unique = np.unique(ann)
            if unique[0] == 0:
                unique = unique[1:]

            annotations = []
            for u in unique:
                mask = ann == u
                bbox = extract_boxes(mask)[0]
                mask = RLE.encode(np.asfortranarray(mask.astype(np.uint8)))
                annotations.append({'bbox': bbox,
                                    'bbox_mode': BoxMode.XYXY_ABS,
                                    'segmentation': mask,
                                    'category_id': 0})
            ddict['annotations'] = annotations
            ddict['num_instances'] = len(annotations)
            ddicts.append(ddict)

    elif label_fmt.lower() == 'via2':
        with open(Path(im_root), 'rb') as f:
            j = json.load(f)

        img_dir = Path(im_root.parent,
                       j['_via_settings']['core']['default_filepath'])

        for idx, annos in enumerate(j['_via_img_metadata'].values()):
            filename = Path(img_dir, annos['filename'])
            size = annos['file_attributes'].get('Size (width, height)', None)
            if size:
                width, height = tuple(int(x) for x in size.split(', '))
            else:
                im = imread(filename, as_gray=True)
                height, width = im.shape
            hfw = annos['file_attributes'].get('HFW', None)

            try:
                file_name = str(filename.relative_to(cwd))
            except ValueError:
                file_name = str(filename)
            ddict = {'file_name': file_name,
                     'annotation_file': im_root.name,
                     'height': height,
                     'width': width,
                     'mask_format': 'polygon',
                     'image_id': idx,
                     'HFW': hfw,
                     'dataset_class': dataset_class}

            annotations = []
            for obj in annos['regions']:
                shape = obj['shape_attributes']
                px = shape['all_points_x']
                py = shape['all_points_y']
                poly = [(x + 0.5, y + 0.5) for x, y in zip(px, py)]
                poly = [p for x in poly for p in x]
                annotations.append({
                    'bbox': np.asarray((np.min(px), np.min(py),
                                        np.max(px), np.max(py))),
                    'bbox_mode': BoxMode.XYXY_ABS,
                    'segmentation': [poly],
                    'category_id': 0,
                })
            ddict['annotations'] = annotations
            ddict['num_instances'] = len(annotations)
            ddicts.append(ddict)

    elif label_fmt.lower() == 'rle':
        im_root = Path(im_root)
        with open(im_root, 'r') as f:
            data = json.load(f)
        # encode strings back to binary for the codec
        for i, anns in enumerate(data):
            for jj, ann in enumerate(anns['segmentations']):
                data[i]['segmentations'][jj]['counts'] = \
                    ann['counts'].encode('utf-8')

        for idx, p in enumerate(data):
            n = Path(p['file_name'])
            img_path = Path(im_root.parent, n)
            ann = p['segmentations']
            height, width = ann[0]['size']

            try:
                file_name = str(img_path.relative_to(cwd))
            except ValueError:
                file_name = str(img_path)
            ddict = {'file_name': file_name,
                     'annotation_file': str(im_root),
                     'height': height,
                     'width': width,
                     'mask_format': 'bitmask',
                     'image_id': idx,
                     'dataset_class': dataset_class}

            annotations = []
            for mask in ann:
                d = RLE.decode(mask)
                bbox = extract_boxes(d)[0]
                annotations.append({'bbox': bbox,
                                    'bbox_mode': BoxMode.XYXY_ABS,
                                    'segmentation': mask,
                                    'category_id': 0})
            ddict['annotations'] = annotations
            ddict['num_instances'] = len(annotations)
            ddicts.append(ddict)

    else:
        raise ValueError(
            "label_fmt must be 'binary', 'label', 'via2', or 'rle'")

    return ddicts
