import json

import numpy as np
import pytest

from ampis_tpu import data_utils, rle
from ampis_tpu.structures import BoxMode


class TestExtractBoxes:
    def test_detectron2_mode(self):
        m = np.zeros((10, 12), bool)
        m[2:5, 3:8] = True
        box = data_utils.extract_boxes(m)[0]
        assert list(box) == [3, 2, 7, 4]
        assert box.dtype == np.float64

    def test_matterport_mode(self):
        m = np.zeros((10, 12, 1), bool)
        m[2:5, 3:8, 0] = True
        box = data_utils.extract_boxes(m, mask_mode='matterport',
                                       box_mode='matterport')[0]
        assert list(box) == [2, 5, 3, 8]
        assert box.dtype == np.int64

    def test_empty_mask(self):
        box = data_utils.extract_boxes(np.zeros((5, 5), bool))[0]
        assert list(box) == [0, 0, 0, 0]


class TestGetDdictsVia2:
    def test_powder_training(self, reference_root):
        path = (reference_root / "examples/powder/data/via_2.0.8/"
                "via_powder_particle_masks_training.json")
        dd = data_utils.get_ddicts('via2', path, dataset_class='Training')
        assert len(dd) == 4
        counts = sorted(d['num_instances'] for d in dd)
        assert counts == [219, 259, 293, 351]  # SURVEY §6 instance density
        d0 = dd[0]
        assert d0['mask_format'] == 'polygon'
        assert d0['height'] == 1024 and d0['width'] == 1536
        assert d0['HFW'] == '1036 um'
        a = d0['annotations'][0]
        assert a['bbox_mode'] == BoxMode.XYXY_ABS
        assert a['category_id'] == 0
        poly = a['segmentation'][0]
        # +0.5 center offset applied (reference data_utils.py:467)
        assert all((p * 2) % 1 == 0 and p % 1 == 0.5 for p in poly[:4])

    def test_validation(self, reference_root):
        path = (reference_root / "examples/powder/data/via_2.0.8/"
                "via_powder_particle_masks_validation.json")
        dd = data_utils.get_ddicts('via2', path)
        assert len(dd) == 1
        assert dd[0]['num_instances'] == 238


class TestGetDdictsBinary:
    def test_spheroidite(self, reference_root):
        root = reference_root / "examples/spheroidite/data"
        dd = data_utils.get_ddicts('binary', root / "images",
                                   root / "annotations", pattern='train_*')
        assert len(dd) == 8
        d0 = dd[0]
        assert d0['mask_format'] == 'bitmask'
        assert d0['num_instances'] > 10
        seg = d0['annotations'][0]['segmentation']
        assert isinstance(seg, dict) and 'counts' in seg
        # masks don't overlap and cover the annotation foreground
        total = sum(int(rle.area(a['segmentation']))
                    for a in d0['annotations'])
        from ampis_tpu.utils.io import imread
        ann = imread(d0['annotation_file'])
        assert total == int(ann.astype(bool).sum())


class TestGetDdictsLabelAndRLE:
    def test_label_npy(self, tmp_path):
        im_dir = tmp_path / "img"
        ann_dir = tmp_path / "ann"
        im_dir.mkdir()
        ann_dir.mkdir()
        lab = np.zeros((16, 16), np.int32)
        lab[2:6, 2:6] = 1
        lab[10:14, 8:15] = 2
        np.save(ann_dir / "a.npy", lab)
        from PIL import Image
        Image.fromarray(np.zeros((16, 16), np.uint8)).save(im_dir / "a.png")
        dd = data_utils.get_ddicts('label', im_dir, ann_dir)
        assert len(dd) == 1
        assert dd[0]['num_instances'] == 2
        areas = [int(rle.area(a['segmentation']))
                 for a in dd[0]['annotations']]
        assert sorted(areas) == [16, 28]

    def test_rle_json(self, tmp_path):
        m = np.zeros((8, 8), np.uint8, order='F')
        m[1:4, 1:4] = 1
        r = rle.encode(m)
        data = [{'file_name': 'img0.png',
                 'segmentations': [
                     {'size': r['size'],
                      'counts': r['counts'].decode('utf-8')}]}]
        p = tmp_path / "anns.json"
        with open(p, 'w') as f:
            json.dump(data, f)
        dd = data_utils.get_ddicts('rle', p)
        assert len(dd) == 1
        a = dd[0]['annotations'][0]
        assert int(rle.area(a['segmentation'])) == 9
        assert list(a['bbox']) == [1, 1, 3, 3]

    def test_loader_concatenates_dataset_tuple(self, tmp_path):
        """cfg.DATASETS.TRAIN tuple semantics: loader_from_config over
        (a, b) pools both registries' ddicts (self-training appends a
        pseudo-label dataset this way)."""
        from ampis_tpu.engine import DatasetCatalog, get_cfg
        from ampis_tpu.engine.data import loader_from_config

        def mk(n, ni):
            return [{'file_name': f'{n}_{i}.png', 'height': 8, 'width': 8,
                     'annotations': []} for i in range(ni)]
        for name, ni in (("_cat_a", 2), ("_cat_b", 3)):
            if name not in DatasetCatalog.list():
                DatasetCatalog.register(name, lambda n=name, k=ni: mk(n, k))
        cfg = get_cfg()
        loader = loader_from_config(cfg, ("_cat_a", "_cat_b"), train=False)
        assert len(loader.ddicts) == 5
        loader = loader_from_config(cfg, "_cat_a", train=False)
        assert len(loader.ddicts) == 2

    def test_bad_format_raises(self):
        with pytest.raises(ValueError, match="rle"):
            data_utils.get_ddicts('nope', '/tmp')


class TestCompressAndFormat:
    def test_compress_dense_masks(self):
        from ampis_tpu.structures import Instances
        masks = np.zeros((2, 10, 10), bool)
        masks[0, 1:3, 1:3] = True
        masks[1, 5:9, 5:9] = True
        pred = Instances((10, 10), pred_masks=masks,
                         pred_boxes=np.zeros((2, 4), np.float32),
                         scores=np.ones(2, np.float32),
                         pred_classes=np.zeros(2, np.int64))
        out = data_utils.format_outputs('f.png', 'Train',
                                        {'instances': pred})
        assert out['file_name'] == 'f.png'
        inst = out['pred']['instances']
        assert isinstance(inst.pred_masks[0], dict)
        assert int(rle.area(inst.pred_masks[0])) == 4
        assert isinstance(inst.pred_boxes, np.ndarray)
