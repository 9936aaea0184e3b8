import numpy as np
import pytest

from ampis_tpu import rle as RLE
from ampis_tpu.structures import (BitMasks, BoxMode, Boxes, InstanceSet,
                                  Instances, PolygonMasks, RLEMasks,
                                  boxes_to_array, mask_areas,
                                  masks_to_bitmask_array, masks_to_rle)


def _rles(n=4, h=20, w=30, seed=0):
    rs = np.random.RandomState(seed)
    masks = np.zeros((h, w, n), np.uint8, order="F")
    for i in range(n):
        r0, c0 = rs.randint(0, h - 5), rs.randint(0, w - 5)
        masks[r0:r0 + 5, c0:c0 + 5, i] = 1
    return RLE.encode(masks), masks


class TestRLEMasks:
    def test_indexing(self):
        rles, _ = _rles()
        m = RLEMasks(rles)
        assert len(m) == 4
        assert m[1].rle == rles[1]  # int -> wrapped bare dict
        assert m[1:3].rle == rles[1:3]
        assert m[[0, 2]].rle == [rles[0], rles[2]]
        assert m[np.array([3, 1])].rle == [rles[3], rles[1]]
        assert m[np.array([True, False, True, False])].rle == \
            [rles[0], rles[2]]
        assert m[[True, False, False, True]].rle == [rles[0], rles[3]]

    def test_invalid_raises_exception(self):
        m = RLEMasks(_rles()[0])
        with pytest.raises(Exception):
            m[{"bad": 1}]


class TestInstances:
    def test_fields_and_indexing(self):
        rles, _ = _rles()
        inst = Instances((20, 30), masks=RLEMasks(rles),
                         boxes=np.arange(16).reshape(4, 4),
                         class_idx=np.zeros(4, np.int64))
        assert len(inst) == 4
        assert inst.has("masks") and not inst.has("scores")
        sub = inst[np.array([True, False, True, False])]
        assert len(sub) == 2
        assert len(sub.masks) == 2
        assert sub.boxes.shape == (2, 4)
        sub2 = inst[[2]]
        assert len(sub2) == 1
        assert sub2.boxes[0, 0] == 8

    def test_setattr_field(self):
        inst = Instances((4, 4), scores=np.ones(3))
        inst.pred_classes = np.zeros(3)
        assert inst.has("pred_classes")
        assert "pred_classes" in inst._fields


class TestBoxes:
    def test_tensor_shim(self):
        b = Boxes(np.asarray([[1, 2, 3, 4]], np.float32))
        arr = b.tensor.to("cpu").numpy()
        assert arr.shape == (1, 4)
        assert boxes_to_array(b).shape == (1, 4)

    def test_boxmode_convert(self):
        out = BoxMode.convert([1, 2, 3, 4], BoxMode.XYWH_ABS,
                              BoxMode.XYXY_ABS)
        assert list(out) == [1, 2, 4, 6]


class TestConverters:
    def test_mask_areas_rle(self):
        rles, masks = _rles()
        assert np.array_equal(mask_areas(rles), masks.sum(axis=(0, 1)))
        assert np.array_equal(mask_areas(RLEMasks(rles)),
                              masks.sum(axis=(0, 1)))

    def test_mask_areas_ndarray(self):
        _, masks = _rles()
        arr = masks.transpose(2, 0, 1).astype(bool)
        assert np.array_equal(mask_areas(arr), arr.sum(axis=(1, 2)))

    def test_mask_areas_polygon_shoelace(self):
        # 10x10 square: shoelace gives exact polygon area 100
        poly = PolygonMasks([[[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]]])
        assert mask_areas(poly)[0] == pytest.approx(100.0)

    def test_masks_to_rle_polygon_uses_coco_rasterizer(self):
        poly = PolygonMasks([[[2.0, 2.0, 7.0, 2.0, 7.0, 7.0, 2.0, 7.0]]])
        rles = masks_to_rle(poly, (10, 10))
        want = RLE.frPyObjects([[2.0, 2.0, 7.0, 2.0, 7.0, 7.0, 2.0, 7.0]],
                               10, 10)[0]
        assert rles[0]["counts"] == want["counts"]

    def test_masks_to_bitmask_array_roundtrip(self):
        rles, masks = _rles()
        arr = masks_to_bitmask_array(rles)
        assert arr.shape == (4, 20, 30)
        assert np.array_equal(arr, masks.transpose(2, 0, 1).astype(bool))
        arr2 = masks_to_bitmask_array(RLEMasks(rles))
        assert np.array_equal(arr2, arr)

    def test_masks_to_rle_bitmasks(self):
        rles, masks = _rles()
        bm = BitMasks(masks.transpose(2, 0, 1))
        out = masks_to_rle(bm)
        assert [o["counts"] for o in out] == [r["counts"] for r in rles]


class TestInstanceSet:
    def _ddict(self):
        rles, masks = _rles(n=5)
        annos = []
        for i in range(5):
            bb = RLE.toBbox(rles[i])
            annos.append({"category_id": 0,
                          "bbox": np.array([bb[0], bb[1], bb[0] + bb[2],
                                            bb[1] + bb[3]]),
                          "bbox_mode": BoxMode.XYXY_ABS,
                          "segmentation": rles[i]})
        return {"file_name": "img.png", "mask_format": "bitmask",
                "height": 20, "width": 30, "annotations": annos,
                "num_instances": 5, "dataset_class": "Training",
                "HFW": "100 um"}

    def test_read_from_ddict(self):
        iset = InstanceSet(randomstate=42).read_from_ddict(
            self._ddict(), inplace=False)
        assert iset.pred_or_gt == "gt"
        assert iset.HFW == 100.0
        assert iset.HFW_units == "um"
        assert len(iset.instances) == 5
        assert iset.instances.colors.shape == (5, 3)
        assert iset.dataset_class == "Training"

    def test_filter_mask_size(self):
        iset = InstanceSet(randomstate=1).read_from_ddict(
            self._ddict(), inplace=False)
        filtered = iset.filter_mask_size(min_thresh=1, max_thresh=30)
        assert len(filtered) == len(
            [a for a in mask_areas(iset.instances.masks) if 1 < a < 30])

    def test_remove_edge_instances(self):
        rles, masks = _rles(n=5)
        d = self._ddict()
        iset = InstanceSet(randomstate=1).read_from_ddict(d, inplace=False)
        n_edge = sum(
            1 for i in range(5)
            if masks[0, :, i].any() or masks[-1, :, i].any()
            or masks[:, 0, i].any() or masks[:, -1, i].any())
        iset.remove_edge_instances()
        assert len(iset.instances) == 5 - n_edge

    def test_compute_rprops(self):
        iset = InstanceSet(randomstate=1).read_from_ddict(
            self._ddict(), inplace=False)
        df = iset.compute_rprops(return_df=True)
        assert len(df) == 5
        # 5x5 squares
        assert np.allclose(df["area"], 25.0)
        assert "equivalent_diameter" in df.columns
        assert np.allclose(df["solidity"], 1.0)

    def test_copy_is_deep(self):
        iset = InstanceSet(randomstate=1).read_from_ddict(
            self._ddict(), inplace=False)
        c = iset.copy()
        c.instances.colors[0, 0] = -1
        assert iset.instances.colors[0, 0] != -1

    def test_read_from_model_out(self):
        rles, _ = _rles(n=3)
        pred = Instances((20, 30), pred_masks=rles,
                         pred_boxes=np.zeros((3, 4), np.float32),
                         scores=np.ones(3, np.float32),
                         pred_classes=np.zeros(3, np.int64))
        outs = {"file_name": "img.png", "dataset": "powder_Training",
                "pred": {"instances": pred}}
        iset = InstanceSet(randomstate=3).read_from_model_out(
            outs, inplace=False)
        assert iset.pred_or_gt == "pred"
        assert iset.dataset_class == "Training"
        assert len(iset.instances) == 3
        assert isinstance(iset.instances.masks, RLEMasks)


def test_unpickle_reference_pickle(reference_root):
    from ampis_tpu.compat import load_pickle
    data = load_pickle(
        reference_root / "examples/powder/data/sample_particle_outputs.pickle")
    assert len(data) == 5
    inst = data[0]["pred"]["instances"]
    assert isinstance(inst, Instances)
    assert inst.image_size == (1024, 1536)
    assert len(inst) == 200
    iset = InstanceSet(randomstate=0).read_from_model_out(
        data[0], inplace=False)
    assert len(iset.instances) == 200
