import matplotlib
matplotlib.use("Agg")

import numpy as np

from ampis_tpu import rle, visualize
from ampis_tpu.engine import MetadataCatalog
from ampis_tpu.structures import BoxMode, InstanceSet, Instances, RLEMasks


def _rles(n=3, h=40, w=60):
    rs = np.random.RandomState(0)
    m = np.zeros((h, w, n), np.uint8, order="F")
    for i in range(n):
        r0, c0 = rs.randint(0, h - 10), rs.randint(0, w - 10)
        m[r0:r0 + 8, c0:c0 + 8, i] = 1
    return rle.encode(m), m


def test_random_colors_reproducible():
    c1 = visualize.random_colors(5, seed=3)
    c2 = visualize.random_colors(5, seed=3)
    c3 = visualize.random_colors(5, seed=4)
    assert c1.shape == (5, 3)
    np.testing.assert_allclose(c1, c2)
    assert not np.allclose(c1, c3)
    assert c1.min() >= 0 and c1.max() <= 1


def test_display_iset_get_img_overlays_masks():
    rles, m = _rles()
    bbs = rle.toBbox(rles)
    boxes = np.stack([bbs[:, 0], bbs[:, 1], bbs[:, 0] + bbs[:, 2],
                      bbs[:, 1] + bbs[:, 3]], 1)
    iset = InstanceSet(randomstate=0)
    iset.instances = Instances((40, 60), masks=RLEMasks(rles), boxes=boxes)
    iset.instances.colors = visualize.random_colors(3, 0)
    img = np.zeros((40, 60), np.uint8)
    out = visualize.display_iset(img, iset, get_img=True)
    assert out.shape == (40, 60, 3)
    assert out.dtype == np.uint8
    # mask regions got colored
    any_mask = m.any(axis=2)
    assert out[any_mask].sum() > 0
    # far-away background stays black (unless covered by a box edge)
    assert out.sum() > 0


def test_display_iset_apply_correction_restores_background():
    rles, m = _rles(n=1)
    iset = InstanceSet(randomstate=0)
    iset.instances = Instances((40, 60), masks=RLEMasks(rles),
                               boxes=np.asarray([[0., 0., 8., 8.]]))
    iset.instances.colors = np.asarray([[1.0, 0.0, 0.0]])
    img = np.full((40, 60, 3), 7, np.uint8)
    out = visualize.display_iset(img, iset, get_img=True,
                                 apply_correction=True)
    outside = ~m[:, :, 0].astype(bool)
    # correction restores original pixels outside all masks
    assert np.array_equal(out[outside], img[outside])


def test_display_ddicts_writes_png(tmp_path, reference_root):
    from ampis_tpu import data_utils
    dd = data_utils.get_ddicts(
        "via2", reference_root / "examples/powder/data/via_2.0.8/"
        "via_powder_particle_masks_validation.json")[0]
    MetadataCatalog.get("viz_test").set(thing_classes=["particle"])
    visualize.display_ddicts(dd, outpath=tmp_path, dataset="viz_test",
                             gt=True, summary=False)
    files = list(tmp_path.glob("*.png"))
    assert len(files) == 1
    assert f"n={dd['num_instances']}" in files[0].name


def test_visualizer_draw_instance_predictions():
    rles, _ = _rles(n=2)
    inst = Instances((40, 60),
                     pred_boxes=np.asarray([[1., 1., 9., 9.],
                                            [20., 20., 28., 28.]],
                                           np.float32),
                     pred_masks=rles[:2],
                     scores=np.asarray([0.9, 0.8], np.float32),
                     pred_classes=np.zeros(2, np.int64))
    v = visualize.Visualizer(np.zeros((40, 60, 3), np.uint8),
                             metadata={"thing_classes": ["p"]})
    out = v.draw_instance_predictions(inst).get_image()
    assert out.shape == (40, 60, 3)
    assert out.sum() > 0


def test_visualizer_polygon_masks():
    v = visualize.Visualizer(np.zeros((20, 20, 3), np.uint8))
    out = v.overlay_instances(
        masks=[[[2.0, 2.0, 10.0, 2.0, 10.0, 10.0, 2.0, 10.0]]],
        assigned_colors=np.asarray([[0., 1., 0.]])).get_image()
    assert out[5, 5, 1] > 0  # inside the polygon got green
    assert out[15, 15].sum() == 0
