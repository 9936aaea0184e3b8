"""Model-level unit tests (fast, CPU): anchors, heads, sampling, converter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ampis_tpu.models import anchors as anchor_lib
from ampis_tpu.models import roi_heads, rpn
from ampis_tpu.models.mask_rcnn import MaskRCNN, count_params, init_params
from ampis_tpu.engine import checkpoint as ckpt_lib
from ampis_tpu.engine.trainer import build_lr_schedule, trainable_mask
from ampis_tpu.engine.config import get_cfg

# compile-heavy layer: full model programs compile for minutes on
# the CPU mesh; run via the full suite, not `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


class TestAnchors:
    def test_cell_anchor_geometry(self):
        cell = anchor_lib.cell_anchors([32], [0.5, 1.0, 2.0])
        assert cell.shape == (3, 4)
        areas = (cell[:, 2] - cell[:, 0]) * (cell[:, 3] - cell[:, 1])
        np.testing.assert_allclose(areas, 32 * 32, rtol=1e-5)
        # ratio = h / w
        r = (cell[:, 3] - cell[:, 1]) / (cell[:, 2] - cell[:, 0])
        np.testing.assert_allclose(sorted(r), [0.5, 1.0, 2.0], rtol=1e-5)
        # centered at origin
        np.testing.assert_allclose(cell[:, :2], -cell[:, 2:], rtol=1e-5)

    def test_grid_order_row_major(self):
        cell = anchor_lib.cell_anchors([16], [1.0])
        g = anchor_lib.grid_anchors(2, 3, 8, cell)
        assert g.shape == (6, 4)
        centers = (g[:, :2] + g[:, 2:]) / 2
        # row-major: x varies fastest
        np.testing.assert_allclose(
            centers,
            [[0, 0], [8, 0], [16, 0], [0, 8], [8, 8], [16, 8]])

    def test_multilevel_counts(self):
        out = anchor_lib.multilevel_anchors(
            [(4, 6), (2, 3)], [8, 16], [[32], [64]], [0.5, 1.0, 2.0])
        assert out[0].shape == (4 * 6 * 3, 4)
        assert out[1].shape == (2 * 3 * 3, 4)


class TestRPN:
    def test_subsample_labels_counts(self):
        labels = jnp.asarray([1] * 300 + [0] * 500 + [-1] * 200)
        pos, neg = rpn.subsample_labels(labels, 256, 0.5,
                                        jax.random.PRNGKey(0))
        assert int(pos.sum()) == 128
        assert int(neg.sum()) == 128
        assert not bool((pos & (labels != 1)).any())
        assert not bool((neg & (labels != 0)).any())

    def test_subsample_few_positives(self):
        labels = jnp.asarray([1] * 10 + [0] * 500)
        pos, neg = rpn.subsample_labels(labels, 256, 0.5,
                                        jax.random.PRNGKey(0))
        assert int(pos.sum()) == 10
        assert int(neg.sum()) == 246

    def test_match_anchors(self):
        anchors_arr = jnp.asarray(
            [[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60],
             [200, 200, 210, 210], [0, 0, 30, 30]], jnp.float32)
        gt = jnp.asarray([[0, 0, 10, 10], [52, 50, 60, 61]], jnp.float32)
        gt_valid = jnp.asarray([True, True])
        matched, labels = rpn.match_anchors_to_gt(
            anchors_arr, gt, gt_valid, thresholds=(0.3, 0.7), chunk=4)
        labels = np.asarray(labels)
        assert labels[0] == 1          # exact match
        assert labels[3] == 0          # far away -> negative
        # anchor 2 has highest IoU with gt 1 -> low-quality positive
        assert labels[2] == 1
        assert int(matched[0]) == 0
        assert int(matched[2]) == 1

    def test_match_no_valid_gt(self):
        anchors_arr = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        gt = jnp.zeros((2, 4), jnp.float32)
        _, labels = rpn.match_anchors_to_gt(
            anchors_arr, gt, jnp.zeros(2, bool))
        assert int(labels[0]) == 0  # all negative

    def test_select_proposals_shapes_and_validity(self):
        n = 100
        rs = np.random.RandomState(0)
        logits = [jnp.asarray(rs.randn(n), jnp.float32)]
        anchors_arr = [jnp.asarray(
            np.concatenate([rs.rand(n, 2) * 50,
                            rs.rand(n, 2) * 50 + 60], 1), jnp.float32)]
        deltas = [jnp.zeros((n, 4), jnp.float32)]
        boxes, scores, valid = rpn.select_proposals(
            logits, deltas, anchors_arr, (128, 128),
            pre_nms_topk=50, post_nms_topk=20, nms_thresh=0.7)
        assert boxes.shape == (20, 4)
        assert bool(valid.any())
        # scores sorted descending among valid
        s = np.asarray(scores)[np.asarray(valid)]
        assert np.all(np.diff(s) <= 1e-6)


class TestFastRCNNInference:
    def test_filters_and_ranks(self):
        k, c = 6, 1
        boxes = jnp.tile(jnp.asarray([[10., 10., 30., 30.]]), (k, 1))
        boxes = boxes + jnp.arange(k, dtype=jnp.float32)[:, None] * 25
        boxes_pc = boxes[:, None, :]
        probs = np.zeros((k, c + 1), np.float32)
        probs[:, 0] = [0.9, 0.8, 0.02, 0.7, 0.6, 0.5]  # one below thresh
        probs[:, 1] = 1 - probs[:, 0]
        out = roi_heads.fast_rcnn_inference(
            boxes_pc, jnp.asarray(probs), jnp.ones(k, bool), (300, 300),
            score_thresh=0.05, nms_thresh=0.5, topk_per_image=4)
        assert out["boxes"].shape == (4, 4)
        v = np.asarray(out["valid"])
        assert v.sum() == 4  # 5 above threshold, keep top 4
        s = np.asarray(out["scores"])
        assert np.all(np.diff(s[v]) <= 0)

    def test_nms_suppresses_overlaps(self):
        # two identical boxes, one lower score -> suppressed
        boxes_pc = jnp.asarray(
            [[[10., 10., 30., 30.]], [[11., 10., 31., 30.]]])
        probs = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
        out = roi_heads.fast_rcnn_inference(
            boxes_pc, probs, jnp.ones(2, bool), (100, 100),
            score_thresh=0.05, nms_thresh=0.5, topk_per_image=2)
        assert int(np.asarray(out["valid"]).sum()) == 1


class TestSampleProposals:
    def test_gt_boxes_become_foreground(self):
        gt = jnp.asarray([[10, 10, 30, 30], [50, 50, 80, 90]], jnp.float32)
        gt_valid = jnp.ones(2, bool)
        gt_classes = jnp.zeros(2, jnp.int32)
        props = jnp.asarray([[200, 200, 220, 220]], jnp.float32)
        out = roi_heads.sample_proposals(
            props, jnp.ones(1, bool), gt, gt_classes, gt_valid,
            jax.random.PRNGKey(0), batch_size_per_image=8,
            positive_fraction=0.5, num_classes=1)
        # appended GT match themselves -> at least 2 fg
        assert int(np.asarray(out["is_fg"]).sum()) == 2
        fg_classes = np.asarray(out["classes"])[np.asarray(out["is_fg"])]
        assert np.all(fg_classes == 0)
        bg = np.asarray(out["valid"]) & ~np.asarray(out["is_fg"])
        assert np.all(np.asarray(out["classes"])[bg] == 1)  # background=C


class TestLossValues:
    def test_mask_head_loss_perfect_prediction(self):
        m, p, c = 4, 28, 1
        targets = jnp.zeros((m, p, p))
        targets = targets.at[:, :14].set(1.0)
        logits = (targets * 2 - 1)[:, :, :, None] * 20.0  # confident
        loss = roi_heads.mask_head_loss(
            logits, targets, jnp.zeros(m, jnp.int32), jnp.ones(m, bool))
        assert float(loss) < 1e-6

    def test_mask_head_loss_ignores_invalid(self):
        m, p = 2, 8
        logits = jnp.zeros((m, p, p, 1))
        targets = jnp.ones((m, p, p))
        loss_all = roi_heads.mask_head_loss(
            logits, targets, jnp.zeros(m, jnp.int32), jnp.ones(m, bool))
        loss_one = roi_heads.mask_head_loss(
            logits, targets, jnp.zeros(m, jnp.int32),
            jnp.asarray([True, False]))
        np.testing.assert_allclose(float(loss_all), float(loss_one),
                                   rtol=1e-6)


class TestSchedulesAndMasks:
    def test_lr_schedule_warmup_and_steps(self):
        cfg = get_cfg()
        cfg.SOLVER.BASE_LR = 0.02
        cfg.SOLVER.WARMUP_ITERS = 100
        cfg.SOLVER.WARMUP_FACTOR = 0.001
        cfg.SOLVER.STEPS = (1000, 2000)
        sched = build_lr_schedule(cfg)
        assert float(sched(0)) == pytest.approx(0.02 * 0.001, rel=1e-3)
        assert float(sched(100)) == pytest.approx(0.02, rel=1e-4)
        assert float(sched(1500)) == pytest.approx(0.002, rel=1e-4)
        assert float(sched(2500)) == pytest.approx(0.0002, rel=1e-4)

    def test_trainable_mask_freezes_norm_and_early_stages(self):
        params = {"params": {
            "backbone": {
                "stem": {"conv1": {"conv": {"kernel": 1},
                                   "norm": {"scale": 1, "bias": 1}}},
                "res2.0": {"conv1": {"conv": {"kernel": 1},
                                     "norm": {"scale": 1}}},
                "res3.0": {"conv1": {"conv": {"kernel": 1},
                                     "norm": {"scale": 1}}},
            },
            "box_head": {"fc1": {"kernel": 1}},
        }}
        m = trainable_mask(params, freeze_at=2)
        p = m["params"]
        assert p["backbone"]["stem"]["conv1"]["conv"]["kernel"] is False
        assert p["backbone"]["res2.0"]["conv1"]["conv"]["kernel"] is False
        assert p["backbone"]["res3.0"]["conv1"]["conv"]["kernel"] is True
        assert p["backbone"]["res3.0"]["conv1"]["norm"]["scale"] is False
        assert p["box_head"]["fc1"]["kernel"] is True


class TestD2Converter:
    def _synthetic_state_dict(self):
        rs = np.random.RandomState(0)
        sd = {}

        def conv_norm(prefix, cin, cout, k):
            sd[f"{prefix}.weight"] = rs.rand(cout, cin, k, k).astype(
                np.float32)
            for suffix, shape in (("weight", cout), ("bias", cout),
                                  ("running_mean", cout),
                                  ("running_var", cout)):
                sd[f"{prefix}.norm.{suffix}"] = rs.rand(shape).astype(
                    np.float32) + 0.5

        conv_norm("backbone.bottom_up.stem.conv1", 3, 64, 7)
        specs = {"res2": (3, 64, 64, 256), "res3": (4, 256, 128, 512),
                 "res4": (6, 512, 256, 1024), "res5": (3, 1024, 512, 2048)}
        for stage, (n, cin, mid, cout) in specs.items():
            for b in range(n):
                ci = cin if b == 0 else cout
                conv_norm(f"backbone.bottom_up.{stage}.{b}.conv1", ci, mid, 1)
                conv_norm(f"backbone.bottom_up.{stage}.{b}.conv2", mid, mid, 3)
                conv_norm(f"backbone.bottom_up.{stage}.{b}.conv3", mid, cout,
                          1)
                if b == 0:
                    conv_norm(f"backbone.bottom_up.{stage}.{b}.shortcut", ci,
                              cout, 1)
        for lvl, cin in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
            sd[f"backbone.fpn_lateral{lvl}.weight"] = rs.rand(
                256, cin, 1, 1).astype(np.float32)
            sd[f"backbone.fpn_lateral{lvl}.bias"] = rs.rand(256).astype(
                np.float32)
            sd[f"backbone.fpn_output{lvl}.weight"] = rs.rand(
                256, 256, 3, 3).astype(np.float32)
            sd[f"backbone.fpn_output{lvl}.bias"] = rs.rand(256).astype(
                np.float32)
        for name, cout in (("conv", 256), ("objectness_logits", 3),
                           ("anchor_deltas", 12)):
            k = 3 if name == "conv" else 1
            sd[f"proposal_generator.rpn_head.{name}.weight"] = rs.rand(
                cout, 256, k, k).astype(np.float32)
            sd[f"proposal_generator.rpn_head.{name}.bias"] = rs.rand(
                cout).astype(np.float32)
        sd["roi_heads.box_head.fc1.weight"] = rs.rand(
            1024, 256 * 49).astype(np.float32)
        sd["roi_heads.box_head.fc1.bias"] = rs.rand(1024).astype(np.float32)
        sd["roi_heads.box_head.fc2.weight"] = rs.rand(1024, 1024).astype(
            np.float32)
        sd["roi_heads.box_head.fc2.bias"] = rs.rand(1024).astype(np.float32)
        sd["roi_heads.box_predictor.cls_score.weight"] = rs.rand(
            2, 1024).astype(np.float32)
        sd["roi_heads.box_predictor.cls_score.bias"] = rs.rand(2).astype(
            np.float32)
        sd["roi_heads.box_predictor.bbox_pred.weight"] = rs.rand(
            4, 1024).astype(np.float32)
        sd["roi_heads.box_predictor.bbox_pred.bias"] = rs.rand(4).astype(
            np.float32)
        for i in range(1, 5):
            sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = rs.rand(
                256, 256, 3, 3).astype(np.float32)
            sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = rs.rand(
                256).astype(np.float32)
        sd["roi_heads.mask_head.deconv.weight"] = rs.rand(
            256, 256, 2, 2).astype(np.float32)
        sd["roi_heads.mask_head.deconv.bias"] = rs.rand(256).astype(
            np.float32)
        sd["roi_heads.mask_head.predictor.weight"] = rs.rand(
            1, 256, 1, 1).astype(np.float32)
        sd["roi_heads.mask_head.predictor.bias"] = rs.rand(1).astype(
            np.float32)
        return sd

    def test_converted_tree_matches_model_shapes(self):
        sd = self._synthetic_state_dict()
        converted = ckpt_lib.convert_d2_state_dict(sd)
        model = MaskRCNN(num_classes=1)
        params = jax.tree.map(np.asarray,
                              init_params(model, jax.random.PRNGKey(0)))

        flat_ref = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_conv = dict(
            (jax.tree_util.keystr(k), v) for k, v in
            jax.tree_util.tree_flatten_with_path(converted)[0])
        missing = []
        mismatched = []
        for key, ref in flat_ref:
            ks = jax.tree_util.keystr(key)
            if ks not in flat_conv:
                missing.append(ks)
            elif flat_conv[ks].shape != ref.shape:
                mismatched.append((ks, flat_conv[ks].shape, ref.shape))
        assert not missing, f"converter missing params: {missing[:5]}"
        assert not mismatched, f"shape mismatches: {mismatched[:5]}"

    def test_bn_folding(self):
        sd = {"x.weight": np.asarray([2.0]), "x.bias": np.asarray([1.0]),
              "x.running_mean": np.asarray([3.0]),
              "x.running_var": np.asarray([4.0])}
        out = ckpt_lib._fold_bn(sd, "x")
        scale = 2.0 / np.sqrt(4.0 + ckpt_lib.BN_EPS)
        np.testing.assert_allclose(out["scale"], scale, rtol=1e-6)
        np.testing.assert_allclose(out["bias"], 1.0 - 3.0 * scale, rtol=1e-6)

    def test_head_mismatch_keeps_fresh_init(self, tmp_path):
        import pickle
        sd = self._synthetic_state_dict()
        # pretend the checkpoint has 80-class COCO heads
        rs = np.random.RandomState(1)
        sd["roi_heads.box_predictor.cls_score.weight"] = rs.rand(
            81, 1024).astype(np.float32)
        sd["roi_heads.box_predictor.cls_score.bias"] = rs.rand(81).astype(
            np.float32)
        p = tmp_path / "model.pkl"
        with open(p, "wb") as f:
            pickle.dump({"model": sd, "__author__": "test"}, f)
        model = MaskRCNN(num_classes=1)
        ref = init_params(model, jax.random.PRNGKey(0))
        loaded = ckpt_lib.load_d2_pkl(p, reference_params=ref)
        ref_np = jax.tree.map(np.asarray, ref)
        # backbone weights taken from checkpoint
        got = loaded["params"]["backbone"]["stem"]["conv1"]["conv"]["kernel"]
        want = ckpt_lib._conv(sd["backbone.bottom_up.stem.conv1.weight"])
        np.testing.assert_allclose(got, want)
        # mismatched head kept fresh
        np.testing.assert_allclose(
            loaded["params"]["box_head"]["cls_score"]["kernel"],
            ref_np["params"]["box_head"]["cls_score"]["kernel"])


def test_param_count_matches_mask_rcnn_r50():
    model = MaskRCNN(num_classes=1)
    params = init_params(model, jax.random.PRNGKey(0))
    n = count_params(params)
    assert 43.5e6 < n < 44.5e6  # ~44.0M for R50-FPN Mask R-CNN (1 class)


def test_deconv_layout_matches_torch_semantics():
    """Pin the _deconv converter layout against manual torch-convT math."""
    rs = np.random.RandomState(0)
    x = rs.rand(1, 5, 6, 3).astype(np.float32)
    w_t = rs.rand(3, 4, 2, 2).astype(np.float32)  # (in, out, kh, kw)
    manual = np.zeros((1, 10, 12, 4), np.float32)
    for i in range(5):
        for j in range(6):
            for di in range(2):
                for dj in range(2):
                    manual[0, 2 * i + di, 2 * j + dj] = \
                        x[0, i, j] @ w_t[:, :, di, dj]
    import flax.linen as nn
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID",
                           use_bias=False)
    kernel = ckpt_lib._deconv(w_t)
    out = np.asarray(mod.apply(
        {"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x)))
    np.testing.assert_allclose(out, manual, atol=1e-5)


# ---------------------------------------------------------------- GN / jitter

def test_groupnorm_normalizes_per_group():
    from ampis_tpu.models.layers import GroupNorm
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 64) * 5 + 3, jnp.float32)
    gn = GroupNorm(64, groups=32)
    p = gn.init(jax.random.PRNGKey(0), x)
    y = np.asarray(gn.apply(p, x)).reshape(2, -1, 32, 2)
    np.testing.assert_allclose(y.mean(axis=(1, 3)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(1, 3)), 1.0, atol=1e-4)


def test_gn_param_tree_matches_frozenbn():
    """cfg.MODEL.RESNETS.NORM='GN' must not change checkpoint structure."""
    kw = dict(num_classes=1, detections_per_image=8, pre_nms_topk_test=64,
              post_nms_topk_test=32, roi_chunk=32, fused_roi=False)
    p_fb = init_params(MaskRCNN(**kw), jax.random.PRNGKey(0))
    p_gn = init_params(MaskRCNN(backbone_norm="GN", **kw),
                       jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(p_fb)
            == jax.tree_util.tree_structure(p_gn))


def test_trainable_mask_gn_trains_norm_params():
    kw = dict(num_classes=1, detections_per_image=8, pre_nms_topk_test=64,
              post_nms_topk_test=32, roi_chunk=32, fused_roi=False)
    params = init_params(MaskRCNN(**kw), jax.random.PRNGKey(0))
    frozen = trainable_mask(params, freeze_at=0, train_norm=False)
    gn = trainable_mask(params, freeze_at=0, train_norm=True)
    leaves_f = jax.tree_util.tree_leaves(frozen)
    leaves_g = jax.tree_util.tree_leaves(gn)
    assert not all(leaves_f)      # FrozenBN: norm affines frozen
    assert all(leaves_g)          # GN at freeze_at=0: everything trains


def test_photometric_jitter_semantics():
    from ampis_tpu.input.transforms import photometric_jitter
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.randint(0, 255, (16, 16, 3)), jnp.uint8)
    f32 = jnp.asarray(img, jnp.float32)
    # identity ranges are an exact passthrough
    out = photometric_jitter(img, jax.random.PRNGKey(2), (1.0, 1.0),
                             (1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(f32))
    # brightness-only: output is img * w, w in [0.5, 0.7]
    out = photometric_jitter(img, jax.random.PRNGKey(3), (0.5, 0.7),
                             (1.0, 1.0))
    ratio = np.asarray(out) / np.maximum(np.asarray(f32), 1e-6)
    w = np.median(ratio)
    assert 0.5 <= w <= 0.7
    np.testing.assert_allclose(np.asarray(out), np.asarray(f32) * w,
                               rtol=1e-5, atol=1e-3)
    # contrast-only: mean is preserved (blend with the image mean)
    out = photometric_jitter(img, jax.random.PRNGKey(4), (1.0, 1.0),
                             (0.6, 0.8))
    np.testing.assert_allclose(float(out.mean()), float(f32.mean()),
                               rtol=1e-4)


def test_mask_capacity_compaction_matches_exact_path():
    """mask_capacity_per_image compacts the mask stage with identical
    outputs when the batch's valid detections fit the capacity."""
    kw = dict(num_classes=1, detections_per_image=16, pre_nms_topk_test=64,
              post_nms_topk_test=48, roi_chunk=32, fused_roi=False)
    model = MaskRCNN(**kw)
    params = init_params(model, jax.random.PRNGKey(0))
    rs = np.random.RandomState(3)
    images = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    sizes = jnp.asarray([[64.0, 64.0]] * 2, jnp.float32)
    out = model.apply(params, images, sizes, method=MaskRCNN.inference)
    total_valid = int(np.asarray(out["valid"]).sum())
    assert int(out["mask_dropped"]) == 0
    cap = max((total_valid + 1) // 2 + 1, 1)  # fits: 2 * cap >= total
    model_c = MaskRCNN(mask_capacity_per_image=cap, **kw)
    out_c = model_c.apply(params, images, sizes, method=MaskRCNN.inference)
    assert int(out_c["mask_dropped"]) == 0
    valid = np.asarray(out["valid"])
    np.testing.assert_array_equal(valid, np.asarray(out_c["valid"]))
    np.testing.assert_allclose(np.asarray(out["masks"])[valid],
                               np.asarray(out_c["masks"])[valid],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["boxes"])[valid],
                               np.asarray(out_c["boxes"])[valid])
    # overflow accounting: capacity 1/image drops the excess
    if total_valid > 2:
        model_o = MaskRCNN(mask_capacity_per_image=1, **kw)
        out_o = model_o.apply(params, images, sizes,
                              method=MaskRCNN.inference)
        assert int(out_o["mask_dropped"]) == total_valid - 2


def test_int8_backbone_calib_static_roundtrip():
    """Backbone int8: calib records scales; static int8 forward stays
    within quantization error of the float path; param tree unchanged."""
    from ampis_tpu.models.resnet import ResNet
    net = ResNet(depth=50)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 64, 64, 3) * 2 - 1, jnp.float32)
    p = net.init(jax.random.PRNGKey(0), x)
    p8 = net.init(jax.random.PRNGKey(0), x, int8="static")
    assert (jax.tree_util.tree_structure(p8["params"])
            == jax.tree_util.tree_structure(p["params"]))
    assert len(jax.tree.leaves(p8["quant"])) == 64  # 16 blocks x 4 scales

    # non-trivial FrozenBN affines so the kernel folding is exercised
    def perturb(tree, path=()):
        if isinstance(tree, dict):
            return {k: perturb(v, path + (k,)) for k, v in tree.items()}
        if "norm" in path and path[-1] == "scale":
            return tree + 0.5 * np.abs(
                rs.rand(*tree.shape)).astype(np.float32)
        if "norm" in path and path[-1] == "bias":
            return tree + 0.1 * rs.randn(*tree.shape).astype(np.float32)
        return tree

    params = {"params": perturb(p["params"])}
    ref = net.apply(params, x)
    _, mut = net.apply(params, x, int8="calib", mutable=["quant"])
    assert all(float(s) > 0 for s in jax.tree.leaves(mut["quant"]))
    out = net.apply({**params, "quant": mut["quant"]}, x, int8="static")
    for k in ("res2", "res3", "res4", "res5"):
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        err = np.abs(r - o).max() / max(np.abs(r).max(), 1e-6)
        assert err < 0.15, (k, err)


def test_int8_neck_calib_static_roundtrip():
    """FPN + RPN head int8: param trees unchanged; static output within
    quantization error of float."""
    from ampis_tpu.models.fpn import FPN
    rs = np.random.RandomState(1)
    feats = {f"res{i + 2}": jnp.asarray(
        rs.rand(1, 16 // (1 << i), 16 // (1 << i), 64 * (1 << i)) - 0.3,
        jnp.float32) for i in range(4)}
    fpn = FPN()
    p = fpn.init(jax.random.PRNGKey(0), feats)
    p8 = fpn.init(jax.random.PRNGKey(0), feats, int8="static")
    assert (jax.tree_util.tree_structure(p8["params"])
            == jax.tree_util.tree_structure(p["params"]))
    ref = fpn.apply(p, feats)
    _, mut = fpn.apply(p, feats, int8="calib", mutable=["quant"])
    out = fpn.apply({**p, "quant": mut["quant"]}, feats, int8="static")
    for k in ref:
        r, o = np.asarray(ref[k], np.float32), np.asarray(out[k], np.float32)
        err = np.abs(r - o).max() / max(np.abs(r).max(), 1e-6)
        assert err < 0.1, (k, err)

    levels = [jnp.asarray(rs.rand(1, 8, 8, 256) - 0.3, jnp.float32)
              for _ in range(5)]
    head = rpn.RPNHead(num_anchors=3)
    hp = head.init(jax.random.PRNGKey(1), levels)
    hp8 = head.init(jax.random.PRNGKey(1), levels, int8="static")
    assert (jax.tree_util.tree_structure(hp8["params"])
            == jax.tree_util.tree_structure(hp["params"]))
    lg, dl = head.apply(hp, levels)
    _, hmut = head.apply(hp, levels, int8="calib", mutable=["quant"])
    lg8, dl8 = head.apply({**hp, "quant": hmut["quant"]}, levels,
                          int8="static")
    for a, b in zip(lg + dl, lg8 + dl8):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < 0.1, err


def test_param_labels_norm_group():
    """Trainable norm affines land in the 'norm' optimizer group (decayed
    with SOLVER.WEIGHT_DECAY_NORM=0 by default) and freezing rules match
    trainable_mask."""
    from ampis_tpu.engine.trainer import param_labels
    kw = dict(num_classes=1, detections_per_image=8, pre_nms_topk_test=64,
              post_nms_topk_test=32, roi_chunk=32, fused_roi=False)
    params = init_params(MaskRCNN(backbone_norm="GN", **kw),
                         jax.random.PRNGKey(0))
    labels = param_labels(params, freeze_at=0, train_norm=True)
    found = {"norm": 0, "trainable": 0, "frozen": 0}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            found[node] += 1
            if "norm" in path:
                assert node == "norm", path
            else:
                assert node == "trainable", path

    walk(labels, ())
    assert found["norm"] > 0 and found["trainable"] > 0
    assert found["frozen"] == 0  # freeze_at=0 + train_norm

    # FrozenBN inference-style: norm affines frozen, stem/res2 frozen
    labels2 = param_labels(params, freeze_at=2, train_norm=False)

    def walk2(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk2(v, path + (k,))
        elif "norm" in path or "stem" in path or any(
                p.startswith("res2") for p in path):
            assert node == "frozen", path

    walk2(labels2, ())
    # consistency with trainable_mask
    mask = trainable_mask(params, freeze_at=2, train_norm=False)
    lab_frozen = jax.tree.map(lambda s: s == "frozen", labels2)
    assert jax.tree.map(lambda a, b: a == (not b), mask, lab_frozen)


def test_edge_agreement_loss():
    """Sobel edge-agreement aux loss: zero for flat maps, small when
    prediction matches the target, larger when boundaries disagree."""
    from ampis_tpu.models.roi_heads import _sobel_maps, edge_agreement_loss
    # constant map -> zero gradients everywhere
    flat = _sobel_maps(jnp.ones((1, 8, 8)))
    np.testing.assert_allclose(np.asarray(flat), 0.0)

    t = np.zeros((2, 28, 28), np.float32)
    t[:, 8:20, 8:20] = 1.0
    targets = jnp.asarray(t)
    cls = jnp.zeros((2,), jnp.int32)
    val = jnp.ones((2,), bool)
    match = (jnp.asarray(t)[..., None] * 2 - 1) * 12.0  # sharp correct logits
    miss = jnp.roll(match, 6, axis=2)                   # shifted boundary
    l_match = float(edge_agreement_loss(match, targets, cls, val))
    l_miss = float(edge_agreement_loss(miss, targets, cls, val))
    assert l_match < 0.02
    assert l_miss > 5 * l_match
    # invalid RoIs contribute nothing
    l_none = float(edge_agreement_loss(miss, targets, cls,
                                       jnp.zeros((2,), bool)))
    assert l_none == 0.0


def test_edge_agreement_in_loss_dict():
    kw = dict(num_classes=1, detections_per_image=8, pre_nms_topk_train=64,
              post_nms_topk_train=32, roi_batch_per_image=16,
              mask_rois_per_image=4, roi_chunk=32, fused_roi=False)
    import numpy as onp
    rng = onp.random.RandomState(0)
    b, h, w, g = 1, 64, 64, 4
    images = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]], jnp.float32)
    gt_boxes = jnp.asarray([[[8, 8, 40, 40], [20, 20, 60, 50],
                             [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    gt_classes = jnp.zeros((b, g), jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False]])
    masks = onp.zeros((b, g, h, w), onp.uint8)
    masks[:, 0, 8:40, 8:40] = 1
    masks[:, 1, 20:50, 20:60] = 1
    gt_masks = jnp.asarray(masks)

    for weight, has_edge in ((0.0, False), (0.5, True)):
        model = MaskRCNN(edge_agreement=weight, **kw)
        params = init_params(model, jax.random.PRNGKey(0))
        losses = jax.jit(lambda p, im: model.apply(
            p, im, sizes, gt_boxes, gt_classes, gt_valid, gt_masks,
            jax.random.PRNGKey(1), method=MaskRCNN.losses))(params, images)
        assert ("loss_mask_edge" in losses) == has_edge
        if has_edge:
            assert np.isfinite(float(losses["loss_mask_edge"]))
