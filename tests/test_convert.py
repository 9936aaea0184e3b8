"""Value-level differential tests for the Detectron2 weight converter.

SURVEY.md §7 hard part #2: numerical parity of the model ops chain. A
synthetic-but-realistically-shaped d2 Mask R-CNN R50-FPN state dict is fed
through (a) a minimal torch forward composed per Detectron2's architecture
(conv2d / FrozenBN / maxpool / interpolate / linear / conv_transpose2d,
torch is CPU-only here) and (b) this package's flax modules with the
converted weights; activations must agree stage by stage to <= 1e-4.

Covers: NCHW->NHWC conv relabeling, FrozenBN folding (validated against
the unfolded (x - mean)/sqrt(var+eps)*g + b form), stem maxpool padding,
stride-in-1x1 bottlenecks, FPN top-down nearest upsample + P6 subsample,
RPN head, box-head fc1 flatten-order permutation, and the deconv kernel
flip (the stale reference previously at engine/checkpoint.py:74).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ampis_tpu.engine.checkpoint import (BN_EPS, convert_d2_state_dict,
                                         load_d2_pkl)  # noqa: E402

RNG = np.random.RandomState(20260817)
BLOCKS = (3, 4, 6, 3)
STAGE_CH = ((256, 64), (512, 128), (1024, 256), (2048, 512))


def _w(*shape):
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
    return (RNG.randn(*shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)


def _bn(sd, prefix, c):
    sd[f"{prefix}.weight"] = RNG.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{prefix}.bias"] = (RNG.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_mean"] = (RNG.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_var"] = RNG.uniform(0.5, 1.5, c).astype(np.float32)


def _conv_norm(sd, prefix, cout, cin, k):
    sd[f"{prefix}.weight"] = _w(cout, cin, k, k)
    _bn(sd, f"{prefix}.norm", cout)


def _conv_bias(sd, prefix, cout, cin, k):
    sd[f"{prefix}.weight"] = _w(cout, cin, k, k)
    sd[f"{prefix}.bias"] = (RNG.randn(cout) * 0.01).astype(np.float32)


@pytest.fixture(scope="module")
def d2_sd():
    """Random d2-keyed state dict with the exact R50-FPN shapes."""
    sd = {}
    _conv_norm(sd, "backbone.bottom_up.stem.conv1", 64, 3, 7)
    cin = 64
    for si, n in enumerate(BLOCKS):
        cout, cbot = STAGE_CH[si]
        for b in range(n):
            p = f"backbone.bottom_up.res{si + 2}.{b}"
            _conv_norm(sd, f"{p}.conv1", cbot, cin, 1)
            _conv_norm(sd, f"{p}.conv2", cbot, cbot, 3)
            _conv_norm(sd, f"{p}.conv3", cout, cbot, 1)
            if b == 0:
                _conv_norm(sd, f"{p}.shortcut", cout, cin, 1)
            cin = cout
    for lvl, c in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        _conv_bias(sd, f"backbone.fpn_lateral{lvl}", 256, c, 1)
        _conv_bias(sd, f"backbone.fpn_output{lvl}", 256, 256, 3)
    _conv_bias(sd, "proposal_generator.rpn_head.conv", 256, 256, 3)
    _conv_bias(sd, "proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    _conv_bias(sd, "proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    sd["roi_heads.box_head.fc1.weight"] = _w(1024, 256 * 7 * 7)
    sd["roi_heads.box_head.fc1.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_head.fc2.weight"] = _w(1024, 1024)
    sd["roi_heads.box_head.fc2.bias"] = (RNG.randn(1024) * 0.01
                                         ).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = _w(2, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = np.zeros(2, np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = _w(4, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(4, np.float32)
    for i in range(1, 5):
        _conv_bias(sd, f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = _w(256, 256, 2, 2)
    sd["roi_heads.mask_head.deconv.bias"] = np.zeros(256, np.float32)
    _conv_bias(sd, "roi_heads.mask_head.predictor", 1, 256, 1)
    return sd


@pytest.fixture(scope="module")
def flax_params(d2_sd):
    return convert_d2_state_dict(d2_sd)["params"]


# ------------------------------------------------------------ torch mirror

def _t(x):
    return torch.from_numpy(np.asarray(x))


def _tbn(sd, prefix, x):
    """FrozenBatchNorm2d in its raw (unfolded) form."""
    g, b = _t(sd[f"{prefix}.weight"]), _t(sd[f"{prefix}.bias"])
    m, v = (_t(sd[f"{prefix}.running_mean"]),
            _t(sd[f"{prefix}.running_var"]))
    shape = (1, -1, 1, 1)
    return (x - m.view(shape)) / torch.sqrt(v.view(shape) + BN_EPS) \
        * g.view(shape) + b.view(shape)


def _tconv(sd, prefix, x, stride=1, padding=0, bn=True, relu=True):
    x = F.conv2d(x, _t(sd[f"{prefix}.weight"]),
                 None if bn else _t(sd[f"{prefix}.bias"]),
                 stride=stride, padding=padding)
    if bn:
        x = _tbn(sd, f"{prefix}.norm", x)
    return F.relu(x) if relu else x


def torch_backbone(sd, x):
    x = _tconv(sd, "backbone.bottom_up.stem.conv1", x, stride=2, padding=3)
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
    feats = {}
    for si, n in enumerate(BLOCKS):
        stage_stride = 1 if si == 0 else 2
        for b in range(n):
            p = f"backbone.bottom_up.res{si + 2}.{b}"
            s = stage_stride if b == 0 else 1
            out = _tconv(sd, f"{p}.conv1", x, stride=s)  # stride_in_1x1
            out = _tconv(sd, f"{p}.conv2", out, padding=1)
            out = _tconv(sd, f"{p}.conv3", out, relu=False)
            sc = (_tconv(sd, f"{p}.shortcut", x, stride=s, relu=False)
                  if b == 0 else x)
            x = F.relu(out + sc)
        feats[f"res{si + 2}"] = x
    return feats


def torch_fpn(sd, feats):
    lat = {lvl: _tconv(sd, f"backbone.fpn_lateral{lvl}",
                       feats[f"res{lvl}"], bn=False, relu=False)
           for lvl in (2, 3, 4, 5)}
    outs, prev = {}, None
    for lvl in (5, 4, 3, 2):
        x = lat[lvl]
        if prev is not None:
            x = x + F.interpolate(prev, scale_factor=2, mode="nearest")
        prev = x
        outs[f"p{lvl}"] = _tconv(sd, f"backbone.fpn_output{lvl}", x,
                                 padding=1, bn=False, relu=False)
    outs["p6"] = F.max_pool2d(outs["p5"], kernel_size=1, stride=2)
    return outs


def _close(name, torch_nchw, flax_nhwc, tol=1e-4):
    a = torch_nchw.detach().numpy().transpose(0, 2, 3, 1)
    b = np.asarray(flax_nhwc, np.float32)
    scale = max(1.0, float(np.abs(a).max()))
    err = float(np.abs(a - b).max()) / scale
    assert err < tol, f"{name}: relative max err {err:.2e}"


# ------------------------------------------------------------------- tests

@pytest.fixture(scope="module")
def backbone_acts(d2_sd, flax_params):
    from ampis_tpu.models.resnet import ResNet
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        tfeats = torch_backbone(d2_sd, _t(x))
    jfeats = ResNet(depth=50).apply({"params": flax_params["backbone"]},
                                    x.transpose(0, 2, 3, 1))
    return tfeats, jfeats


def test_backbone_stage_parity(backbone_acts):
    tfeats, jfeats = backbone_acts
    for stage in ("res2", "res3", "res4", "res5"):
        _close(stage, tfeats[stage], jfeats[stage])


def test_fpn_parity(d2_sd, flax_params, backbone_acts):
    from ampis_tpu.models.fpn import FPN
    tfeats, jfeats = backbone_acts
    with torch.no_grad():
        touts = torch_fpn(d2_sd, tfeats)
    jouts = FPN().apply({"params": flax_params["fpn"]}, jfeats)
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        _close(lvl, touts[lvl], jouts[lvl])


def test_rpn_head_parity(d2_sd, flax_params):
    from ampis_tpu.models.rpn import RPNHead
    x = RNG.randn(1, 256, 32, 32).astype(np.float32)
    with torch.no_grad():
        t = F.relu(F.conv2d(_t(x),
                            _t(d2_sd["proposal_generator.rpn_head.conv.weight"]),
                            _t(d2_sd["proposal_generator.rpn_head.conv.bias"]),
                            padding=1))
        tobj = F.conv2d(
            t, _t(d2_sd["proposal_generator.rpn_head.objectness_logits.weight"]),
            _t(d2_sd["proposal_generator.rpn_head.objectness_logits.bias"]))
        tdel = F.conv2d(
            t, _t(d2_sd["proposal_generator.rpn_head.anchor_deltas.weight"]),
            _t(d2_sd["proposal_generator.rpn_head.anchor_deltas.bias"]))
    logits, deltas = RPNHead(num_anchors=3).apply(
        {"params": flax_params["rpn"]}, [x.transpose(0, 2, 3, 1)])
    # flax logits come flattened in (y, x, a) grid order
    _close("objectness", tobj, np.asarray(logits[0]).reshape(1, 32, 32, 3))
    _close("deltas", tdel, deltas[0])


def test_box_head_parity_fc1_flatten_order(d2_sd, flax_params):
    """fc1 consumes the pooled RoI; torch flattens (C, P, P), flax
    (P, P, C) — the converter's permutation must reconcile them."""
    from ampis_tpu.models.roi_heads import BoxHead
    pooled = RNG.randn(8, 256, 7, 7).astype(np.float32)
    with torch.no_grad():
        h = F.relu(F.linear(_t(pooled).flatten(1),
                            _t(d2_sd["roi_heads.box_head.fc1.weight"]),
                            _t(d2_sd["roi_heads.box_head.fc1.bias"])))
        h = F.relu(F.linear(h, _t(d2_sd["roi_heads.box_head.fc2.weight"]),
                            _t(d2_sd["roi_heads.box_head.fc2.bias"])))
        tcls = F.linear(h, _t(d2_sd["roi_heads.box_predictor.cls_score.weight"]),
                        _t(d2_sd["roi_heads.box_predictor.cls_score.bias"]))
        tbox = F.linear(h, _t(d2_sd["roi_heads.box_predictor.bbox_pred.weight"]),
                        _t(d2_sd["roi_heads.box_predictor.bbox_pred.bias"]))
    scores, deltas = BoxHead(num_classes=1).apply(
        {"params": flax_params["box_head"]}, pooled.transpose(0, 2, 3, 1))
    assert np.abs(tcls.numpy() - np.asarray(scores)).max() < 1e-4
    assert np.abs(tbox.numpy() - np.asarray(deltas)).max() < 1e-4


def test_mask_head_parity_deconv_layout(d2_sd, flax_params):
    """Pins the ConvTranspose kernel flip (cited from checkpoint._deconv)."""
    from ampis_tpu.models.roi_heads import MaskHead
    x = RNG.randn(4, 256, 14, 14).astype(np.float32)
    with torch.no_grad():
        t = _t(x)
        for i in range(1, 5):
            t = F.relu(F.conv2d(
                t, _t(d2_sd[f"roi_heads.mask_head.mask_fcn{i}.weight"]),
                _t(d2_sd[f"roi_heads.mask_head.mask_fcn{i}.bias"]),
                padding=1))
        t = F.relu(F.conv_transpose2d(
            t, _t(d2_sd["roi_heads.mask_head.deconv.weight"]),
            _t(d2_sd["roi_heads.mask_head.deconv.bias"]), stride=2))
        t = F.conv2d(t, _t(d2_sd["roi_heads.mask_head.predictor.weight"]),
                     _t(d2_sd["roi_heads.mask_head.predictor.bias"]))
    logits = MaskHead(num_classes=1).apply(
        {"params": flax_params["mask_head"]}, x.transpose(0, 2, 3, 1))
    _close("mask_logits", t, logits)


@pytest.mark.slow  # init_params jit-compiles the full model on CPU
def test_load_d2_pkl_transfer_merge(tmp_path, d2_sd):
    """COCO-shaped heads (80 classes) keep fresh init; backbone loads."""
    import pickle
    sd = dict(d2_sd)
    sd["roi_heads.box_predictor.cls_score.weight"] = _w(81, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = np.zeros(81, np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = _w(320, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(320, np.float32)
    sd["roi_heads.mask_head.predictor.weight"] = _w(80, 256, 1, 1)
    sd["roi_heads.mask_head.predictor.bias"] = np.zeros(80, np.float32)
    pkl = tmp_path / "model_zoo.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    import jax
    from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params
    model = MaskRCNN(num_classes=1)
    fresh = init_params(model, jax.random.PRNGKey(0))
    loaded = load_d2_pkl(pkl, reference_params=fresh)

    got = loaded["params"]["backbone"]["stem"]["conv1"]["conv"]["kernel"]
    want = np.transpose(sd["backbone.bottom_up.stem.conv1.weight"],
                        (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want, atol=0)
    # 1-class head shapes kept from fresh init (COCO head dropped)
    cls = loaded["params"]["box_head"]["cls_score"]["kernel"]
    assert np.shape(cls) == (1024, 2)
    fresh_cls = np.asarray(
        jax.tree.map(np.asarray,
                     fresh)["params"]["box_head"]["cls_score"]["kernel"])
    np.testing.assert_allclose(np.asarray(cls), fresh_cls)
