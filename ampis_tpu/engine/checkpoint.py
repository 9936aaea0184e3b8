"""Checkpointing: orbax save/restore + Detectron2 .pkl weight conversion.

Replaces the detectron2 Checkpointer the reference delegates to (SURVEY.md
§5 checkpoint/resume): periodic orbax checkpoints during training, plus a
converter for model-zoo pickles ('model_final_f10217.pkl', notebook cell
20) so the reference's transfer-learning workflow (GETTING_STARTED.md:13,30)
carries over: d2 NCHW/OIHW torch tensors are relabeled and transposed into
this package's NHWC flax layout, and FrozenBN statistics are folded into
scale/bias.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # detectron2 FrozenBatchNorm2d default


# ---------------------------------------------------------------------------
# orbax
# ---------------------------------------------------------------------------

def save_checkpoint(path, tree):
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path, target=None):
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=target)


def latest_checkpoint(output_dir):
    """Newest step directory under output_dir/ckpt_* (or None)."""
    root = Path(output_dir)
    if not root.exists():
        return None
    cands = sorted(root.glob("ckpt_*"),
                   key=lambda p: int(p.name.split("_")[-1]))
    return cands[-1] if cands else None


# ---------------------------------------------------------------------------
# Detectron2 pkl conversion
# ---------------------------------------------------------------------------

def _conv(w):
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w):
    """torch (out, in) -> flax (in, out)."""
    return np.ascontiguousarray(w.T)


def _deconv(w):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).

    flax ConvTranspose(transpose_kernel=False) applies the kernel directly
    in the fractionally-strided convolution, which corresponds to torch's
    ConvTranspose2d with the kernel spatially flipped; for the 2x2/stride-2
    non-overlapping deconv this means reversing both spatial axes.
    (Pinned by tests/test_convert.py::test_mask_head_parity_deconv_layout
    and tests/test_model.py::test_deconv_layout_matches_torch_semantics.)
    """
    w = np.transpose(w, (2, 3, 0, 1))          # (kh, kw, in, out)
    return np.ascontiguousarray(w[::-1, ::-1])


def _fold_bn(sd, prefix):
    g = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = g / np.sqrt(var + BN_EPS)
    bias = b - mean * scale
    return {"scale": scale.astype(np.float32),
            "bias": bias.astype(np.float32)}


def _conv_norm(sd, prefix):
    return {"conv": {"kernel": _conv(sd[f"{prefix}.weight"])},
            "norm": _fold_bn(sd, f"{prefix}.norm")}


def _conv_bias(sd, prefix):
    return {"conv": {"kernel": _conv(sd[f"{prefix}.weight"]),
                     "bias": sd[f"{prefix}.bias"].astype(np.float32)}}


def _plain_conv(sd, prefix):
    return {"kernel": _conv(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _plain_dense(sd, prefix):
    return {"kernel": _dense(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _fc1_dense(sd, prefix, pooled=7, channels=256):
    """box_head.fc1 flattens (C, P, P) in torch vs (P, P, C) here: permute
    the input dimension of the weight accordingly."""
    w = sd[f"{prefix}.weight"]  # (out, C*P*P) with index c*P*P + y*P + x
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pooled, pooled)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, -1)  # index y,x,c
    return {"kernel": _dense(w),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


BLOCKS_PER_STAGE = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def convert_d2_state_dict(sd: dict, depth=50) -> dict:
    """Map a detectron2 Mask R-CNN R50/101-FPN state dict to flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    backbone = {"stem": {"conv1": _conv_norm(sd,
                                             "backbone.bottom_up.stem.conv1")}}
    for stage_i, n_blocks in enumerate(BLOCKS_PER_STAGE[depth]):
        stage = f"res{stage_i + 2}"
        for b in range(n_blocks):
            d2p = f"backbone.bottom_up.{stage}.{b}"
            block = {f"conv{j}": _conv_norm(sd, f"{d2p}.conv{j}")
                     for j in (1, 2, 3)}
            if f"{d2p}.shortcut.weight" in sd:
                block["shortcut"] = _conv_norm(sd, f"{d2p}.shortcut")
            backbone[f"{stage}.{b}"] = block

    fpn = {}
    for lvl in (2, 3, 4, 5):
        fpn[f"fpn_lateral{lvl}"] = _conv_bias(
            sd, f"backbone.fpn_lateral{lvl}")
        fpn[f"fpn_output{lvl}"] = _conv_bias(
            sd, f"backbone.fpn_output{lvl}")

    rpn = {"conv": _plain_conv(sd, "proposal_generator.rpn_head.conv"),
           "objectness_logits": _plain_conv(
               sd, "proposal_generator.rpn_head.objectness_logits"),
           "anchor_deltas": _plain_conv(
               sd, "proposal_generator.rpn_head.anchor_deltas")}

    box_head = {"fc1": _fc1_dense(sd, "roi_heads.box_head.fc1"),
                "fc2": _plain_dense(sd, "roi_heads.box_head.fc2"),
                "cls_score": _plain_dense(
                    sd, "roi_heads.box_predictor.cls_score"),
                "bbox_pred": _plain_dense(
                    sd, "roi_heads.box_predictor.bbox_pred")}

    mask_head = {}
    for i in (1, 2, 3, 4):
        mask_head[f"mask_fcn{i}"] = _plain_conv(
            sd, f"roi_heads.mask_head.mask_fcn{i}")
    mask_head["deconv"] = {
        "kernel": _deconv(sd["roi_heads.mask_head.deconv.weight"]),
        "bias": sd["roi_heads.mask_head.deconv.bias"].astype(np.float32)}
    mask_head["predictor"] = _plain_conv(sd, "roi_heads.mask_head.predictor")

    return {"params": {"backbone": backbone, "fpn": fpn, "rpn": rpn,
                       "box_head": box_head, "mask_head": mask_head}}


def load_d2_pkl(path, depth=50, strict_heads=False, reference_params=None):
    """Load a detectron2 model-zoo .pkl checkpoint.

    When ``reference_params`` is given (a freshly initialized tree), any
    head whose shapes mismatch (e.g. COCO 80-class heads vs NUM_CLASSES=1)
    keeps its fresh initialization — the transfer-learning path of the
    reference workflow.
    """
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    sd = data.get("model", data)
    converted = convert_d2_state_dict(sd, depth=depth)
    if reference_params is None:
        return converted

    ref = jax.tree.map(np.asarray, reference_params)

    def merge(ref_node, conv_node, path=""):
        out = {}
        for k, rv in ref_node.items():
            cv = conv_node.get(k) if isinstance(conv_node, dict) else None
            if isinstance(rv, dict):
                out[k] = merge(rv, cv or {}, f"{path}/{k}")
            elif cv is not None and np.shape(cv) == np.shape(rv):
                out[k] = np.asarray(cv, rv.dtype)
            else:
                if strict_heads and cv is not None:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{np.shape(cv)} vs {np.shape(rv)}")
                out[k] = rv  # keep fresh init (new head)
        return out

    return merge(ref, converted)


def graft_backbone(params, ssl_path, expect_norm=None):
    """Replace ``params["params"]["backbone"]`` with the pretrained
    subtree from a tools/pretrain_backbone.py checkpoint.

    The SSL pretrainer names its ResNet "backbone" exactly like
    MaskRCNN (models/pretrain.py), so the subtree swaps in verbatim —
    this is the in-environment analogue of the reference's COCO
    transfer-learning init (reference GETTING_STARTED.md:30). Leaf
    structure is validated against the fresh init; a norm-family
    mismatch (GN checkpoint into a FrozenBN model) raises.
    """
    restored = restore_checkpoint(ssl_path)
    norm = None
    meta_path = Path(ssl_path).parent / "pretrain_meta.json"
    if meta_path.exists():
        import json
        norm = json.loads(meta_path.read_text()).get("norm")
    elif expect_norm:
        # GN and FrozenBN share an identical {scale, bias} param tree by
        # design (models/layers.py), so the structural check below CANNOT
        # catch a cross-norm graft — only the sidecar metadata can
        import warnings
        warnings.warn(
            f"{meta_path} not found: cannot verify the pretrained "
            f"backbone's norm family matches the model's "
            f"({expect_norm}); a GN/FrozenBN mismatch would load without "
            f"error and train from semantically wrong weights",
            stacklevel=2)
    if expect_norm and norm and norm.lower() != expect_norm.lower():
        raise ValueError(
            f"backbone checkpoint {ssl_path} was pretrained with norm="
            f"{norm}; the model is configured for {expect_norm}")
    new_bb = restored["params"]["backbone"]
    ref_bb = params["params"]["backbone"]
    ref_td = jax.tree_util.tree_structure(ref_bb)
    new_td = jax.tree_util.tree_structure(new_bb)
    if ref_td != new_td:
        raise ValueError(
            f"backbone param tree mismatch: model {ref_td} vs "
            f"checkpoint {new_td}")
    new_bb = jax.tree.map(lambda r, n: jnp.asarray(n, r.dtype),
                          ref_bb, new_bb)
    out = dict(params)
    out["params"] = dict(params["params"])
    out["params"]["backbone"] = new_bb
    print(f"grafted pretrained backbone from {ssl_path} "
          f"(norm={norm or 'unknown'})")
    return out


def load_weights(path, model=None, reference_params=None):
    """Dispatch: .pkl -> d2 converter; directory -> orbax."""
    path = Path(path)
    if path.suffix == ".pkl":
        if reference_params is None and model is not None:
            from ..models.mask_rcnn import init_params
            reference_params = init_params(model, jax.random.PRNGKey(0))
        return load_d2_pkl(path, reference_params=reference_params)
    restored = restore_checkpoint(path)
    if isinstance(restored, dict) and "params" in restored:
        # trainer checkpoint: strip optimizer state / step. EMA shadow
        # weights (SOLVER.EMA_DECAY), when present, are the inference
        # weights of record — prefer them over the raw final iterate.
        tree = restored.get("ema_params") or restored["params"]
        return {"params": tree["params"] if "params" in tree else tree}
    return {"params": restored}
