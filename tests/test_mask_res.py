"""High-resolution mask head: MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 28.

The mask branch is resolution-agnostic end to end (targets are cropped at
``mask_logits.shape[1]``, SoftMasks/paste/RLE take the crop size from the
array), so doubling the pooler resolution trains and serves 56x56 masks
with no other change. The reference's detectron2 head is fixed at
14->28 (SURVEY.md §2b ROI-heads row); 56x56 is this framework's
quality-mode extension targeting high-IoU (AP75) mask fidelity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params

pytestmark = pytest.mark.slow

KW = dict(
    num_classes=1,
    pre_nms_topk_train=64, pre_nms_topk_test=64,
    post_nms_topk_train=32, post_nms_topk_test=32,
    rpn_batch_per_image=32, roi_batch_per_image=16,
    detections_per_image=8,
)


def test_mask_head_56x56_inference_and_loss():
    model = MaskRCNN(mask_pooler_resolution=28, **KW)
    params = init_params(model, jax.random.PRNGKey(0))

    h = w = 96
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(1, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]], jnp.float32)

    out = jax.jit(
        lambda p, im, sz: model.apply(p, im, sz, method=MaskRCNN.inference)
    )(params, images, sizes)
    assert out["masks"].shape == (1, 8, 56, 56)
    assert np.isfinite(np.asarray(out["masks"])).all()

    # one synthetic GT instance; dense-mask (reference-style) target path
    gt_boxes = jnp.asarray([[[20.0, 20.0, 70.0, 60.0]]])
    gt_classes = jnp.zeros((1, 1), jnp.int32)
    gt_valid = jnp.ones((1, 1), bool)
    m = np.zeros((1, 1, h, w), np.uint8)
    m[0, 0, 20:60, 20:70] = 1
    losses = jax.jit(
        lambda p, im, sz, gb, gc, gv, gm, r: model.apply(
            p, im, sz, gb, gc, gv, gm, r, method=MaskRCNN.losses)
    )(params, images, sizes, gt_boxes, gt_classes, gt_valid,
      jnp.asarray(m), jax.random.PRNGKey(1))
    assert set(losses) >= {"loss_mask", "loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
