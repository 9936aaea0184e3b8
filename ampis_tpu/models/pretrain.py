"""Self-supervised backbone pretraining: masked-patch reconstruction.

The reference workflow's quality ceiling comes from transfer learning —
fine-tuning COCO-pretrained R50 weights (`model_final_f10217.pkl`,
reference GETTING_STARTED.md:13,30). This environment has no network
egress, so those weights are unreachable; this module fills the same
slot *in-environment* by pretraining the R50 backbone on the shipped SEM
imagery itself with a masked-image-modeling pretext (MAE-style
per-patch-normalized pixel reconstruction, He et al. 2022, adapted to a
conv backbone by aligning the mask patch size to res5's stride so each
res5 position must reconstruct exactly the patch it cannot see).

TPU notes: the whole step is one jit — backbone fwd/bwd at batch x 256^2
in bf16 keeps the MXU busy; the only host traffic per step is the uint8
crop batch and the boolean patch mask. The decoder is a single Dense
(per-res5-position linear head -> 32x32 pixels), so >99% of the FLOPs
are in the backbone being pretrained.

The saved checkpoint's ``params["backbone"]`` subtree is name-compatible
with MaskRCNN's ``backbone`` (models/mask_rcnn.py names the ResNet
"backbone" too), so the trainer can graft it verbatim
(cfg.MODEL.BACKBONE_WEIGHTS, engine/trainer.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet


class MaskedReconstructor(nn.Module):
    """R50 backbone + linear pixel decoder for masked-patch pretraining.

    ``patch`` must equal the res5 stride (32) so the mask grid and the
    decoder grid coincide: each res5 feature vector predicts the
    ``patch x patch`` grayscale pixels of its own (hidden) input patch,
    forcing the backbone to integrate surrounding context.
    """
    depth: int = 50
    norm: str = "GN"
    patch: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, patch_mask):
        """images: (B, H, W, 3) standardized float; patch_mask:
        (B, H//patch, W//patch) bool, True = patch hidden from the
        backbone. Returns (loss, aux dict)."""
        p = self.patch
        b, h, w, _ = images.shape
        hp, wp = h // p, w // p

        # hide masked patches from the encoder (zero = dataset mean in
        # standardized units)
        vis = 1.0 - patch_mask.astype(images.dtype)
        pixel_vis = jnp.repeat(jnp.repeat(vis, p, axis=1), p, axis=2)
        feats = ResNet(depth=self.depth, norm_type=self.norm,
                       dtype=self.dtype, name="backbone")(
                           images * pixel_vis[..., None])["res5"]

        # per-position linear decoder -> patch pixels (grayscale)
        pred = nn.Dense(p * p, dtype=self.dtype, name="decoder")(feats)
        pred = pred.reshape(b, hp, wp, p * p).astype(jnp.float32)

        # per-patch-normalized grayscale targets (MAE recipe): predicting
        # local contrast rather than absolute brightness stops the loss
        # from being dominated by SEM illumination gradients.
        gray = images.astype(jnp.float32).mean(axis=-1)
        patches = gray.reshape(b, hp, p, wp, p).transpose(0, 1, 3, 2, 4)
        patches = patches.reshape(b, hp, wp, p * p)
        mu = patches.mean(axis=-1, keepdims=True)
        sd = patches.std(axis=-1, keepdims=True) + 1e-6
        target = (patches - mu) / sd

        err = jnp.square(pred - target).mean(axis=-1)  # (B, hp, wp)
        m = patch_mask.astype(jnp.float32)
        loss = (err * m).sum() / jnp.maximum(m.sum(), 1.0)
        return loss, {"recon_loss": loss}


def init_pretrain_params(model: MaskedReconstructor, rng, size=256):
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    mask = jnp.zeros((1, size // model.patch, size // model.patch), bool)
    return jax.jit(model.init)(rng, images, mask)
