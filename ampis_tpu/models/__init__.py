from . import anchors, fpn, mask_rcnn, resnet, roi_heads, rpn  # noqa: F401
from .mask_rcnn import MaskRCNN, build_model  # noqa: F401
