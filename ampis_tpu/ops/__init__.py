from . import box_ops, nms, paste, roi_align  # noqa: F401
