"""AMPIS-TPU: TPU-native materials instance segmentation.

A from-scratch rebuild of the AMPIS toolkit (rccohn/AMPIS) for TPU hardware:
the public API of the reference package (analyze, data_utils, structures,
visualize, applications) is preserved, while the Detectron2/PyTorch Mask
R-CNN dependency is replaced by a JAX/Flax R50-FPN Mask R-CNN with Pallas
kernels (ampis_tpu.models, ampis_tpu.ops, ampis_tpu.engine) and the
pycocotools C codec is replaced by a multithreaded C++ RLE library
(ampis_tpu.rle, csrc/rle.cpp).
"""

from . import analyze  # noqa: F401
from . import applications  # noqa: F401
from . import data_utils  # noqa: F401
from . import structures  # noqa: F401
from . import visualize  # noqa: F401

__version__ = "0.1.0"

__all__ = ["analyze", "data_utils", "structures", "visualize",
           "applications", "__version__"]
