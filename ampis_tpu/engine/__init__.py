from .catalog import DatasetCatalog, MetadataCatalog  # noqa: F401
from .config import CfgNode, get_cfg  # noqa: F401
