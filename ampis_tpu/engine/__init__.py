from .catalog import DatasetCatalog, MetadataCatalog  # noqa: F401
from .config import CfgNode, get_cfg  # noqa: F401


def __getattr__(name):
    # lazy: these pull in jax/flax/optax
    if name == "DefaultPredictor":
        from .predictor import DefaultPredictor
        return DefaultPredictor
    if name == "Trainer":
        from .trainer import Trainer
        return Trainer
    if name == "TTAPredictor":
        from .tta import TTAPredictor
        return TTAPredictor
    if name == "ProfilerHook":
        from .profiling import ProfilerHook
        return ProfilerHook
    if name == "trace":
        from .profiling import trace
        return trace
    raise AttributeError(name)
