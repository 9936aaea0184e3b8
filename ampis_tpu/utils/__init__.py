from . import io, polygons, regionprops  # noqa: F401
