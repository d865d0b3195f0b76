from .rasterize import rasterize, RasterConfig  # noqa: F401
