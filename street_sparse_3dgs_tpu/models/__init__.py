from . import adam, densify, gaussians  # noqa: F401
