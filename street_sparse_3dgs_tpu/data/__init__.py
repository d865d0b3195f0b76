from . import colmap, ply, scene, toy  # noqa: F401
