from . import (calibration, chunk, colmap_db, colmap_runner, depth_decode,  # noqa: F401
               depth_scale, matchers, reorient, virtual_cams)
