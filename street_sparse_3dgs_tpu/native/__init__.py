"""Native (C++) host-side components, bound via ctypes.

``save_ctm`` mirrors the reference's in-tree pybind11 module
(``ss_utils/depth_scripts/ctm_exporter/ctm_exporter.cpp:10-60``): write an
offset-centred OpenCTM mesh for the Cyclomedia depth-render pipeline.  The
shared library is compiled on first use (g++, cached next to the source);
a pure-Python writer serves as fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libctm_exporter.so"
_SRC_PATH = _DIR / "ctm_exporter.cpp"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(_SRC_PATH),
             "-o", str(_LIB_PATH)],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (_SRC_PATH.stat().st_mtime
                                  > _LIB_PATH.stat().st_mtime):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.save_ctm.restype = ctypes.c_int
    lib.save_ctm.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def save_ctm(filename, vertices: np.ndarray, triangles: np.ndarray,
             user_offset=(0.0, 0.0, 0.0)) -> None:
    """Write an OpenCTM (RAW) mesh; vertices [n,3] f32, triangles [m,3] i32,
    ``user_offset`` subtracted from every vertex."""
    verts = np.ascontiguousarray(vertices, np.float32)
    tris = np.ascontiguousarray(triangles, np.int32)
    off = np.ascontiguousarray(user_offset, np.float64)
    if verts.ndim != 2 or verts.shape[1] != 3:
        raise ValueError("vertices must be [n, 3]")
    if tris.ndim != 2 or tris.shape[1] != 3:
        raise ValueError("triangles must be [m, 3]")

    lib = _load()
    if lib is not None:
        rc = lib.save_ctm(
            str(filename).encode(),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            verts.shape[0],
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tris.shape[0],
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 0:
            raise IOError(f"save_ctm failed with code {rc}")
        return
    _save_ctm_python(filename, verts, tris, off)


def _save_ctm_python(filename, verts, tris, off) -> None:
    comment = b"street_sparse_3dgs_tpu ctm_exporter"
    with open(filename, "wb") as f:
        f.write(b"OCTM")
        f.write(struct.pack("<i", 5))
        f.write(b"RAW\x00")
        f.write(struct.pack("<iiiii", verts.shape[0], tris.shape[0], 0, 0,
                            0))
        f.write(struct.pack("<i", len(comment)))
        f.write(comment)
        f.write(b"INDX")
        f.write(tris.astype("<u4").tobytes())
        f.write(b"VERT")
        f.write((verts - off[None, :]).astype("<f4").tobytes())


def load_ctm(filename):
    """Minimal RAW-CTM reader (validation/tests): -> (verts [n,3] f32,
    tris [m,3] i32)."""
    with open(filename, "rb") as f:
        assert f.read(4) == b"OCTM"
        (version,) = struct.unpack("<i", f.read(4))
        method = f.read(4)
        if method != b"RAW\x00":
            raise ValueError(f"unsupported CTM method {method!r}")
        nv, nt, _, _, _ = struct.unpack("<iiiii", f.read(20))
        (clen,) = struct.unpack("<i", f.read(4))
        f.read(clen)
        assert f.read(4) == b"INDX"
        tris = np.frombuffer(f.read(12 * nt), "<u4").reshape(nt, 3)
        assert f.read(4) == b"VERT"
        verts = np.frombuffer(f.read(12 * nv), "<f4").reshape(nv, 3)
    return verts.copy(), tris.astype(np.int32)
