from . import build, io, merge, render, structure  # noqa: F401
