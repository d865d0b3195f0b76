from . import losses, loop, step  # noqa: F401
