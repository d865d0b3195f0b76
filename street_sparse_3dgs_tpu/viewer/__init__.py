from . import network_gui  # noqa: F401
