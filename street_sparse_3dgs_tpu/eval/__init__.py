from . import metrics, render_hier  # noqa: F401
