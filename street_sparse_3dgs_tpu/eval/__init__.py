from . import metrics, render_hier, render_position  # noqa: F401
