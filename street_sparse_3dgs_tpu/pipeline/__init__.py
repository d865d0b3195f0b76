from . import experiments, full_train  # noqa: F401
