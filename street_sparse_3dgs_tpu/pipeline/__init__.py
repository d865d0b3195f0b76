from . import full_train  # noqa: F401
