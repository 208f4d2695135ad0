from . import geometry, losses  # noqa: F401
