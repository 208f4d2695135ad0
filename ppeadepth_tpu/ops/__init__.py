from . import sampling, resize, cost_volume  # noqa: F401
