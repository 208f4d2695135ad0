from . import freeze, schedule, step  # noqa: F401
