from . import profiling, vis  # noqa: F401
