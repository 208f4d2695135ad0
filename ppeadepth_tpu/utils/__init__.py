from . import misc, profiling, vis  # noqa: F401
