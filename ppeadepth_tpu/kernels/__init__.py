from . import lk_conv  # noqa: F401
