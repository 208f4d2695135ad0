from . import metrics, evaluator  # noqa: F401
