from . import ablation, evaluator, metrics  # noqa: F401
