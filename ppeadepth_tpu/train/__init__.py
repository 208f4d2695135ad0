from . import freeze, schedule, step  # noqa: F401


def main(argv=None):
    from .__main__ import main as _main

    return _main(argv)
