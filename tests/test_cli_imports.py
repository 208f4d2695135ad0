"""Every CLI entry point must import and expose main (guards against the
package/module shadowing class of bugs)."""

import importlib

import pytest

ENTRY_POINTS = [
    "ppeadepth_tpu.train.__main__",
    "ppeadepth_tpu.evaluate_depth",
    "ppeadepth_tpu.evaluate_ddad",
    "ppeadepth_tpu.evaluate_depth_layer",
    "ppeadepth_tpu.export_gt_depth",
    "ppeadepth_tpu.convert",
]


@pytest.mark.parametrize("mod", ENTRY_POINTS)
def test_entry_point_has_main(mod):
    m = importlib.import_module(mod)
    assert callable(getattr(m, "main"))


def test_package_main_wrapper():
    from ppeadepth_tpu import train

    assert callable(train.main)
