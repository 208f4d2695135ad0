"""One-off: run the full-model ref-vs-ours gradient comparison (the
machinery of tests/test_ref_loss_grad.py) and SAVE both gradient dicts
to an npz so mismatch metrics can be analyzed offline without re-running
the 30-min evaluation. CPU only.

Usage: python tools/debug_grad_parity.py /tmp/gradparity.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


class _TmpFactory:
    def __init__(self, base):
        self.base = base
        self.n = 0

    def mktemp(self, name):
        import pathlib

        self.n += 1
        p = pathlib.Path(self.base) / f"{name}{self.n}"
        p.mkdir(parents=True, exist_ok=True)
        return p


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gradparity.npz"
    import tempfile

    import tests.test_ref_loss_grad as T

    ref = T.load_reference_trainer()
    tmp = _TmpFactory(tempfile.mkdtemp(prefix="gradparity"))
    ref_model = T.ref_model.__wrapped__(ref, tmp)
    ours = T.ours_vars.__wrapped__(ref_model)
    run = T.full_model_run.__wrapped__(ref, ref_model, ours)

    from ppeadepth_tpu.ckpt import torch_import as TI

    ours_t = TI.export_state_dict(run["grads_j"], {})
    save = {"loss__": np.asarray([run["total_t"], run["total_j"],
                                  run["mono_t"], run["mono_j"],
                                  run["multi_t"], run["multi_j"]])}
    for name, g in run["grads_t"].items():
        if name in ours_t:
            save["t|" + name] = np.zeros(1) if g is None else g
            save["j|" + name] = np.asarray(ours_t[name])
    np.savez_compressed(out_path, **save)
    print("saved", out_path, len(save), "entries")


if __name__ == "__main__":
    main()
