"""CLI flag parity: the reference README command lines must parse."""

from ppeadepth_tpu.options import parse_args


def test_stage1_command():
    opt = parse_args(
        "--adapter --use_checkpoint --validate_every 3000 "
        "--num_epochs 30 --data_path /data/kitti".split()
    )
    assert opt.adapter and opt.use_checkpoint
    assert opt.num_epochs == 30 and opt.validate_every == 3000
    assert opt.height == 192 and opt.width == 640
    assert opt.adpt_test == 4 and opt.depth_binning == "log"


def test_stage2_command():
    opt = parse_args(
        "--train_cs --dc --adapter --use_checkpoint "
        "--learning_rate 1e-5 --ktf --load_weights_folder ckpt/s1".split()
    )
    assert opt.dataset == "cityscapes_preprocessed"
    assert opt.height == 192 and opt.width == 512
    assert opt.eval_split == "cityscapes"
    assert opt.dc and opt.ktf and opt.learning_rate == 1e-5


def test_eval_command():
    opt = parse_args(
        "--eval --load_weights_folder ckpt/model --rep_size l "
        "--data_path /data/kitti".split()
    )
    assert opt.eval and opt.rep_size == "l"
    assert opt.num_ch_enc == (192, 384, 768, 1536)


def test_frame_ids_and_seed():
    opt = parse_args(
        "--frame_ids 0 -1 1 --pytorch_random_seed 42".split()
    )
    assert opt.frame_ids == (0, -1, 1)
    assert opt.pytorch_random_seed == 42


def test_dead_freeze_schedule_flags_rejected():
    """freeze_teacher_epoch/step never ran in the reference
    (trainer.py:410-414, commented out); setting them must fail loudly."""
    import pytest

    from ppeadepth_tpu.options import Config, parse_args

    with pytest.raises(ValueError, match="dead flags"):
        Config(freeze_teacher_step=100).with_mode_presets()
    with pytest.raises(ValueError, match="dead flags"):
        parse_args(["--freeze_teacher_epoch", "10"])
    # defaults stay accepted
    parse_args([])


def test_boolean_off_switches():
    """Every bool flag has a --no_<flag> form so default-True flags
    (remat_pose) are expressible as False from the CLI (round-3 gap)."""
    import dataclasses

    from ppeadepth_tpu.options import Config, parse_args

    assert Config().remat_pose is True
    assert parse_args(["--no_remat_pose"]).remat_pose is False
    assert parse_args(["--remat_pose"]).remat_pose is True
    # default-False flags round-trip both ways too
    assert parse_args(["--adapter"]).adapter is True
    assert parse_args(["--adapter", "--no_png"]).png is False
    # every bool field parses in both polarities (except `eval`, whose
    # off switch would collide with the reference's --no_eval flag, and
    # no_* fields, which would get a --no_no_* double negative)
    names = {f.name for f in dataclasses.fields(Config)}
    for f in dataclasses.fields(Config):
        if isinstance(getattr(Config(), f.name), bool) \
                and "no_" + f.name not in names \
                and not f.name.startswith("no_"):
            assert parse_args(["--" + f.name]).__getattribute__(f.name) \
                is True, f.name
            assert parse_args(["--no_" + f.name]).__getattribute__(f.name) \
                is False, f.name


def test_weights_init_validated():
    import pytest

    from ppeadepth_tpu.options import Config, parse_args

    with pytest.raises(AssertionError, match="weights_init"):
        Config(weights_init="imagenet").with_mode_presets()
    assert parse_args(["--weights_init", "scratch"]).weights_init == "scratch"


def test_dyn_cv_multi_frame_accepted():
    """--dyn_cv composes with num_matching_frames > 1 since round 5 (the
    per-frame feature in-fill of plane_sweep_cost_volume_dyn; the
    round-3/4 rejection is lifted)."""
    from ppeadepth_tpu.options import Config, parse_args

    cfg = Config(dyn_cv=True, num_matching_frames=2).with_mode_presets()
    assert cfg.dyn_cv and cfg.num_matching_frames == 2
    assert parse_args(["--dyn_cv"]).dyn_cv is True
