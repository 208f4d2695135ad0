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
