"""Config CLI shim: the reference's flag surface must parse
(src/main.py:86-158 names)."""

from video_layout_generation_tpu.config import Config, config_from_args


def test_reference_flag_names_parse():
    cfg = config_from_args([
        "-d", "cityscape", "--train_dir", "/t", "--val_dir", "/v",
        "--validate", "-a", "GridNet", "--discriminator",
        "NLayerDiscriminator", "--generator", "ResnetGenerator",
        "-bs", "16", "-e", "3", "--resume", "/ckpt", "--img1", "a.png",
        "--img2", "b.png", "--seg1", "c.png", "--seg2", "d.png",
        "-j", "2", "--port", "1234", "--seed", "7", "--print_freq", "5",
        "-p", "/exp", "--ckpt", "/warm", "--start_epoch", "2",
        "--disp_interval", "20", "--o", "sgd", "--lr", "0.01",
        "--beta1", "0.9", "--lr_decay_step", "3", "--lr_decay_gamma", "0.5",
        "--input_nc", "8", "--output_nc", "3", "--ngf", "32", "--ndf", "16",
        "--netD", "pixel", "--netG", "unet_256", "--n_layers_D", "4",
        "--norm", "batch", "--init_type", "xavier", "--init_gain", "0.1",
        "--no_dropout", "--gan_mode", "wgangp",
    ])
    assert cfg.dataset == "cityscape"
    assert cfg.validate and cfg.arch == "GridNet"
    assert cfg.batch_size == 16 and cfg.epochs == 3
    assert cfg.optimizer == "sgd" and cfg.lr == 0.01 and cfg.beta1 == 0.9
    assert cfg.netD == "pixel" and cfg.netG == "unet_256"
    assert cfg.norm == "batch" and cfg.init_type == "xavier"
    assert cfg.no_dropout and cfg.gan_mode == "wgangp"
    assert cfg.resume == "/ckpt" and cfg.ckpt == "/warm"


def test_defaults_match_reference():
    cfg = config_from_args([])
    # reference defaults (src/main.py:101-158)
    assert cfg.arch == "CoordGridNet"
    assert cfg.batch_size == 32 and cfg.epochs == 10
    assert cfg.lr == 2e-4 and cfg.beta1 == 0.5
    assert cfg.norm == "instance" and cfg.gan_mode == "lsgan"
    assert cfg.seed == 1024 and cfg.workers == 4
    assert cfg.model_in_channels == 10  # edges on by default


def test_model_in_channels_tracks_edges():
    assert Config(edge=True).model_in_channels == 10
    assert Config(edge=False).model_in_channels == 8


def test_every_config_field_is_cli_reachable():
    """Audit: each Config field must have a matching argparse dest, so the
    full config surface is reachable from the reference-compatible CLI."""
    import dataclasses

    from video_layout_generation_tpu.config import build_arg_parser

    dests = {a.dest for a in build_arg_parser()._actions}
    fields = {f.name for f in dataclasses.fields(Config)}
    missing = fields - dests
    assert not missing, f"Config fields without CLI flags: {sorted(missing)}"


def test_extended_flags_parse_and_convert():
    cfg = config_from_args([
        "--image_size", "128", "192", "--n_classes", "30",
        "--filters_level", "16", "32", "48", "--mesh_shape", "4", "2",
        "--no_fast_train", "--no_fast_rollout", "--w_l1", "10",
        "--w_style", "5", "--w_seg", "2", "--val_interval", "3",
        "--synthetic_train_size", "8", "--synthetic_val_size", "4",
        "--loss_dtype", "float32",
    ])
    assert cfg.image_size == (128, 192) and cfg.n_classes == 30
    assert cfg.filters_level == (16, 32, 48)
    assert cfg.mesh_shape == (4, 2)
    assert not cfg.fast_train and not cfg.fast_rollout
    assert cfg.w_l1 == 10 and cfg.w_style == 5 and cfg.w_seg == 2
    assert cfg.val_interval == 3
    assert cfg.synthetic_train_size == 8 and cfg.synthetic_val_size == 4
