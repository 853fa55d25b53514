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
