"""Typed configuration for the framework.

The reference threads an argparse namespace god-object through every layer
(reference src/main.py:86-160). Here the config surface is a frozen dataclass;
``build_arg_parser``/``config_from_args`` provide a CLI shim with the same
flag names so existing invocations carry over (reference src/main.py:86-158).
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # -- dataset -----------------------------------------------------------
    dataset: str = "cityscape"          # 'cityscape' | 'synthetic'
    train_dir: str = "/data/train"
    val_dir: str = "/data/val"
    test_dir: str = "/data/test"
    image_size: Tuple[int, int] = (256, 256)
    n_classes: int = 20
    synthetic_train_size: int = 64      # samples when dataset == 'synthetic'
    synthetic_val_size: int = 16

    # -- mode --------------------------------------------------------------
    validate: bool = False              # run validation only
    edge: bool = True                   # include HNED edge channels in input
    val_interval: int = 1

    # -- model -------------------------------------------------------------
    arch: str = "CoordGridNet"          # 'GridNet' | 'CoordGridNet' | 'ResnetGenerator'
    generator: str = "ResnetGenerator"
    discriminator: str = "NLayerDiscriminator"
    input_nc: int = 8                   # channels w/o edges; +2 when edge=True
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    netD: str = "basic"                 # 'basic' | 'n_layers' | 'pixel'
    netG: str = "resnet_9blocks"        # 'resnet_9blocks' | 'resnet_6blocks' | 'unet_256' | 'unet_128'
    n_layers_D: int = 3
    norm: str = "instance"              # 'instance' | 'batch' | 'none'
    filters_level: Tuple[int, int, int] = (32, 64, 96)  # GridNet row widths
    init_type: str = "normal"           # 'normal' | 'xavier' | 'kaiming' | 'orthogonal'
    init_gain: float = 0.02
    no_dropout: bool = False
    gan_mode: str = "lsgan"             # 'lsgan' | 'vanilla' | 'wgangp'
    gan_train: bool = False             # enable adversarial G/D alternating updates

    # -- optimization ------------------------------------------------------
    batch_size: int = 32                # global batch (split over the mesh)
    epochs: int = 10
    optimizer: str = "adam"             # 'adam' | 'adamax' | 'sgd'
    lr: float = 2e-4
    beta1: float = 0.5
    adam_mu_dtype: str = "float32"      # 'bfloat16': store Adam's first
                                        # moment reduced (train/state.py) —
                                        # halves m-buffer HBM traffic,
                                        # opt-in (changes numerics)
    lr_decay_step: int = 5              # epochs between decays (sgd)
    lr_decay_gamma: float = 0.1
    start_epoch: int = 1
    # pix2pix-style schedulers (reference src/models/networks.py:38-64);
    # None keeps the reference Trainer behavior (sgd epoch decay only)
    lr_policy: Optional[str] = None     # 'linear' | 'step' | 'plateau' | 'cosine'
    niter: int = 100                    # linear: constant epochs; cosine: T_max
    niter_decay: int = 100              # linear: decay-to-zero epochs
    lr_decay_iters: int = 50            # step: epochs per 0.1x decay
    epoch_count: int = 1                # linear: starting epoch offset

    # -- loss weights (reference src/trainer.py:248-251) --------------------
    w_l1: float = 40.0
    w_style: float = 20.0
    w_seg: float = 10.0

    # -- multi-step training (beyond-reference; train/multistep.py) ----------
    # K > 1 trains on K autoregressive steps (backprop through the rollout,
    # loss averaged over steps); samples then carry K+2-frame windows.
    # K = 1 is the reference objective.
    multistep_k: int = 1
    multistep_remat: bool = True        # jax.checkpoint each unrolled step
    multistep_discount: float = 1.0     # < 1 up-weights LATE steps: step i
                                        # weight = discount**(K-1-i), mean-
                                        # normalized (1.0 = plain mean)
    multistep_feedback_noise: float = 0.0  # N(0, sigma) on the fed-back
                                        # predicted frame during training
    multistep_layout_noise: float = 0.0  # p of replacing each fed-back
                                        # layout pixel with a random class
                                        # (layout-channel robustness lever)
    multistep_image_weight: float = 1.0  # scales the image terms (l1+style)
                                        # vs seg inside the K-step loss,
                                        # scale-renormalized (image drift is
                                        # the binding rollout constraint)
    multistep_image_discount: float = 1.0  # < 1 up-weights EARLY steps'
                                        # image terms (weight = g**i, mean-
                                        # normalized): early frames are
                                        # re-fed and their errors compound
    scheduled_sampling: float = 0.0     # p of feeding the model its own
                                        # (detached) prediction as the newest
                                        # input pair (train/scheduled.py);
                                        # needs 4-frame windows, excludes
                                        # multistep_k > 1
    scheduled_ramp: int = 0             # epochs to ramp p from 0 to the
                                        # final value (0 = constant)

    # -- precision / performance -------------------------------------------
    compute_dtype: str = "bfloat16"     # activation dtype inside the nets
    loss_dtype: str = "float32"         # losses always reduced in fp32
    remat: bool = False                 # jax.checkpoint the grid columns
    fast_rollout: bool = True           # packed (space-to-depth) executor
                                        # for inference when arch supports it
    fast_train: bool = True             # packed executor inside the train /
                                        # eval steps too (exact same grads;
                                        # measured 1.26x on v5e)

    transfer_uint8: bool = True         # ship batches host->device as uint8
                                        # (4x less H2D; exact for 8-bit PNG
                                        # sources; decoded on device)
    device_data: bool = False           # synthetic only: render training
                                        # batches ON device from the scene
                                        # table (zero per-step H2D traffic;
                                        # data/device_synthetic.py)
    epoch_scan: bool = False            # with device_data: run each whole
                                        # training epoch as ONE compiled
                                        # lax.scan (one dispatch per epoch;
                                        # train/epoch_scan.py)
    chunk_steps: int = 0                # > 1: host-fed chunked dispatch —
                                        # upload K batches as one array, run
                                        # K steps per compiled program
                                        # (train/chunk_scan.py); works with
                                        # ANY dataset, unlike epoch_scan
    put_thread: bool = False            # host-fed loaders: collate+device_put
                                        # on a feeder thread so the (blocking,
                                        # serial-RPC on tunneled devices) H2D
                                        # transfer overlaps the train step
                                        # (data/pipeline.py ShardedLoader).
                                        # OFF by default: the axon tunnel
                                        # client HANGS under concurrent
                                        # device RPCs from two threads
                                        # (observed 2026-08-20: train step
                                        # compiled+cached, then 12 min of
                                        # all-threads-blocked silence);
                                        # safe+tested on local backends.

    # -- runtime ------------------------------------------------------------
    workers: int = 4
    seed: int = 1024
    print_freq: int = 10
    disp_interval: int = 10
    path: Optional[str] = None          # experiment dir
    ckpt: Optional[str] = None          # warm-start weights
    resume: Optional[str] = None        # full resume (epoch+model+opt)
    port: Optional[int] = None          # kept for CLI compat; unused on TPU

    # -- rollout ------------------------------------------------------------
    img1: Optional[str] = None
    img2: Optional[str] = None
    seg1: Optional[str] = None
    seg2: Optional[str] = None
    rollout_frames: int = 8
    # edge-mode rollout: run HNED on a 1/k downsample (opt-in approximation;
    # HNED dominates edge-mode rollout cost — train/rollout.py)
    rollout_edge_scale: int = 1
    # rollout up-block interpolation: "bilinear" (exact reference math) or
    # "nearest" (opt-in approximation; the stencil blends are ~14% of the
    # packed rollout — BENCH_NOTES cost map). Packed executors only.
    rollout_upsample: str = "bilinear"
    # beyond reference: every N epochs, roll out on fixed held-out scenes
    # and log per-step mIoU (the north-star fidelity curve). 0 = off.
    # Synthetic dataset only (needs the sequence() contract).
    rollout_fidelity_every: int = 0
    rollout_fidelity_scenes: int = 8

    # -- pretrained weight artifacts ----------------------------------------
    hed_weights: Optional[str] = None   # converted HNED weights (.npz)
    vgg_weights: Optional[str] = None   # converted VGG19 weights (.npz)

    # -- parallelism ---------------------------------------------------------
    mesh_shape: Optional[Sequence[int]] = None   # default: all devices on 'data'

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def model_in_channels(self) -> int:
        """Channels fed to the predictor: e1(1)+s1(1)+f1(3)+f2(3)+s2(1)+e2(1)
        (reference src/trainer.py:197) or 8 without edges."""
        return 10 if self.edge else 8


def default_exp_path() -> str:
    return "../log/exp-{0}".format(
        datetime.datetime.now().strftime("%m-%d-%H:%M:%S"))


def build_arg_parser() -> argparse.ArgumentParser:
    """Argparse shim with the reference's flag names (src/main.py:86-158)."""
    p = argparse.ArgumentParser(
        description="Train a video layout generation network (TPU-native)")
    p.add_argument("-d", "--dataset", type=str, default="cityscape",
                   choices=["cityscape", "synthetic"])
    p.add_argument("--train_dir", type=str, default="/data/train")
    p.add_argument("--val_dir", type=str, default="/data/val")
    p.add_argument("--test_dir", type=str, default="/data/test")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--edge", action="store_true", default=True)
    p.add_argument("--no_edge", dest="edge", action="store_false")
    p.add_argument("--val_interval", type=int, default=1)
    p.add_argument("-a", "--arch", type=str, default="CoordGridNet",
                   choices=["GridNet", "CoordGridNet", "ResnetGenerator"])
    p.add_argument("--discriminator", type=str, default="NLayerDiscriminator")
    p.add_argument("--generator", type=str, default="ResnetGenerator")
    p.add_argument("-bs", "--batch_size", type=int, default=32)
    p.add_argument("-e", "--epochs", type=int, default=10)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--img1", type=str, default=None)
    p.add_argument("--img2", type=str, default=None)
    p.add_argument("--seg1", type=str, default=None)
    p.add_argument("--seg2", type=str, default=None)
    p.add_argument("-j", "--workers", type=int, default=4)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("-p", "--path", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--start_epoch", type=int, default=1)
    p.add_argument("--disp_interval", type=int, default=10)
    p.add_argument("--o", dest="optimizer", default="adam",
                   choices=["adamax", "adam", "sgd"])
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--adam_mu_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of Adam's first moment")
    p.add_argument("--lr_decay_step", type=int, default=5)
    p.add_argument("--lr_decay_gamma", type=float, default=0.1)
    p.add_argument("--lr_policy", type=str, default=None,
                   choices=["linear", "step", "plateau", "cosine"])
    p.add_argument("--niter", type=int, default=100)
    p.add_argument("--niter_decay", type=int, default=100)
    p.add_argument("--lr_decay_iters", type=int, default=50)
    p.add_argument("--epoch_count", type=int, default=1)
    p.add_argument("--input_nc", type=int, default=8)
    p.add_argument("--output_nc", type=int, default=3)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--netD", type=str, default="basic")
    p.add_argument("--netG", type=str, default="resnet_9blocks")
    p.add_argument("--n_layers_D", type=int, default=3)
    p.add_argument("--norm", type=str, default="instance")
    p.add_argument("--init_type", type=str, default="normal")
    p.add_argument("--init_gain", type=float, default=0.02)
    p.add_argument("--no_dropout", action="store_true")
    p.add_argument("--gan_mode", type=str, default="lsgan")
    p.add_argument("--gan_train", action="store_true")
    p.add_argument("--hed_weights", type=str, default=None)
    p.add_argument("--vgg_weights", type=str, default=None)
    p.add_argument("--rollout_frames", type=int, default=8)
    p.add_argument("--rollout_edge_scale", type=int, default=1)
    p.add_argument("--rollout_upsample", type=str, default="bilinear",
                   choices=("bilinear", "nearest"))
    p.add_argument("--rollout_fidelity_every", type=int, default=0)
    p.add_argument("--rollout_fidelity_scenes", type=int, default=8)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--loss_dtype", type=str, default="float32")
    p.add_argument("--remat", action="store_true")
    # -- fields beyond the reference's flag surface (src/main.py:86-158);
    # every Config field is CLI-reachable (audited in tests/test_config_cli)
    p.add_argument("--image_size", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    p.add_argument("--n_classes", type=int, default=20)
    p.add_argument("--synthetic_train_size", type=int, default=64)
    p.add_argument("--synthetic_val_size", type=int, default=16)
    p.add_argument("--filters_level", type=int, nargs=3, default=(32, 64, 96),
                   metavar=("R0", "R1", "R2"))
    p.add_argument("--w_l1", type=float, default=40.0)
    p.add_argument("--w_style", type=float, default=20.0)
    p.add_argument("--w_seg", type=float, default=10.0)
    p.add_argument("--fast_train", dest="fast_train", action="store_true",
                   default=True)
    p.add_argument("--no_fast_train", dest="fast_train",
                   action="store_false")
    p.add_argument("--fast_rollout", dest="fast_rollout",
                   action="store_true", default=True)
    p.add_argument("--no_fast_rollout", dest="fast_rollout",
                   action="store_false")
    p.add_argument("--mesh_shape", type=int, nargs="+", default=None,
                   help="device mesh shape; default: all devices on 'data'")
    p.add_argument("--transfer_uint8", dest="transfer_uint8",
                   action="store_true", default=True)
    p.add_argument("--no_transfer_uint8", dest="transfer_uint8",
                   action="store_false")
    p.add_argument("--multistep_k", type=int, default=1,
                   help="train on K autoregressive steps (1 = reference)")
    p.add_argument("--multistep_discount", type=float, default=1.0,
                   help="per-step loss weight discount**(K-1-i): < 1 "
                        "up-weights late steps (1.0 = plain mean)")
    p.add_argument("--multistep_feedback_noise", type=float, default=0.0,
                   help="sigma of Gaussian noise on the fed-back frame")
    p.add_argument("--multistep_layout_noise", type=float, default=0.0,
                   help="p of corrupting each fed-back layout pixel to a "
                        "random class during K-step training")
    p.add_argument("--multistep_image_weight", type=float, default=1.0,
                   help="scale on the image terms (l1+style) vs seg in the "
                        "K-step loss, total renormalized (1.0 = reference "
                        "weighting)")
    p.add_argument("--multistep_image_discount", type=float, default=1.0,
                   help="per-step image-term weight g**i, mean-normalized: "
                        "< 1 up-weights EARLY steps' image fidelity")
    p.add_argument("--scheduled_sampling", type=float, default=0.0,
                   help="scheduled-sampling probability (0 = teacher-forced)")
    p.add_argument("--scheduled_ramp", type=int, default=0,
                   help="epochs to ramp scheduled_sampling from 0 (0 = "
                        "constant)")
    p.add_argument("--device_data", action="store_true", default=False,
                   help="synthetic only: render training batches on device")
    p.add_argument("--epoch_scan", action="store_true", default=False,
                   help="with --device_data: one compiled scan per epoch")
    p.add_argument("--chunk_steps", type=int, default=0,
                   help="host-fed chunked dispatch: K steps per compiled "
                        "program, K batches per upload (0 = per-step)")
    p.add_argument("--put_thread", dest="put_thread",
                   action="store_true", default=False,
                   help="feeder-thread device_put overlap (hangs the "
                        "tunneled axon client; use on local backends)")
    p.add_argument("--multistep_remat", dest="multistep_remat",
                   action="store_true", default=True)
    p.add_argument("--no_multistep_remat", dest="multistep_remat",
                   action="store_false")
    return p


def config_from_args(argv=None) -> Config:
    args = build_arg_parser().parse_args(argv)
    names = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in names}
    for k in ("image_size", "filters_level", "mesh_shape"):
        if kw.get(k) is not None:
            kw[k] = tuple(kw[k])
    return Config(**kw)
