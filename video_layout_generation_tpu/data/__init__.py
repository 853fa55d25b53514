from .index import build_triplet_index
from .synthetic import SyntheticTriplets
from .cityscapes import CityscapesSequences, CityscapesTriplets
from .pipeline import HostLoader, ShardedLoader


def get_dataset(cfg):
    """Dataset factory (reference ``get_dataset(args)``, src/data.py:28-52):
    returns (train_dataset, val_dataset) for the configured dataset.

    With ``multistep_k > 1`` the TRAIN dataset carries K+2-frame windows
    (the multi-step training contract, train/multistep.py); validation
    stays on the reference triplet contract so val metrics remain
    comparable across K."""
    k = getattr(cfg, "multistep_k", 1)
    train_frames = k + 2 if k > 1 else 3
    if getattr(cfg, "scheduled_sampling", 0.0) > 0:
        # scheduled sampling (train/scheduled.py) needs a teacher step one
        # frame earlier: 4-frame windows
        train_frames = max(train_frames, 4)
    if cfg.dataset == "cityscape":
        if train_frames != 3:
            train = CityscapesSequences(cfg.train_dir, train_frames,
                                        cfg.image_size)
        else:
            train = CityscapesTriplets(cfg.train_dir, cfg.image_size)
        return train, CityscapesTriplets(cfg.val_dir, cfg.image_size)
    if cfg.dataset == "synthetic":
        # emit the compact-transfer uint8 encoding directly when the
        # pipeline ships uint8 anyway — skips two float conversions per
        # sample on the single host core
        u8 = getattr(cfg, "transfer_uint8", False) and cfg.n_classes <= 255
        return (SyntheticTriplets(cfg.synthetic_train_size, cfg.image_size,
                                  cfg.n_classes, seed=cfg.seed,
                                  emit_uint8=u8, n_frames=train_frames),
                SyntheticTriplets(cfg.synthetic_val_size, cfg.image_size,
                                  cfg.n_classes, seed=cfg.seed + 1,
                                  emit_uint8=u8))
    raise ValueError(f"Invalid dataset {cfg.dataset!r}")


__all__ = ["build_triplet_index", "SyntheticTriplets", "CityscapesTriplets",
           "HostLoader", "ShardedLoader", "get_dataset", "CityscapesSequences"]
