"""Host-side input pipeline feeding sharded device arrays.

Replaces the reference's DataLoader + DistributedSampler stack
(src/trainer.py:145-152): a thread pool decodes samples ahead of time
(the reference's ``num_workers`` CPU workers), batches them into contiguous
NHWC host arrays, and a double-buffered prefetcher overlaps ``device_put``
(with a 'data'-axis NamedSharding) with the previous step's compute — the
TPU equivalent of pinned-memory H2D overlap.

Sharding-by-process + per-epoch reshuffle keyed on (seed, epoch) replaces
``DistributedSampler.set_epoch`` (src/trainer.py:161-162).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Dict, Iterator

import jax
import numpy as np

from ..parallel.mesh import batch_sharding


_TRIPLET_KEYS = ("img1", "img2", "img3", "seg1", "seg2", "seg3")


def pack_triplet_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse a uint8-encoded 6-field triplet batch into ONE (B,H,W,12) uint8
    array (channel layout: img1 0:3 | img2 3:6 | img3 6:9 | seg1 9 |
    seg2 10 | seg3 11). On tunneled/remote devices every host->device array
    op is a serial round-trip; one packed put measured ~40% cheaper than
    six separate puts at the b16 production shape. The jitted steps unpack
    device-side (train/steps.py:decode_batch — slicing fuses for free).
    Batches with other schemas (layout families, partial dicts) pass
    through unchanged."""
    if (set(batch) == {"imgs", "segs"}
            and batch["imgs"].dtype == np.uint8
            and batch["segs"].dtype == np.uint8):
        # window contract (multi-step training): ONE (B,T,H,W,4) upload
        return {"packedseq": np.concatenate(
            [batch["imgs"], batch["segs"][..., None]], axis=-1)}
    if (set(batch) != set(_TRIPLET_KEYS)
            or any(batch[k].dtype != np.uint8 for k in _TRIPLET_KEYS)):
        return batch
    b = batch
    return {"packed6": np.concatenate(
        [b["img1"], b["img2"], b["img3"], b["seg1"], b["seg2"],
         b["seg3"][..., None]], axis=-1)}


def encode_batch_uint8(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Compact-transfer encoding: float [0,1] frames -> uint8, layout class
    ids -> uint8. 4x less H2D traffic; the jitted steps decode on device
    (train/steps.py:decode_batch). Exact for 8-bit image sources (PNG) and
    for class ids < 256."""
    out = {}
    for k, v in batch.items():
        if k.startswith("img") and v.dtype == np.float32:
            out[k] = (v * 255.0 + 0.5).astype(np.uint8)
        elif k.startswith("seg") and v.dtype != np.uint8:
            out[k] = v.astype(np.uint8)
        else:
            out[k] = v
    return out


class HostLoader:
    """Deterministic shuffling, batching, parallel-decode iterator.

    ``transfer_uint8=True`` re-encodes batches via ``encode_batch_uint8``
    before they leave the host (only safe when class ids fit in uint8 —
    the caller gates on n_classes)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, workers: int = 4, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 transfer_uint8: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.transfer_uint8 = transfer_uint8
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        n = len(self.ds)
        if self.shuffle:
            rng = np.random.default_rng((self.seed << 16) ^ self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # shard by process (DistributedSampler equivalent): contiguous after
        # permutation, padded so every process sees the same count
        per = -(-n // self.process_count)
        pad = per * self.process_count - n
        if pad:
            order = np.concatenate([order, order[:pad]])
        return order[self.process_index::self.process_count]

    def __len__(self) -> int:
        per = -(-len(self.ds) // self.process_count)
        if self.drop_last:
            return per // self.batch_size
        return -(-per // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        if self.drop_last:
            order = order[: len(self) * self.batch_size]
        with cf.ThreadPoolExecutor(self.workers) as pool:
            # keep a bounded window of decode futures in flight
            max_inflight = max(2 * self.workers, self.batch_size)
            window: collections.deque = collections.deque()
            idx_iter = iter(order)
            exhausted = False
            batch_buf = []
            while True:
                while not exhausted and len(window) < max_inflight:
                    try:
                        i = next(idx_iter)
                    except StopIteration:
                        exhausted = True
                        break
                    window.append(pool.submit(self.ds.__getitem__, int(i)))
                if not window:
                    break
                batch_buf.append(window.popleft().result())
                if len(batch_buf) == self.batch_size:
                    yield self._collate(batch_buf)
                    batch_buf = []
            if batch_buf and not self.drop_last:
                yield self._collate(batch_buf)

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        if self.transfer_uint8:
            batch = pack_triplet_batch(encode_batch_uint8(batch))
        return batch


class ShardedLoader:
    """Wraps a HostLoader: device_put with batch sharding + prefetch.

    Multi-host: each process's HostLoader yields only its local shard of the
    global batch; ``jax.make_array_from_process_local_data`` assembles the
    global array (every process contributes its addressable shards), so the
    jitted steps see ONE global batch and every reduction inside them is
    globally correct — the TPU-native successor to the reference's
    per-rank loaders + explicit all_reduce (src/trainer.py:336-340).
    Single-host keeps the cheaper plain ``device_put``.
    """

    def __init__(self, loader: HostLoader, mesh, axis: str = "data",
                 prefetch: int = 2, put_thread: bool = False):
        self.loader = loader
        self.mesh = mesh
        self.axis = axis
        self.prefetch = max(1, prefetch)
        self.put_thread = put_thread

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def _put_fn(self):
        sh = batch_sharding(self.mesh, self.axis)
        if jax.process_count() > 1:
            return lambda b: jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sh, x), b)
        return lambda b: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), b)

    def __iter__(self):
        put = self._put_fn()
        it = iter(self.loader)
        if self.put_thread:
            # On remote/tunneled devices device_put is a BLOCKING serial
            # RPC, so the in-line window below never overlaps transfer with
            # the consumer's compute (measured: per-step wall 427 ms =
            # 263 ms transfer + 134.5 ms device step + RTT, additive).
            # A feeder thread performs collate+put while the consumer
            # dispatches compute, making wall -> max(transfer, compute).
            # Ordering (and therefore training trajectory) is unchanged.
            import queue as _queue
            import threading
            q: _queue.Queue = _queue.Queue(maxsize=self.prefetch)
            _END = object()
            err: list = []

            def feed():
                try:
                    for host_batch in it:
                        q.put(put(host_batch))
                except BaseException as e:  # surface in consumer
                    err.append(e)
                finally:
                    q.put(_END)

            t = threading.Thread(target=feed, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
            return
        # keep `prefetch` batches resident on device ahead of the consumer:
        # device_put is async, so H2D transfers overlap both the host decode
        # of later batches and the consumer's compute
        window: collections.deque = collections.deque()
        for host_batch in it:
            window.append(put(host_batch))
            if len(window) > self.prefetch:
                yield window.popleft()
        while window:
            yield window.popleft()
