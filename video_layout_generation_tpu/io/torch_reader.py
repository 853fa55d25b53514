"""Dependency-free reader for torch-serialized checkpoints.

The reference's pretrained artifacts are torch ``.pth`` files — torchvision's
VGG19 (reference src/loss.py:33) and an external HED checkpoint (reference
src/trainer.py:97-99). This module reads both of torch's serialization
formats into plain numpy arrays WITHOUT importing torch or torchvision, so
weight conversion works in any environment:

- the ZIP container format (``torch.save`` default since 1.6): a zipfile
  holding ``<root>/data.pkl`` (a pickle whose tensors are persistent-id
  references) plus one raw little-endian storage file per tensor under
  ``<root>/data/<key>``;
- the legacy streaming format (``_use_new_zipfile_serialization=False``):
  magic / protocol / sysinfo pickles, the object pickle, the list of
  storage keys, then each storage as ``int64 numel`` + raw bytes. Storage
  bytes follow the pickle, so tensor rebuilds are deferred and resolved in
  a final materialization pass.

Only the pickle opcodes needed for state dicts are honored: unpickling is
restricted to an allowlist (torch storage/tensor rebuild hooks, OrderedDict,
builtins containers) — anything else raises, so a malicious pickle cannot
execute code through this reader.

Usage:
    sd = read_torch_state_dict("vgg19-dcbb9e9d.pth")
    sd["features.0.weight"]  # numpy array, OIHW
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict, Optional

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


def _storage_dtype(name: str) -> np.dtype:
    if name == "BFloat16Storage":
        import ml_dtypes  # ships with jax
        return np.dtype(ml_dtypes.bfloat16)
    if name in _STORAGE_DTYPES:
        return _STORAGE_DTYPES[name]
    raise ValueError(f"unsupported torch storage type {name!r}")


class _StorageType:
    """Stand-in for torch.<X>Storage classes referenced by the pickle;
    carries only the dtype name."""

    def __init__(self, name: str):
        self.name = name


class _Storage:
    """A raw storage slot; ``data`` may be filled after the pickle parses
    (legacy format)."""

    def __init__(self, dtype: np.dtype, data: Optional[bytes] = None):
        self.dtype = dtype
        self.data = data

    @property
    def array(self) -> np.ndarray:
        if self.data is None:
            raise ValueError("storage bytes were never provided")
        return np.frombuffer(self.data, dtype=self.dtype)


class _PendingTensor:
    """Deferred tensor view: resolved once every storage has its bytes."""

    def __init__(self, storage: _Storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def resolve(self) -> np.ndarray:
        base = self.storage.array
        if not self.size:  # scalar tensor
            return base[self.offset:self.offset + 1].reshape(()).copy()
        itemsize = base.dtype.itemsize
        view = np.lib.stride_tricks.as_strided(
            base[self.offset:], shape=self.size,
            strides=tuple(s * itemsize for s in self.stride))
        return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    return _PendingTensor(storage, offset, size, stride)


# (module, name) -> replacement callable/class. Anything not listed raises.
_ALLOWED = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"):
        lambda data, requires_grad=False, backward_hooks=None: data,
    ("builtins", "dict"): dict,
    ("builtins", "list"): list,
    ("builtins", "set"): set,
    ("builtins", "tuple"): tuple,
    ("builtins", "bytearray"): bytearray,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file, encoding="utf-8")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        if module == "torch" and name == "Size":
            return tuple
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (not a state-dict type)")

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel[, view_metadata])
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = (storage_type.name if isinstance(storage_type, _StorageType)
                else getattr(storage_type, "__name__", str(storage_type)))
        return self._load_storage(str(key), _storage_dtype(name), int(numel))


def _materialize(obj):
    if isinstance(obj, _PendingTensor):
        return obj.resolve()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _read_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names
                        if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[:-len("data.pkl")]
        storages: Dict[str, _Storage] = {}

        def load_storage(key: str, dtype: np.dtype, numel: int) -> _Storage:
            if key not in storages:
                raw = zf.read(f"{root}data/{key}")
                storages[key] = _Storage(dtype, raw[:numel * dtype.itemsize])
            return storages[key]

        result = _Unpickler(io.BytesIO(zf.read(pkl_name)),
                            load_storage).load()
    return _materialize(result)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_legacy(f) -> Any:
    magic = pickle.load(f)
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch file (bad magic)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info
    storages: Dict[str, _Storage] = {}

    def load_storage(key: str, dtype: np.dtype, numel: int) -> _Storage:
        if key not in storages:
            storages[key] = _Storage(dtype)  # bytes follow the pickle
        return storages[key]

    result = _Unpickler(f, load_storage).load()
    keys = pickle.load(f)  # serialized storage keys, in write order
    for key in keys:
        storage = storages[str(key)]
        (numel,) = struct.unpack("<q", f.read(8))
        storage.data = f.read(numel * storage.dtype.itemsize)
    return _materialize(result)


def read_torch_checkpoint(path: str) -> Any:
    """Read a torch.save artifact (zip or legacy format) into numpy trees."""
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    with open(path, "rb") as f:
        return _read_legacy(f)


def read_torch_state_dict(path: str,
                          key: Optional[str] = None
                          ) -> Dict[str, np.ndarray]:
    """Read a checkpoint and return a flat name->numpy state dict.

    ``key`` selects a sub-dict for checkpoints that wrap the state dict
    (e.g. {'generator': sd} — the converter's --state-dict-key)."""
    obj = read_torch_checkpoint(path)
    if key is not None:
        obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint {path} did not contain a state dict")
    return {str(k): np.asarray(v) for k, v in obj.items()
            if isinstance(v, np.ndarray)}
