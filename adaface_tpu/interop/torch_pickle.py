"""Torch-free reader for PyTorch checkpoint files.

Reads the torch >=1.6 zipfile serialization format (SD v1.5 `.ckpt`, the
reference's `embeddings_gs-*.pt`) into numpy arrays with a *restricted*
unpickler — no torch import, no arbitrary code execution. This covers
SURVEY.md §7.2 step 1 including its flagged risk: `embeddings.pt` pickles
live `nn.Module` objects (static embedders, subj-basis generators,
`embedding_manager.py:1820-1834`); unknown classes deserialize into generic
`TorchObjectStub`s that preserve `_parameters` / `_buffers` / `_modules`
state so the param-extraction layer can walk them as plain trees.

Safety model: only tensor-rebuild helpers and containers are mapped to real
constructors; everything else becomes an inert stub whose state is data-only.
REDUCE on a stub records args instead of calling anything.
"""

from __future__ import annotations

import io
import pickle
import struct as pystruct
import zipfile
from typing import Any, Dict, Optional

import numpy as np

# torch storage typename -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (numpy has no bf16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class TorchObjectStub:
    """Inert stand-in for any non-allowlisted pickled class (e.g. torch
    nn.Modules inside embeddings.pt). Captures the class name and the
    __setstate__/__dict__ payload for later tree-walking."""

    def __init__(self, qualname: str):
        self.__dict__["_stub_qualname"] = qualname
        self.__dict__["_stub_args"] = None

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state

    def __call__(self, *args, **kwargs):  # REDUCE on a stub: record, don't run
        rec = TorchObjectStub(self._stub_qualname + "()")
        rec.__dict__["_stub_args"] = (args, kwargs)
        return rec

    def __repr__(self):
        return f"<stub {self.__dict__.get('_stub_qualname')}>"


class _LazyStorage:
    """Handle to a storage blob inside the zip; read on demand."""

    def __init__(self, zf: zipfile.ZipFile, key: str, dtype, numel: int, archive_root: str):
        self.zf, self.key, self.dtype, self.numel = zf, key, dtype, numel
        self.archive_root = archive_root
        self._data = None

    def data(self) -> np.ndarray:
        if self._data is None:
            name = f"{self.archive_root}/data/{self.key}"
            raw = self.zf.read(name)
            if self.dtype is None:  # bfloat16: upcast via uint16 bit tricks
                u16 = np.frombuffer(raw, dtype=np.uint16)
                u32 = u16.astype(np.uint32) << 16
                self._data = u32.view(np.float32)
            else:
                self._data = np.frombuffer(raw, dtype=self.dtype)
        return self._data


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    if not isinstance(storage, _LazyStorage):
        raise ValueError(f"unexpected storage {storage!r}")
    flat = storage.data()
    size = tuple(size)
    stride = tuple(stride)
    if len(size) == 0:
        return flat[storage_offset].copy()
    # as_strided equivalent (contiguous fast path first)
    expected = [1] * len(size)
    for i in range(len(size) - 2, -1, -1):
        expected[i] = expected[i + 1] * size[i + 1]
    n = int(np.prod(size))
    if stride == tuple(expected):
        return flat[storage_offset:storage_offset + n].reshape(size).copy()
    return np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=size,
        strides=tuple(s * flat.itemsize for s in stride)).copy()


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class AttrDict(dict):
    """dict that tolerates pickle BUILD with instance attrs (torch
    state_dicts carry a `_metadata` attribute on their OrderedDict)."""


_SAFE_BUILTINS = {
    ("collections", "OrderedDict"): AttrDict,
    ("builtins", "set"): set,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "list"): list,
    ("builtins", "dict"): dict,
    ("builtins", "tuple"): tuple,
    ("builtins", "int"): int,
    ("builtins", "float"): float,
    ("builtins", "complex"): complex,
    ("builtins", "str"): str,
    ("builtins", "bytes"): bytes,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("numpy.core.multiarray", "scalar"): lambda dt, b: np.frombuffer(b, dtype=dt)[0],
    ("numpy.core.multiarray", "_reconstruct"): None,  # replaced below
    ("numpy", "dtype"): np.dtype,
    ("numpy", "ndarray"): np.ndarray,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}


def _np_reconstruct(subtype, shape, dtype):
    return np.ndarray.__new__(np.ndarray, shape, dtype)


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, archive_root: str):
        super().__init__(file)
        self._zf = zf
        self._root = archive_root

    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in _SAFE_BUILTINS:
            fn = _SAFE_BUILTINS[key]
            return _np_reconstruct if fn is None else fn
        if module == "torch" and name in _STORAGE_DTYPES:
            # storage *type* object: used only as a tag inside persistent_id
            return name
        # Everything else (nn.Module subclasses, omegaconf, argparse
        # Namespace, ...) becomes an inert stub factory.
        qualname = f"{module}.{name}"

        class _Factory(TorchObjectStub):
            def __new__(cls, *a, **k):
                obj = TorchObjectStub(qualname)
                if a or k:
                    obj.__dict__["_stub_args"] = (a, k)
                return obj

        _Factory.__name__ = name
        return _Factory

    def persistent_load(self, pid):
        # pid = ('storage', storage_type_tag, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        if isinstance(storage_type, str):
            type_name = storage_type
        else:  # torch.storage.TypedStorage wrapper path
            type_name = getattr(storage_type, "__name__", str(storage_type))
        if type_name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unknown storage type {type_name}")
        return _LazyStorage(self._zf, key, _STORAGE_DTYPES[type_name], numel, self._root)


def load_torch_checkpoint(path: str) -> Any:
    """Load a torch-zip checkpoint into a tree of dict/list/np.ndarray/stubs."""
    zf = zipfile.ZipFile(path)
    pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl_names:
        raise ValueError(f"{path} is not a torch zipfile checkpoint")
    root = pkl_names[0][: -len("/data.pkl")]
    up = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_names[0])), zf, root)
    return up.load()


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal standalone safetensors reader (header JSON + raw blobs)."""
    import json

    dtypes = {
        "F32": np.float32, "F16": np.float16, "F64": np.float64,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_, "BF16": None,
    }
    out = {}
    with open(path, "rb") as f:
        (hlen,) = pystruct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            dt = dtypes[meta["dtype"]]
            if dt is None:  # bf16 -> f32
                u16 = np.frombuffer(raw, dtype=np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(raw, dtype=dt)
            out[name] = arr.reshape(meta["shape"]).copy()
    return out


def save_safetensors(tensors: Dict[str, np.ndarray], path: str,
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Minimal standalone safetensors writer (header JSON + raw blobs) —
    the export mirror of `load_safetensors`, so checkpoints produced here
    load directly in diffusers/safetensors without torch in this process."""
    import json

    names = {
        np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
        np.dtype(np.float64): "F64", np.dtype(np.int64): "I64",
        np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
        np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
        np.dtype(np.bool_): "BOOL",
    }
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    blobs = []
    off = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">":  # tags (F32, ...) imply little-endian
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        if arr.dtype not in names:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        raw = arr.tobytes()
        header[name] = {"dtype": names[arr.dtype],
                        "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        blobs.append(raw)
        off += len(raw)
    hdr = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(pystruct.pack("<Q", len(hdr)))
        f.write(hdr)
        for raw in blobs:
            f.write(raw)


def load_sd_state_dict(path: str) -> Dict[str, Any]:
    """Load a flat SD-style state dict from either checkpoint container:
    torch-zip `.ckpt`/`.pt`/`.bin` (through the torch-free unpickler, with
    the Lightning `state_dict` wrapper unwrapped) or a single-file
    `.safetensors` export. The reference only reads torch pickles
    (`main.py:27-50`); single-file `.safetensors` is how SD v1.5 weights
    are distributed today, so both routes land on the same dict shape."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    ckpt = load_torch_checkpoint(path)
    if isinstance(ckpt, dict):
        return ckpt.get("state_dict", ckpt)
    return ckpt


def walk_stub_tree(obj: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a loaded checkpoint tree (incl. nn.Module stubs) into
    dotted-name -> ndarray, mirroring what `state_dict()` would have produced.
    Used to extract params from the pickled modules inside embeddings.pt."""
    flat: Dict[str, np.ndarray] = {}

    def rec(o, pfx):
        if isinstance(o, np.ndarray):
            flat[pfx.rstrip(".")] = o
        elif isinstance(o, dict):
            for k, v in o.items():
                rec(v, f"{pfx}{k}.")
        elif isinstance(o, (list, tuple)):
            for i, v in enumerate(o):
                rec(v, f"{pfx}{i}.")
        elif isinstance(o, TorchObjectStub):
            d = o.__dict__
            for container in ("_parameters", "_buffers"):
                for k, v in (d.get(container) or {}).items():
                    if isinstance(v, np.ndarray):
                        flat[f"{pfx}{k}"] = v
            for k, v in (d.get("_modules") or {}).items():
                rec(v, f"{pfx}{k}.")
            for k, v in d.items():
                if k.startswith("_stub") or k in ("_parameters", "_buffers", "_modules"):
                    continue
                if isinstance(v, (np.ndarray, dict, list, tuple, TorchObjectStub)):
                    rec(v, f"{pfx}{k}.")

    rec(obj, prefix)
    return flat
