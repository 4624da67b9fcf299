"""Data loading for forward-KL (MLE) training.

The reference declares a dataloader variant of `loglikelihood` and leaves it
unimplemented (`src/objectives/loglikelihood.jl:35-43` TODO). Here:

  * :class:`NativeLoader` — ctypes binding to the C++ prefetching loader
    (`native/dataloader.cc`): mmapped float32 dataset, background shuffle +
    fill threads, zero-copy numpy views of ready batches. Built on first use
    with g++ (cached `.so`); a pure-numpy fallback covers hosts without a
    toolchain.
  * :func:`to_raw_file` — write an array to the loader's raw format.

Typical MLE loop: pull a chunk of batches, stack, and scan a jitted
update over them (see `train.train_flow_mle`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["NativeLoader", "NumpyLoader", "to_raw_file", "make_loader"]

_LIB = None
_LIB_ERR = None


def _native_src() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(
        os.path.join(here, "..", "..", "..", "native", "dataloader.cc")
    )


def _build_lib() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise _LIB_ERR
    src = _native_src()
    so_path = os.path.join(
        tempfile.gettempdir(),
        f"nf_dataloader_{os.path.getmtime(src):.0f}.so",
    )
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", src, "-o", so_path + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
    except Exception as e:  # toolchain missing / build failure
        _LIB_ERR = RuntimeError(f"native dataloader unavailable: {e}")
        raise _LIB_ERR
    lib.dl_open.restype = ctypes.c_int64
    lib.dl_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int64,
    ]
    lib.dl_next.restype = ctypes.POINTER(ctypes.c_float)
    lib.dl_next.argtypes = [ctypes.c_int64]
    lib.dl_release.restype = None
    lib.dl_release.argtypes = [ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]
    lib.dl_epoch.restype = ctypes.c_int64
    lib.dl_epoch.argtypes = [ctypes.c_int64]
    lib.dl_close.restype = None
    lib.dl_close.argtypes = [ctypes.c_int64]
    _LIB = lib
    return lib


def to_raw_file(path: str, data) -> str:
    """Write (n, dim) float32 row-major raw file (the loader's format)."""
    arr = np.ascontiguousarray(np.asarray(data, dtype=np.float32))
    if arr.ndim != 2:
        raise ValueError("data must be (n_rows, dim)")
    arr.tofile(path)
    return path


class NativeLoader:
    """Shuffled minibatch iterator over an mmapped raw float32 dataset,
    prefetched by C++ background threads."""

    def __init__(self, path: str, n_rows: int, dim: int, batch: int,
                 seed: int = 0, n_prefetch: int = 4):
        self._lib = _build_lib()
        self.n_rows, self.dim, self.batch = n_rows, dim, batch
        self._handle = self._lib.dl_open(
            path.encode(), n_rows, dim, batch, seed, n_prefetch
        )
        if self._handle < 0:
            raise IOError(f"cannot open dataset {path!r} "
                          f"({n_rows}x{dim} float32)")

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        """Next (batch, dim) array. The returned COPY is safe to hold; the
        underlying buffer returns to the prefetch ring immediately."""
        ptr = self._lib.dl_next(self._handle)
        view = np.ctypeslib.as_array(ptr, shape=(self.batch, self.dim))
        out = view.copy()
        self._lib.dl_release(self._handle, ptr)
        return out

    def next_batches(self, k: int) -> np.ndarray:
        """Stack k batches into (k, batch, dim) — the scan-chunk shape
        consumed by `train_flow_mle`."""
        return np.stack([next(self) for _ in range(k)])

    @property
    def epoch(self) -> int:
        return int(self._lib.dl_epoch(self._handle))

    def close(self):
        if self._handle >= 0:
            self._lib.dl_close(self._handle)
            self._handle = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NumpyLoader:
    """Pure-numpy fallback with the same interface."""

    def __init__(self, data, batch: int, seed: int = 0):
        self.data = np.asarray(data, dtype=np.float32)
        self.batch = batch
        self.dim = self.data.shape[1]
        self.n_rows = self.data.shape[0]
        self._rng = np.random.default_rng(seed)
        self._perm = self._rng.permutation(self.n_rows)
        self._cursor = 0
        self.epoch = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.dim), dtype=np.float32)
        for b in range(self.batch):
            if self._cursor >= self.n_rows:
                self._cursor = 0
                self.epoch += 1
                self._perm = self._rng.permutation(self.n_rows)
            out[b] = self.data[self._perm[self._cursor]]
            self._cursor += 1
        return out

    def next_batches(self, k: int) -> np.ndarray:
        return np.stack([next(self) for _ in range(k)])

    def close(self):
        pass


def make_loader(path_or_array, batch: int, n_rows: int | None = None,
                dim: int | None = None, seed: int = 0):
    """Native loader for a file path, numpy fallback for in-memory data.
    `.npy`/`.npz` paths are self-describing (shape in the header) and load
    through the numpy loader; raw float32 files need n_rows + dim and get
    the C++ prefetching loader."""
    if isinstance(path_or_array, (str, os.PathLike)):
        p = str(path_or_array)
        if p.endswith(".npy") or p.endswith(".npz"):
            loaded = np.load(p)
            if not isinstance(loaded, np.ndarray):  # npz: first array
                loaded = loaded[loaded.files[0]]
            return NumpyLoader(loaded, batch, seed)
        if n_rows is None or dim is None:
            raise ValueError("n_rows and dim required for file datasets")
        try:
            return NativeLoader(str(path_or_array), n_rows, dim, batch,
                                seed)
        except RuntimeError:
            data = np.fromfile(path_or_array, dtype=np.float32,
                               count=n_rows * dim).reshape(n_rows, dim)
            return NumpyLoader(data, batch, seed)
    return NumpyLoader(path_or_array, batch, seed)
