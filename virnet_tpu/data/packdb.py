"""packdb — ctypes bindings for the native packed patch database.

TPU-native replacement for the reference's LMDB pipeline
(datasets/DenoisingDatasets.py:21-99): the writer packs fixed-size uint8
(noisy, gt) records into one file; the native sampler (native/packdb.cpp)
mmaps it and produces whole augmented batches with a C++ thread pool — one
ctypes call per batch, no DataLoader workers.

The shared library builds on demand with g++ and is cached next to the
source; environments without a toolchain fall back to the pure-python
PairedPatchSampler.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"VPK1"
_SRC = Path(__file__).resolve().parents[2] / "native" / "packdb.cpp"
_LIB_PATH = _SRC.with_suffix(".so")
_lib = None


def _build_library() -> Path:
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(_SRC), "-o", str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_library() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.packdb_open.restype = ctypes.c_void_p
        lib.packdb_open.argtypes = [ctypes.c_char_p]
        lib.packdb_close.argtypes = [ctypes.c_void_p]
        lib.packdb_num_records.restype = ctypes.c_int
        lib.packdb_num_records.argtypes = [ctypes.c_void_p]
        lib.packdb_shape.argtypes = [ctypes.c_void_p] + \
            [ctypes.POINTER(ctypes.c_int)] * 4
        lib.packdb_sample.restype = ctypes.c_int
        lib.packdb_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        _lib = lib
    return _lib


def write_packdb(path, noisy: np.ndarray,
                 gt: Optional[np.ndarray] = None) -> None:
    """Write (N, H, W, C) uint8 record arrays into a pack file."""
    noisy = np.ascontiguousarray(noisy, dtype=np.uint8)
    paired = gt is not None
    if paired:
        gt = np.ascontiguousarray(gt, dtype=np.uint8)
        assert gt.shape == noisy.shape
    n, h, w, c = noisy.shape
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<5I", n, h, w, c, int(paired)))
        for i in range(n):
            f.write(noisy[i].tobytes())
            if paired:
                f.write(gt[i].tobytes())


def read_packdb_arrays(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read a whole pack back as (noisy, gt) uint8 arrays (gt None for
    unpaired packs).  Inverse of write_packdb; pure python (no .so needed)
    — for tooling/tests, not the training hot path."""
    raw = Path(path).read_bytes()
    if raw[:4] != _MAGIC:
        raise ValueError(f"not a packdb file: {path}")
    n, h, w, c, paired = struct.unpack("<5I", raw[4:24])
    rec = h * w * c
    per = rec * (2 if paired else 1)
    body = np.frombuffer(raw, np.uint8, count=n * per, offset=24)
    body = body.reshape(n, 2 if paired else 1, h, w, c)
    noisy = body[:, 0]
    gt = body[:, 1] if paired else None
    return noisy, gt


class PackDBSampler:
    """Batch sampler over a pack file; same call surface as
    PairedPatchSampler (data/sources.py)."""

    def __init__(self, path, patch_size: int, seed: int = 0,
                 num_threads: int = 0):
        self.lib = get_library()
        self.handle = self.lib.packdb_open(str(path).encode())
        if not self.handle:
            raise OSError(f"cannot open packdb: {path}")
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        paired = ctypes.c_int()
        self.lib.packdb_shape(self.handle, ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(c), ctypes.byref(paired))
        self.rec_shape = (h.value, w.value, c.value)
        self.paired = bool(paired.value)
        self.patch_size = patch_size
        self.num_threads = num_threads
        self.seed = seed
        self._counter = 0

    def __len__(self):
        return self.lib.packdb_num_records(self.handle)

    def reset_seed(self, seed: int):
        self.seed = seed
        self._counter = 0

    def sample(self, batch_size: int, raw: bool = False):
        """One augmented batch.  ``raw=True`` returns uint8 — the trainers
        normalize in-graph, so the host->device transfer is 4x smaller
        (the win on a 1-core host feeding a remote chip is ~an order of
        magnitude of input wait; on a TPU VM it's PCIe traffic)."""
        p = self.patch_size
        c = self.rec_shape[2]
        out_a = np.empty((batch_size, p, p, c), dtype=np.uint8)
        out_b = np.empty_like(out_a) if self.paired else None
        seed = (self.seed << 20) + self._counter
        self._counter += 1
        ret = self.lib.packdb_sample(
            self.handle, batch_size, p, seed,
            out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if out_b is not None else None,
            self.num_threads)
        if ret != 0:
            raise RuntimeError(f"packdb_sample failed: {ret}")
        if raw:
            return (out_a, out_b) if self.paired else out_a
        a = out_a.astype(np.float32) / 255.0
        if self.paired:
            return a, out_b.astype(np.float32) / 255.0
        return a

    def close(self):
        if self.handle:
            self.lib.packdb_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pack_from_folders(noisy_dir, out_path, keys=("sidd",)) -> int:
    """Pack a SIDD-style paired patch folder tree into one pack file."""
    from ..ops.color import imread

    noisy_paths = sorted(
        p for p in Path(noisy_dir).glob("*.png")
        if any(k in p.stem for k in keys)) or \
        sorted(Path(noisy_dir).glob("*.png"))
    gt_paths = [Path(p).parents[1] / "gt" / Path(p).name
                for p in noisy_paths]
    noisy = np.stack([imread(p, chn="rgb", dtype="uint8")
                      for p in noisy_paths])
    gt = np.stack([imread(p, chn="rgb", dtype="uint8") for p in gt_paths])
    write_packdb(out_path, noisy, gt)
    return noisy.shape[0]
