"""Python binding + serialization for the native trajectory store.

Replaces the reference's LMDB replay store + zlib(msgpack_numpy) pipeline
(`dagger_trainer.py:36-37,148-177,336-356`). Records are dicts of numpy
arrays packed with a self-contained binary format (json header + raw
buffers); compression and batched IO live in native/trajstore.cpp (built
on demand with g++). A pure-Python fallback keeps the same on-disk format
when no compiler is available.
"""
from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
import threading
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "trajstore.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_LIB_DIR, "libtrajstore.so")
_BUILD_LOCK = threading.Lock()


def _build_lib() -> Optional[str]:
    with _BUILD_LOCK:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        os.makedirs(_LIB_DIR, exist_ok=True)
        cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", _LIB, "-lz", "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return _LIB
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"[trajstore] native build failed ({e}); using python fallback")
            return None


_lib_handle = None
_lib_tried = False


def _get_lib():
    global _lib_handle, _lib_tried
    if _lib_tried:
        return _lib_handle
    _lib_tried = True
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ts_writer_open.restype = ctypes.c_void_p
    lib.ts_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ts_writer_append_batch.restype = ctypes.c_int64
    lib.ts_writer_append_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.ts_writer_flush.argtypes = [ctypes.c_void_p]
    lib.ts_writer_close.argtypes = [ctypes.c_void_p]
    lib.ts_reader_open.restype = ctypes.c_void_p
    lib.ts_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ts_reader_count.restype = ctypes.c_int64
    lib.ts_reader_count.argtypes = [ctypes.c_void_p]
    lib.ts_reader_raw_size.restype = ctypes.c_int64
    lib.ts_reader_raw_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ts_reader_get.restype = ctypes.c_int64
    lib.ts_reader_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_int64]
    lib.ts_reader_close.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


# ---------------------------------------------------------------------------
# record (de)serialization: {'obs': {k: arr}, 'prev_actions': arr, ...}
# ---------------------------------------------------------------------------
_MAGIC = b"WSTJ"


def pack_record(tree: Dict[str, Any]) -> bytes:
    """Flatten a nested dict of numpy arrays into one buffer."""
    arrays: List[np.ndarray] = []
    meta: List[Dict[str, Any]] = []

    def walk(node, prefix):
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], prefix + (k,))
        else:
            arr = np.ascontiguousarray(node)
            meta.append({
                "key": list(prefix),
                "dtype": arr.dtype.str,
                "shape": list(arr.shape),
            })
            arrays.append(arr)

    walk(tree, ())
    header = json.dumps(meta).encode()
    parts = [_MAGIC, struct.pack("<I", len(header)), header]
    for arr in arrays:
        parts.append(arr.tobytes())
    return b"".join(parts)


def unpack_record(buf: bytes) -> Dict[str, Any]:
    assert buf[:4] == _MAGIC, "corrupt trajstore record"
    (hlen,) = struct.unpack("<I", buf[4:8])
    meta = json.loads(buf[8:8 + hlen].decode())
    out: Dict[str, Any] = {}
    off = 8 + hlen
    for m in meta:
        dtype = np.dtype(m["dtype"])
        count = int(np.prod(m["shape"])) if m["shape"] else 1
        nbytes = dtype.itemsize * count
        arr = np.frombuffer(buf, dtype, count=count, offset=off).reshape(m["shape"])
        off += nbytes
        node = out
        for k in m["key"][:-1]:
            node = node.setdefault(k, {})
        node[m["key"][-1]] = arr
    return out


# ---------------------------------------------------------------------------
class TrajStoreWriter:
    """Per-rank shard writer with batched multithreaded compression."""

    def __init__(self, directory: str, rank: int = 0, level: int = 6,
                 threads: int = 8):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.rank = rank
        self.level = level
        self.threads = threads
        self._lib = _get_lib()
        if self._lib is not None:
            self._h = self._lib.ts_writer_open(directory.encode(), rank)
            if not self._h:
                self._lib = None
        if self._lib is None:
            self._bin = open(os.path.join(directory, f"shard_{rank}.bin"), "ab")
            self._idx = open(os.path.join(directory, f"shard_{rank}.idx"), "ab")
            self._off = self._bin.tell()

    def append_batch(self, records: Sequence[bytes]) -> int:
        if not records:
            return 0
        if self._lib is not None:
            n = len(records)
            bufs = (ctypes.c_char_p * n)(*records)
            lens = (ctypes.c_int64 * n)(*[len(r) for r in records])
            wrote = self._lib.ts_writer_append_batch(
                self._h, n, bufs, lens, self.level, self.threads)
            assert wrote == n, f"short write {wrote}/{n}"
            return n
        for rec in records:
            comp = zlib.compress(rec, self.level)
            self._bin.write(comp)
            self._idx.write(struct.pack("<QQQ", self._off, len(comp), len(rec)))
            self._off += len(comp)
        return len(records)

    def flush(self):
        if self._lib is not None:
            self._lib.ts_writer_flush(self._h)
        else:
            self._bin.flush()
            self._idx.flush()

    def close(self):
        if self._lib is not None:
            self._lib.ts_writer_close(self._h)
            self._lib = None
        else:
            self._bin.close()
            self._idx.close()


class TrajStoreReader:
    def __init__(self, directory: str, max_ranks: int = 64):
        self.directory = directory
        self._lib = _get_lib()
        if self._lib is not None:
            self._h = self._lib.ts_reader_open(directory.encode(), max_ranks)
            self._count = int(self._lib.ts_reader_count(self._h))
        else:
            self._entries: List[Tuple[str, int, int, int]] = []
            for rank in range(max_ranks):
                idx = os.path.join(directory, f"shard_{rank}.idx")
                if not os.path.exists(idx):
                    continue
                binp = os.path.join(directory, f"shard_{rank}.bin")
                raw = open(idx, "rb").read()
                for i in range(len(raw) // 24):
                    off, csz, rsz = struct.unpack_from("<QQQ", raw, i * 24)
                    self._entries.append((binp, off, csz, rsz))
            self._count = len(self._entries)

    def __len__(self) -> int:
        return self._count

    def get(self, i: int) -> bytes:
        if self._lib is not None:
            raw_size = int(self._lib.ts_reader_raw_size(self._h, i))
            assert raw_size >= 0, f"bad record {i}"
            out = ctypes.create_string_buffer(raw_size)
            got = self._lib.ts_reader_get(self._h, i, out, raw_size)
            assert got == raw_size, f"read failed: {got}"
            return out.raw
        binp, off, csz, rsz = self._entries[i]
        with open(binp, "rb") as f:
            f.seek(off)
            comp = f.read(csz)
        return zlib.decompress(comp)

    def close(self):
        if self._lib is not None:
            self._lib.ts_reader_close(self._h)
            self._lib = None
