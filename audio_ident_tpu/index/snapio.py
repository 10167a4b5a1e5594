"""Streaming, atomic snapshot container for big NumPy arrays.

Round 1 used ``np.savez_compressed`` (zlib-6) written in place; at the
1M-track target (~46 GB of postings) that is both too slow (~30 MB/s) and
unsafe (a crash mid-write leaves a truncated file that fails to load —
ADVICE.md round 1).  This container:

- streams each array through zstandard (level 3, ~hundreds of MB/s) with
  bounded peak memory (no whole-buffer copies);
- writes to ``<name>.tmp`` and ``os.replace``s into place, so a snapshot
  file is either the old complete one or the new complete one;
- keeps a JSON header (names, dtypes, shapes) so loads are self-describing.

Format: ``b"AISNAP01" | u32 header_len | header_json | zstd(arrays…)``
with arrays concatenated in header order as raw C-contiguous bytes.
"""

from __future__ import annotations

import json
import os
import struct
from pathlib import Path

import numpy as np
import zstandard

MAGIC = b"AISNAP01"
_CHUNK = 8 << 20
# zstd-1 with 2 worker threads: measured 371 MB/s vs 70 MB/s for the
# round-3 single-threaded zstd-3 on CSR posting arrays (5.3x), at +6%
# file size (129 vs 122 MB per 419 MB input).  At the 1M-track/~35 GB
# BASELINE shape that is ~2 min per checkpoint instead of ~25 — the
# difference between "snapshot cadence" and "nightly job".  zstdmt
# overlaps compression with the write syscalls, so 2 threads win even
# on this 1-vCPU host; decompression (restore) reads the same frames.
_LEVEL = 1
_THREADS = 2


def save_arrays(
    path: str | Path,
    arrays: dict[str, np.ndarray],
    level: int = _LEVEL,
    threads: int = _THREADS,
) -> None:
    """Atomically write ``arrays`` to ``path`` (tmp file + rename).

    ``threads=0`` disables zstd-internal multithreading — the per-shard
    snapshot writer runs one single-threaded compressor per shard file
    instead (parallelism across files, not within one)."""
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    header = {
        name: {"dtype": str(a.dtype), "shape": list(a.shape)}
        for name, a in arrays.items()
    }
    hdr = json.dumps(header).encode("utf-8")
    cctx = zstandard.ZstdCompressor(level=level, threads=threads)
    with open(tmp, "wb") as raw:
        raw.write(MAGIC)
        raw.write(struct.pack("<I", len(hdr)))
        raw.write(hdr)
        with cctx.stream_writer(raw, closefd=False) as zf:
            for name in header:
                a = np.ascontiguousarray(arrays[name])
                mv = memoryview(a.reshape(-1).view(np.uint8))
                for i in range(0, len(mv), _CHUNK):
                    zf.write(mv[i : i + _CHUNK])
        raw.flush()
        os.fsync(raw.fileno())
    os.replace(tmp, path)


def load_arrays(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    with open(path, "rb") as raw:
        if raw.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not an AISNAP01 snapshot")
        (hdr_len,) = struct.unpack("<I", raw.read(4))
        header = json.loads(raw.read(hdr_len).decode("utf-8"))
        dctx = zstandard.ZstdDecompressor()
        out: dict[str, np.ndarray] = {}
        with dctx.stream_reader(raw) as zf:
            for name, meta in header.items():
                dtype = np.dtype(meta["dtype"])
                shape = tuple(meta["shape"])
                n = int(np.prod(shape, dtype=np.int64))
                buf = bytearray(n * dtype.itemsize)
                view = memoryview(buf)
                pos = 0
                while pos < len(buf):
                    got = zf.read(min(_CHUNK, len(buf) - pos))
                    if not got:
                        raise ValueError(f"{path}: truncated array {name}")
                    view[pos : pos + len(got)] = got
                    pos += len(got)
                del view
                out[name] = np.frombuffer(buf, dtype=dtype).reshape(shape)
        return out


def atomic_write_text(path: str | Path, text: str) -> None:
    """Atomic + durable: fsync the tmp file before the rename and the
    directory after it.  The snapshot MANIFEST is the commit point that
    authorizes WAL truncation — if the rename itself isn't durable, a
    power loss after ``commit_snapshot`` deleted the sealed segments
    could leave neither the WAL nor the new manifest on disk."""
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(text)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    dir_fd = os.open(path.parent, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)
