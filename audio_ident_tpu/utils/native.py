"""ctypes bindings for the C++ runtime library (native/libaudioident.so).

No pybind11 exists in this image, so the library exposes a C ABI and the
binding is plain ctypes over NumPy buffers.  Everything here is OPTIONAL:
callers fall back to NumPy implementations when the library isn't built
(``make native`` builds it).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

from audio_ident_tpu import spec

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libaudioident.so"

# packing bounds frozen in the C++ (native/src/lsm_kernels.cc)
_MAX_TRACK = 1 << 21
_MAX_TIME = 1 << 17


def build_native() -> bool:
    """Compile the library; returns success.

    Compiles to a process-private temp name and ``os.replace``s it into
    place so concurrent builders (several service/test processes starting
    on a fresh checkout) never load a half-written .so.
    """
    import os

    src = _NATIVE_DIR / "src" / "lsm_kernels.cc"
    if not src.exists():
        return False
    tmp = _LIB_PATH.parent / f".libaudioident.{os.getpid()}.so"
    try:
        subprocess.run(
            [
                os.environ.get("CXX", "g++"),
                "-O3", "-march=native", "-std=c++17", "-fPIC",
                "-Wall", "-Wextra", "-shared", "-o", str(tmp), str(src),
            ],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        native_lib.cache_clear()
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return False


_AUTOBUILD_TRIED = False


def _autobuild_once() -> bool:
    """First-use auto-build: a fresh checkout must not silently run the
    NumPy fallbacks (measured 3.5x slower LSM compaction).  One attempt
    per process; failures (no compiler, read-only tree) fall back quietly."""
    global _AUTOBUILD_TRIED
    if _AUTOBUILD_TRIED:
        return _LIB_PATH.exists()
    _AUTOBUILD_TRIED = True
    return build_native()


@functools.lru_cache(maxsize=1)
def native_lib() -> ctypes.CDLL | None:
    """The loaded library, or None when not built/available.

    Missing .so triggers ONE in-process build attempt (see
    ``_autobuild_once``).  ``AUDIO_IDENT_NO_NATIVE=1`` forces the NumPy
    fallbacks — the isolation switch for debugging suspected
    native-memory issues.
    """
    import os

    if os.environ.get("AUDIO_IDENT_NO_NATIVE") == "1":
        return None
    if not _LIB_PATH.exists() and not _autobuild_once():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ai_sort_postings.argtypes = [i32p, i32p, i32p, ctypes.c_int64]
    lib.ai_sort_postings.restype = None
    lib.ai_merge_postings.argtypes = [
        i32p, i32p, i32p, ctypes.c_int64,
        i32p, i32p, i32p, ctypes.c_int64,
        u8p, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i64p,
    ]
    lib.ai_merge_postings.restype = ctypes.c_int64
    if hasattr(lib, "ai_merge_csr"):
        lib.ai_merge_csr.argtypes = [
            i64p, i32p, i32p,
            i32p, i32p, i32p, ctypes.c_int64,
            u8p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i64p,
        ]
        lib.ai_merge_csr.restype = ctypes.c_int64
    if hasattr(lib, "ai_count_live"):
        lib.ai_count_live.argtypes = [i32p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.ai_count_live.restype = ctypes.c_int64
    if hasattr(lib, "ai_merge_csr_range"):
        lib.ai_merge_csr_range.argtypes = [
            i64p, i32p, i32p,
            i32p, i32p, i32p, ctypes.c_int64,
            u8p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i64p,
        ]
        lib.ai_merge_csr_range.restype = ctypes.c_int64
    lib.ai_hamming_batch.argtypes = [
        u32p, ctypes.c_int64, u32p, i64p, ctypes.c_int64, f64p,
    ]
    lib.ai_hamming_batch.restype = None
    return lib


def _check_bounds(track: np.ndarray, time: np.ndarray) -> bool:
    if len(track) == 0:
        return True
    return (
        int(track.max(initial=0)) < _MAX_TRACK
        and int(track.min(initial=0)) >= 0
        and int(time.max(initial=0)) < _MAX_TIME
        and int(time.min(initial=0)) >= 0
    )


def sort_postings(h: np.ndarray, track: np.ndarray, time: np.ndarray):
    """(hash, track, time) lexsort — native radix when available.

    Returns sorted copies; falls back to np.lexsort.
    """
    lib = native_lib()
    if lib is not None and _check_bounds(track, time):
        hs = np.ascontiguousarray(h, np.int32).copy()
        rs = np.ascontiguousarray(track, np.int32).copy()
        ts = np.ascontiguousarray(time, np.int32).copy()
        lib.ai_sort_postings(hs, rs, ts, len(hs))
        return hs, rs, ts
    order = np.lexsort((time, track, h))
    return (
        np.asarray(h, np.int32)[order],
        np.asarray(track, np.int32)[order],
        np.asarray(time, np.int32)[order],
    )


def merge_postings(
    h_a, r_a, t_a, h_b, r_b, t_b, track_valid: np.ndarray
):
    """Merge two sorted runs, drop tombstones, build CSR offsets.

    Returns (tracks, times, offsets[HASH_SPACE+1] int64).  Native merge when
    available; NumPy fallback otherwise.
    """
    lib = native_lib()
    n_total = len(h_a) + len(h_b)
    if (
        lib is not None
        and _check_bounds(np.asarray(r_a), np.asarray(t_a))
        and _check_bounds(np.asarray(r_b), np.asarray(t_b))
    ):
        r_out = np.empty(n_total, np.int32)
        t_out = np.empty(n_total, np.int32)
        offsets = np.empty(spec.HASH_SPACE + 1, np.int64)
        tv = np.ascontiguousarray(track_valid, np.uint8)
        n = lib.ai_merge_postings(
            np.ascontiguousarray(h_a, np.int32),
            np.ascontiguousarray(r_a, np.int32),
            np.ascontiguousarray(t_a, np.int32),
            len(h_a),
            np.ascontiguousarray(h_b, np.int32),
            np.ascontiguousarray(r_b, np.int32),
            np.ascontiguousarray(t_b, np.int32),
            len(h_b),
            tv, len(tv), spec.HASH_SPACE,
            r_out, t_out, offsets,
        )
        return r_out[:n].copy(), t_out[:n].copy(), offsets
    # NumPy fallback
    h = np.concatenate([np.asarray(h_a, np.int64), np.asarray(h_b, np.int64)])
    r = np.concatenate([np.asarray(r_a, np.int32), np.asarray(r_b, np.int32)])
    t = np.concatenate([np.asarray(t_a, np.int32), np.asarray(t_b, np.int32)])
    live = track_valid[np.clip(r, 0, len(track_valid) - 1)] & (r >= 0)
    h, r, t = h[live], r[live], t[live]
    order = np.lexsort((t, r, h))
    h, r, t = h[order], r[order], t[order]
    counts = np.bincount(h, minlength=spec.HASH_SPACE)
    offsets = np.zeros(spec.HASH_SPACE + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return r.astype(np.int32), t.astype(np.int32), offsets


def merge_postings_csr(
    offsets_a, r_a, t_a, h_b, r_b, t_b, track_valid: np.ndarray
):
    """Merge a CSR main run with a sorted delta run, dropping tombstones.

    Unlike ``merge_postings`` this never materializes the main run's
    per-posting hashes — the C++ kernel walks the CSR offsets bucket by
    bucket (round-1 compaction spiked multi-GB on the np.repeat rebuild).
    Returns (tracks, times, offsets[HASH_SPACE+1] int64).
    """
    lib = native_lib()
    if (
        lib is not None
        and hasattr(lib, "ai_merge_csr")
        and _check_bounds(np.asarray(r_a), np.asarray(t_a))
        and _check_bounds(np.asarray(r_b), np.asarray(t_b))
    ):
        tv = np.ascontiguousarray(track_valid, np.uint8)
        ra = np.ascontiguousarray(r_a, np.int32)
        rb = np.ascontiguousarray(r_b, np.int32)
        if hasattr(lib, "ai_count_live"):
            # exact-size outputs: skip the main+delta upper-bound alloc
            # AND the prefix copy (each a full-index slab at scale)
            n_out = lib.ai_count_live(ra, len(ra), tv, len(tv)) + lib.ai_count_live(
                rb, len(rb), tv, len(tv)
            )
        else:
            n_out = len(ra) + len(rb)
        r_out = np.empty(n_out, np.int32)
        t_out = np.empty(n_out, np.int32)
        offsets = np.empty(spec.HASH_SPACE + 1, np.int64)
        n = lib.ai_merge_csr(
            np.ascontiguousarray(offsets_a, np.int64),
            ra,
            np.ascontiguousarray(t_a, np.int32),
            np.ascontiguousarray(h_b, np.int32),
            rb,
            np.ascontiguousarray(t_b, np.int32),
            len(rb),
            tv, len(tv), spec.HASH_SPACE,
            r_out, t_out, offsets,
        )
        if n == n_out:
            return r_out, t_out, offsets
        return r_out[:n].copy(), t_out[:n].copy(), offsets
    # NumPy fallback (test scale only): rebuild main hashes from offsets
    counts = np.diff(np.asarray(offsets_a, np.int64))
    h_a = np.repeat(np.arange(spec.HASH_SPACE, dtype=np.int32), counts)
    return merge_postings(h_a, r_a, t_a, h_b, r_b, t_b, track_valid)


def malloc_trim() -> None:
    """Return freed heap pages to the OS (glibc ``malloc_trim(0)``).

    The pending list frees ~100k small (sub-mmap-threshold) NumPy chunks
    during consolidation; glibc keeps those pages in its arenas, so peak-RSS
    accounting would charge the compaction for memory it already released.
    ``malloc_trim`` madvises interior free blocks page-by-page, making the
    release visible.  No-op on non-glibc platforms.
    """
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.malloc_trim(ctypes.c_size_t(0))
    except (OSError, AttributeError):
        pass


def count_live(tracks: np.ndarray, track_valid: np.ndarray) -> int:
    """Number of postings whose track survives the tombstone filter."""
    lib = native_lib()
    r = np.ascontiguousarray(tracks, np.int32)
    if lib is not None and hasattr(lib, "ai_count_live"):
        tv = np.ascontiguousarray(track_valid, np.uint8)
        return int(lib.ai_count_live(r, len(r), tv, len(tv)))
    ok = (r >= 0) & (r < len(track_valid))
    return int(np.count_nonzero(track_valid[np.clip(r, 0, len(track_valid) - 1)] & ok))


def has_merge_csr_range() -> bool:
    lib = native_lib()
    return lib is not None and hasattr(lib, "ai_merge_csr_range")


def merge_csr_range(
    offsets_a: np.ndarray,
    r_a: np.ndarray,
    t_a: np.ndarray,
    h_b: np.ndarray,
    r_b: np.ndarray,
    t_b: np.ndarray,
    track_valid: np.ndarray,
    h_lo: int,
    h_hi: int,
    r_out: np.ndarray,
    t_out: np.ndarray,
    offsets_out: np.ndarray,
) -> int:
    """Merge hash buckets [h_lo, h_hi) of the main CSR with a sorted delta
    slice (absolute hashes, all within the range), writing postings into
    ``r_out``/``t_out`` from index 0 and RELATIVE cumulative counts into
    ``offsets_out`` (length h_hi - h_lo).  Returns the postings written.

    The caller passes views into the preallocated final arrays — this is
    the bounded-memory compaction primitive (see FingerprintIndex.merge_delta).
    """
    lib = native_lib()
    assert lib is not None and hasattr(lib, "ai_merge_csr_range")
    return int(
        lib.ai_merge_csr_range(
            np.ascontiguousarray(offsets_a, np.int64),
            np.ascontiguousarray(r_a, np.int32),
            np.ascontiguousarray(t_a, np.int32),
            np.ascontiguousarray(h_b, np.int32),
            np.ascontiguousarray(r_b, np.int32),
            np.ascontiguousarray(t_b, np.int32),
            len(h_b),
            np.ascontiguousarray(track_valid, np.uint8),
            len(track_valid),
            h_lo,
            h_hi,
            r_out,
            t_out,
            offsets_out,
        )
    )


def hamming_batch(query: np.ndarray, candidates: list[np.ndarray]) -> np.ndarray:
    """Similarity of a uint32 fingerprint vs each candidate (see
    ops/content_fp.fingerprint_similarity for the frozen definition)."""
    lib = native_lib()
    if lib is not None and candidates:
        q = np.ascontiguousarray(query, np.uint32)
        lens = np.asarray([len(c) for c in candidates], np.int64)
        flat = (
            np.concatenate([np.asarray(c, np.uint32) for c in candidates])
            if lens.sum()
            else np.zeros(1, np.uint32)
        )
        out = np.empty(len(candidates), np.float64)
        lib.ai_hamming_batch(q, len(q), np.ascontiguousarray(flat), lens, len(candidates), out)
        return out
    from audio_ident_tpu.ops.content_fp import fingerprint_similarity

    return np.asarray([fingerprint_similarity(query, c) for c in candidates])
