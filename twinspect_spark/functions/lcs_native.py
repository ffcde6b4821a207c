"""Native (ctypes) longest-common-substring kernel with pure-Python
fallback.

The LCS borderline-rescue path (operators/verify.py, SF6) computes an
EXACT longest common substring per borderline candidate pair via a
suffix automaton. Profiled on the work-bound scaling corpus (round 4):
the rescue band is ~162k pairs of ~3.6 KB docs and the dict-based
Python automaton costs ~580 ns/char — 85 of the verify stage's 98 s at
local[8]. The reference leans on a compiled kernel for exactly this
(rapidfuzz's C++ LCSseq, newsedits.py:117-122); the engine's analog is
this ~60-line C suffix automaton (array transitions over a dense
alphabet), compiled ON DEMAND with the system C compiler into a
per-user cache dir and loaded via ctypes. Where no C compiler exists
the pure-Python automaton in operators/verify.py serves identical
results — the native path is a drop-in accelerator, never a semantic
fork (property-tested equal in tests/test_hashing.py).

Executor shipping: local-mode Python workers share the filesystem, so
the one compiled .so serves every worker (compile is atomic-rename
race-safe). On a real cluster, ship the .so via ``--files`` or let each
executor node compile once on first use — the source is embedded here,
so the package zip is all that needs to travel.

Alphabet handling: the automaton is built over the SHORT string's
alphabet only (dense-mapped by the caller, numpy-vectorized); walk
characters absent from it reset the match — identical semantics to a
missing dict transition. Memory is states × |Σ| × 4 B; inputs where
that exceeds ``_MEM_LIMIT`` fall back to the Python automaton (rare
giant-doc guard, not a correctness branch).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Longest common substring of a (dense int32 alphabet, size sigma)
   and b (entries outside [0, sigma) reset the walk) via a suffix
   automaton of `a` with flat transition tables. Returns -1 on OOM. */
int64_t lcs_len_dense(const int32_t* a, int64_t na,
                      const int32_t* b, int64_t nb, int32_t sigma) {
    if (na <= 0 || nb <= 0) return 0;
    int64_t maxst = 2 * na + 5;
    int32_t* nxt = (int32_t*)malloc((size_t)maxst * sigma * sizeof(int32_t));
    int32_t* link = (int32_t*)malloc((size_t)maxst * sizeof(int32_t));
    int32_t* len = (int32_t*)malloc((size_t)maxst * sizeof(int32_t));
    if (!nxt || !link || !len) { free(nxt); free(link); free(len); return -1; }
    memset(nxt, -1, (size_t)sigma * sizeof(int32_t));
    link[0] = -1; len[0] = 0;
    int32_t last = 0, size = 1;
    for (int64_t i = 0; i < na; i++) {
        int32_t ch = a[i];
        int32_t cur = size++;
        memset(nxt + (size_t)cur * sigma, -1, (size_t)sigma * sizeof(int32_t));
        len[cur] = len[last] + 1; link[cur] = 0;
        int32_t p = last;
        while (p != -1 && nxt[(size_t)p * sigma + ch] == -1) {
            nxt[(size_t)p * sigma + ch] = cur;
            p = link[p];
        }
        if (p != -1) {
            int32_t q = nxt[(size_t)p * sigma + ch];
            if (len[p] + 1 == len[q]) {
                link[cur] = q;
            } else {
                int32_t clone = size++;
                memcpy(nxt + (size_t)clone * sigma,
                       nxt + (size_t)q * sigma,
                       (size_t)sigma * sizeof(int32_t));
                len[clone] = len[p] + 1;
                link[clone] = link[q];
                while (p != -1 && nxt[(size_t)p * sigma + ch] == q) {
                    nxt[(size_t)p * sigma + ch] = clone;
                    p = link[p];
                }
                link[q] = clone; link[cur] = clone;
            }
        }
        last = cur;
    }
    int64_t best = 0, curlen = 0;
    int32_t v = 0;
    for (int64_t j = 0; j < nb; j++) {
        int32_t ch = b[j];
        if (ch < 0 || ch >= sigma) { v = 0; curlen = 0; continue; }
        while (v != 0 && nxt[(size_t)v * sigma + ch] == -1) {
            v = link[v];
            curlen = len[v];
        }
        int32_t t = nxt[(size_t)v * sigma + ch];
        if (t != -1) {
            v = t; curlen++;
            if (curlen > best) best = curlen;
        } else {
            v = 0; curlen = 0;
        }
    }
    free(nxt); free(link); free(len);
    return best;
}
"""

_MEM_LIMIT = 256 << 20  # transition-table byte cap before Python fallback
_lib = None
_load_failed = False


def _cache_dir() -> str:
    """Per-user cache dir, created 0700. A shared world-writable tempdir
    would let another local user pre-plant a .so at the precomputable
    name and gain code execution in every Spark worker that loads it —
    so the cache lives under a uid-scoped directory instead, and
    ``_trusted()`` re-verifies ownership before every CDLL."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    for cand in (
        os.path.join(base, "twinspect_lcs"),
        os.path.join(tempfile.gettempdir(),
                     f"twinspect-{os.geteuid()}", "twinspect_lcs"),
    ):
        try:
            os.makedirs(cand, mode=0o700, exist_ok=True)
            if os.lstat(cand).st_uid == os.geteuid():
                return cand
        except OSError:
            continue
    raise OSError("no writable per-user cache dir for the LCS kernel")


def _so_path() -> str:
    h = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    return os.path.join(_cache_dir(), f"twinspect_lcs_{h}.so")


def _trusted(path: str) -> bool:
    """Load only regular, non-symlink files owned by the current euid."""
    try:
        st = os.lstat(path)
    except OSError:
        return False
    import stat as _stat

    return _stat.S_ISREG(st.st_mode) and st.st_uid == os.geteuid()


def _build() -> str | None:
    """Compile the kernel once per machine; atomic-rename race-safe."""
    try:
        so = _so_path()
        # executor nodes may receive a prebuilt kernel via spark-submit
        # --files; Spark lands those in the SparkFiles root (task working
        # dir on a cluster). Prefer a shipped kernel over a recompile
        # when present and owned by us.
        candidates = []
        try:
            from pyspark import SparkFiles

            candidates.append(
                os.path.join(
                    SparkFiles.getRootDirectory(), os.path.basename(so)
                )
            )
        except Exception:
            pass
        candidates.append(os.path.join(os.getcwd(), os.path.basename(so)))
        for shipped in candidates:
            if shipped != so and _trusted(shipped):
                return shipped
        if _trusted(so):
            return so
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "lcs.c")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            tmp_so = os.path.join(td, "lcs.so")
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so)  # atomic; concurrent builders agree
        return so if _trusted(so) else None
    except Exception:
        return None


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("TWINSPECT_LCS_NATIVE") == "0":
        _load_failed = True
        return None
    so = _build()
    if so is None:
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.lcs_len_dense.restype = ctypes.c_int64
        lib.lcs_len_dense.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def lcs_len_native(a: str, b: str) -> int | None:
    """Exact longest-common-substring length via the C kernel, or None
    when the native path is unavailable / the input exceeds the memory
    guard (caller falls back to the Python automaton)."""
    lib = _get_lib()
    if lib is None:
        return None
    if not a or not b:
        return 0
    try:
        # lone surrogates (possible in arbitrary str payloads) make
        # utf-32 encoding raise; fall back to the Python automaton,
        # which handles any str
        ca = np.frombuffer(a.encode("utf-32-le"), dtype="<u4")
        cb = np.frombuffer(b.encode("utf-32-le"), dtype="<u4")
    except UnicodeEncodeError:
        return None
    # automaton over the SHORT side: memory and construction scale
    # with it, and LCS is symmetric
    if len(cb) < len(ca):
        ca, cb = cb, ca
    # dense alphabet of the automaton string; walk chars outside it
    # map to -1 (reset) — same as a missing transition
    alpha, a_dense = np.unique(ca, return_inverse=True)
    sigma = int(alpha.size)
    if (2 * len(ca) + 5) * sigma * 4 > _MEM_LIMIT:
        return None
    pos = np.searchsorted(alpha, cb)
    pos[pos >= sigma] = sigma - 1
    b_dense = np.where(alpha[pos] == cb, pos, -1).astype(
        np.int32, copy=False
    )
    a_dense = np.ascontiguousarray(a_dense, dtype=np.int32)
    b_dense = np.ascontiguousarray(b_dense)
    r = lib.lcs_len_dense(
        a_dense.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(a_dense),
        b_dense.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(b_dense),
        sigma,
    )
    return None if r < 0 else int(r)
