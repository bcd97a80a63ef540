"""Edit distance backed by the native C++ extension (ctypes), with a
pure-Python fallback.

The reference delegates WER/CER edit distance to the `python-Levenshtein`
C extension (/root/reference/decoder.py:4,49,60); here the native path is our
own C++ kernel (native/levenshtein.cpp) compiled to ``libw2l_native.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(_repo_root(), 'native')
    so_path = os.path.join(native_dir, 'libw2l_native.so')
    if not os.path.exists(so_path):
        # Best-effort on-demand build; stays silent on failure (fallback kicks in).
        try:
            subprocess.run(['make', '-C', native_dir], check=True,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.w2l_levenshtein_u32.restype = ctypes.c_int64
        lib.w2l_levenshtein_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ]
        lib.w2l_levenshtein_u32_batch.restype = None
        lib.w2l_levenshtein_u32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _py_distance(a, b) -> int:
    """Wagner–Fischer with two rolling rows (fallback when the .so is absent)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        curr = [i] + [0] * len(b)
        for j, cb in enumerate(b, start=1):
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1,
                          prev[j - 1] + (ca != cb))
        prev = curr
    return prev[-1]


def _to_u32(seq) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode('utf-32-le'), dtype=np.uint32)
    return np.asarray(seq, dtype=np.uint32)


def distance(a, b) -> int:
    """Levenshtein distance between two strings or integer sequences."""
    lib = _load_native()
    if lib is None:
        return _py_distance(list(a), list(b))
    ua, ub = _to_u32(a), _to_u32(b)
    pa = ua.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    pb = ub.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.w2l_levenshtein_u32(pa, len(ua), pb, len(ub)))


def batch_distance(pairs) -> list[int]:
    """Distances for many (a, b) pairs with a single native call."""
    lib = _load_native()
    if lib is None:
        return [_py_distance(list(a), list(b)) for a, b in pairs]
    a_arrs = [_to_u32(a) for a, _ in pairs]
    b_arrs = [_to_u32(b) for _, b in pairs]
    a_off = np.zeros(len(pairs) + 1, dtype=np.int64)
    b_off = np.zeros(len(pairs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in a_arrs], out=a_off[1:])
    np.cumsum([len(x) for x in b_arrs], out=b_off[1:])
    a_flat = np.concatenate(a_arrs) if a_arrs else np.zeros(0, np.uint32)
    b_flat = np.concatenate(b_arrs) if b_arrs else np.zeros(0, np.uint32)
    # Keep at least one element so .ctypes.data is a valid pointer.
    if a_flat.size == 0:
        a_flat = np.zeros(1, np.uint32)
    if b_flat.size == 0:
        b_flat = np.zeros(1, np.uint32)
    out = np.zeros(len(pairs), dtype=np.int64)
    lib.w2l_levenshtein_u32_batch(
        a_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        a_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        b_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(pairs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out.tolist()


def align(ref, hyp):
    """Minimum-edit alignment of two token sequences.

    Returns ``[(op, ref_tok, hyp_tok), ...]`` with op in
    {'ok', 'sub', 'del', 'ins'} (absent side is None); the number of
    non-'ok' entries equals :func:`distance`. Host-side analysis tool
    (scripts/error_analysis.py) — the hot WER path stays on the C++
    distance kernels above.
    """
    ref, hyp = list(ref), list(hyp)
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), dtype=np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]))
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] \
                and ref[i - 1] == hyp[j - 1]:
            ops.append(('ok', ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            ops.append(('sub', ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            ops.append(('del', ref[i - 1], None))
            i -= 1
        else:
            ops.append(('ins', None, hyp[j - 1]))
            j -= 1
    return ops[::-1]
