"""ctypes binding for the native FLAC decoder (native/flac.cpp).

Fast path for `.flac` ingestion (the reference reads FLAC via soundfile,
/root/reference/data/data_loader.py:20-31); falls back to the pure-Python
decoder in :mod:`.flac` when the shared library is unavailable.  Both
implementations decode the same RFC 9639 subset and are cross-checked
bit-exactly in ``tests/test_flac.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ERRORS = {
    -1: 'truncated stream',
    -2: 'not a FLAC stream (missing fLaC marker)',
    -3: 'no STREAMINFO block',
    -4: 'bad frame sync',
    -5: 'reserved value in stream',
    -6: 'frame header CRC-8 mismatch',
    -7: 'frame CRC-16 mismatch',
    -8: 'output capacity exceeded',
    -9: 'malformed stream',
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(_repo_root(), 'native')
    so_path = os.path.join(native_dir, 'libw2l_native.so')
    try:
        if not os.path.exists(so_path):
            subprocess.run(['make', '-C', native_dir], check=True,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        lib = ctypes.CDLL(so_path)
        lib.flac_parse_info.restype = ctypes.c_int
        lib.flac_parse_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.flac_decode_all.restype = ctypes.c_int64
        lib.flac_decode_all.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int]
        lib.flac_encode_fixed.restype = ctypes.c_int64
        lib.flac_encode_fixed.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_native() is not None


def parse_info_native(data: bytes):
    """STREAMINFO via C++ -> dict, or None if the library is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    out = (ctypes.c_int64 * 7)()
    rc = lib.flac_parse_info(data, len(data), out)
    if rc:
        raise ValueError(f'FLAC: {_ERRORS.get(rc, rc)}')
    return {'sample_rate': out[0], 'channels': out[1],
            'bits_per_sample': out[2], 'total_samples': out[3],
            'min_blocksize': out[4], 'max_blocksize': out[5]}


def decode_native(data: bytes, verify_crc: bool = True):
    """Decode via C++ -> (int32 [n, channels], sample_rate, bits_per_sample).

    Returns None when the native library is unavailable or the stream's
    total-sample count is unknown (the Python fallback handles those).
    """
    lib = _load_native()
    if lib is None:
        return None
    info = parse_info_native(data)
    if info['total_samples'] == 0:
        return None  # unknown length: let the Python decoder grow its output
    n, ch = info['total_samples'], info['channels']
    # Frames may legally carry a few samples past total_samples; give the
    # decoder one extra max-blocksize of headroom, then trim.
    cap = n + max(info['max_blocksize'], 65536)
    out = np.empty(cap * ch, dtype=np.int32)
    rc = lib.flac_decode_all(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap, 1 if verify_crc else 0)
    if rc < 0:
        raise ValueError(f'FLAC: {_ERRORS.get(rc, rc)}')
    n_dec = min(int(rc), n)
    return (out[:n_dec * ch].reshape(n_dec, ch), info['sample_rate'],
            info['bits_per_sample'])


def encode_native(samples: np.ndarray, sample_rate: int,
                  bits_per_sample: int = 16, blocksize: int = 4096):
    """Encode via the C++ fixed-predictor encoder -> bytes, or None.

    The fast path for offline corpus construction; the Python encoder in
    :mod:`.flac` stays the full-featured one (LPC, stereo decorrelation,
    forced subframe paths for decoder testing).
    """
    import hashlib
    lib = _load_native()
    if lib is None:
        return None
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    x32 = np.ascontiguousarray(x, dtype=np.int32)
    width = max(1, (bits_per_sample + 7) // 8)
    inter = x32.reshape(-1).astype(np.int64)
    raw = np.zeros((len(inter), width), dtype=np.uint8)
    for i in range(width):
        raw[:, i] = (inter >> (8 * i)) & 0xFF
    md5 = hashlib.md5(raw.tobytes()).digest()
    cap = 64 + n * ch * 6 + 1024  # worst case ~ verbatim + headers
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.flac_encode_fixed(
        x32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, ch,
        sample_rate, bits_per_sample, blocksize, md5,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if rc < 0:
        raise ValueError(f'FLAC encode: {_ERRORS.get(rc, rc)}')
    return out[:rc].tobytes()
