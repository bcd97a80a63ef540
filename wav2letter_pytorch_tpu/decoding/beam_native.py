"""ctypes wrapper for the native C++ prefix beam search.

Same semantics as ``decoder.prefix_beam_search`` (which is the golden
reference; randomized cross-checks live in tests/test_beam_native.py), run
entirely in C++ with the native ARPA LM called in-process — typically
10-100x faster than the Python DP loop for realistic beam widths.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .levenshtein import _load_native


def _configure(lib):
    if getattr(lib, '_beam_configured', False):
        return lib
    lib.w2l_prefix_beam_search.restype = ctypes.c_int64
    lib.w2l_prefix_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib._beam_configured = True
    return lib


def native_available() -> bool:
    return _load_native() is not None


def prefix_beam_search_native(ctc, labels, blank_index: int = 0, lm=None,
                              k: int = 5, alpha: float = 0.3, beta: float = 5,
                              prune: float = 0.001, end_char: str = '>',
                              return_weights: bool = False, hotwords=None,
                              hotword_weight: float = 2.0):
    """Native prefix beam search. ``lm`` must be None or a native ArpaLM.
    ``hotwords``: words/phrases or a decoder.HotwordTrie — contextual
    biasing with exact decoder.py::prefix_beam_search parity."""
    lib = _configure(_load_native())
    ctc = np.ascontiguousarray(ctc, dtype=np.float32)
    assert ctc.ndim == 2 and ctc.shape[1] == len(labels), (
        f'ctc size:{ctc.shape[1]}, labels: {len(labels)}')
    assert ctc.shape[0] > 1, f'ctc length: {ctc.shape[0]} was too short'
    assert (ctc >= 0).all(), 'ctc output contains negative numbers'

    lm_handle = None
    if lm is not None:
        from .arpa_lm import ArpaLM
        if not isinstance(lm, ArpaLM):
            raise TypeError('native beam search needs a native ArpaLM '
                            '(or None); got ' + type(lm).__name__)
        lm_handle = lm._handle

    hw_flat = hw_offs = None
    n_hw = 0
    if hotwords is not None:
        from .decoder import HotwordTrie
        trie = hotwords if isinstance(hotwords, HotwordTrie) \
            else HotwordTrie(hotwords, hotword_weight)
        hotword_weight = trie.weight
        words = sorted(trie.words)
        n_hw = len(words)
        hw_flat = np.array([ord(c) for w in words for c in w] or [0],
                           dtype=np.uint32)
        hw_offs = np.zeros(n_hw + 1, dtype=np.int64)
        np.cumsum([len(w) for w in words], out=hw_offs[1:])

    label_codes = np.array([ord(c) for c in labels], dtype=np.uint32)
    T, L = ctc.shape
    out_cap = T + 8
    out_buf = np.zeros(out_cap, dtype=np.uint32)
    score = ctypes.c_double(0.0)
    n = lib.w2l_prefix_beam_search(
        ctc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, L,
        label_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        blank_index, lm_handle, k, alpha, beta, prune, ord(end_char),
        None if hw_flat is None
        else hw_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        None if hw_offs is None
        else hw_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_hw, hotword_weight,
        out_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), out_cap,
        ctypes.byref(score))
    decoded = ''.join(chr(c) for c in out_buf[:n])
    if return_weights:
        return decoded, score.value
    return decoded
