"""ARPA n-gram language model with kenlm-compatible scoring.

The reference wraps kenlm behind a lazy import (/root/reference/
decoder.py:248-253); kenlm may be absent, so this module provides the same
``score(sentence) -> log10 prob`` surface backed by our own C++ scorer
(native/arpa_lm.cpp, ctypes-loaded) with Katz backoff and <s>/</s>/<unk>
handling matching kenlm's ``Model.score(s, bos=True, eos=True)``.
"""

from __future__ import annotations

import ctypes

from .levenshtein import _load_native


class ArpaLM:
    """kenlm.Model-compatible ARPA scorer (log10 probabilities)."""

    def __init__(self, path: str):
        lib = _load_native()
        if lib is None:
            raise RuntimeError(
                'native ARPA scorer unavailable (build native/ with make)')
        self._lib = lib
        self._configure(lib)
        self._handle = lib.w2l_arpa_load(path.encode())
        if not self._handle:
            raise ValueError(f'failed to load ARPA model from {path!r}')

    @staticmethod
    def _configure(lib):
        if getattr(lib, '_arpa_configured', False):
            return
        lib.w2l_arpa_load.restype = ctypes.c_void_p
        lib.w2l_arpa_load.argtypes = [ctypes.c_char_p]
        lib.w2l_arpa_score.restype = ctypes.c_double
        lib.w2l_arpa_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int, ctypes.c_int]
        lib.w2l_arpa_order.restype = ctypes.c_int
        lib.w2l_arpa_order.argtypes = [ctypes.c_void_p]
        lib.w2l_arpa_free.restype = None
        lib.w2l_arpa_free.argtypes = [ctypes.c_void_p]
        lib._arpa_configured = True

    @property
    def order(self) -> int:
        return self._lib.w2l_arpa_order(self._handle)

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        """log10 probability of the sentence (kenlm-compatible)."""
        return self._lib.w2l_arpa_score(self._handle, sentence.encode(),
                                        int(bos), int(eos))

    def __del__(self):
        handle = getattr(self, '_handle', None)
        if handle:
            self._lib.w2l_arpa_free(handle)
            self._handle = None


def load_lm(path: str):
    """kenlm if importable, else the native ARPA scorer. Same .score API."""
    try:
        import kenlm
        return kenlm.Model(path)
    except ImportError:
        return ArpaLM(path)
