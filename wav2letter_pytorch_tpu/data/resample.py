"""Rational-ratio polyphase sample-rate conversion (first-party numpy).

The reference refuses rate-mismatched audio outright — its dataset asserts
the first file's rate and never converts (/root/reference/data/
data_loader.py:135-138). A production serving stack has to ingest 8 kHz
telephony, 44.1/48 kHz consumer recordings, and 16 kHz ASR corpora against
models trained at one fixed rate, so this module adds the conversion the
reference lacks: a Kaiser-windowed-sinc polyphase resampler in plain numpy
(no scipy/librosa), running host-side next to audio decode.

Design (the standard ``upfirdn`` formulation):

* reduce ``target/orig`` to ``up/down`` with ``fractions.Fraction`` —
  exact for every pair of standard audio rates (44100/16000 = 160/441);
* design one linear-phase FIR low-pass at the up-sampled rate with cutoff
  ``min(1/up, 1/down)`` (normalized to Nyquist) and a Kaiser window —
  same parameterization scipy's ``resample_poly`` defaults to
  (half-length ``10*max(up, down)`` taps, beta 5.0, ~60 dB stop-band);
* evaluate only the needed output samples through the filter's ``up``
  polyphase components (one ``np.convolve`` per phase), never
  materializing the zero-stuffed signal;
* align the filter's group delay so ``y[0]`` corresponds to ``x[0]``
  (output ``n`` sits at input time ``n * down / up``).

Work is O(len(x) * taps_per_phase * up) = O(len(x) * 20 * max(up, down)),
a few ms per second of audio for the standard conversions.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Kaiser beta 5.0 ~= 60 dB stop-band attenuation; half-length 10 zero
# crossings per polyphase branch. Matches scipy.signal.resample_poly's
# default ('kaiser', 5.0) quality point.
_KAISER_BETA = 5.0
_HALF_ZEROS = 10


def design_lowpass(up: int, down: int) -> np.ndarray:
    """Linear-phase Kaiser-windowed-sinc low-pass for an up/down resampler.

    Operates at the up-sampled rate: cutoff ``1/max(up, down)`` of that
    Nyquist, unit DC gain, then scaled by ``up`` to preserve signal level
    through zero-stuffing.
    """
    max_rate = max(up, down)
    half = _HALF_ZEROS * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    fc = 1.0 / max_rate  # relative to Nyquist at the up-sampled rate
    h = fc * np.sinc(fc * n)
    h *= np.kaiser(2 * half + 1, _KAISER_BETA)
    h /= h.sum()  # unit DC gain
    return (h * up).astype(np.float64)


def resample_ratio(orig_rate: int, target_rate: int) -> tuple[int, int]:
    """(up, down) in lowest terms for orig -> target conversion."""
    frac = Fraction(int(target_rate), int(orig_rate))
    return frac.numerator, frac.denominator


def resample(x: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Resample mono float audio from ``orig_rate`` to ``target_rate``.

    Returns float32 of length ``ceil(len(x) * target / orig)``; the input
    is treated as zero outside its support (same edge convention as
    scipy's ``resample_poly(padtype='constant')``).
    """
    x = np.asarray(x, np.float64)
    if x.ndim != 1:
        raise ValueError(f'expected mono 1-D audio, got shape {x.shape}')
    if int(orig_rate) == int(target_rate) or x.size == 0:
        return x.astype(np.float32)
    up, down = resample_ratio(orig_rate, target_rate)
    h = design_lowpass(up, down)
    n_in = len(x)
    n_out = -(-n_in * up // down)  # ceil

    # Output n taps the up-sampled-domain convolution at j = offset + n*down,
    # where offset centers the filter (group delay (L-1)/2). Polyphase: with
    # r = j % up and q = j // up,  y[n] = sum_k h[r + k*up] * x[q - k]
    #                                   = convolve(x, h[r::up])[q].
    offset = (len(h) - 1) // 2
    j = offset + np.arange(n_out, dtype=np.int64) * down
    r = (j % up).astype(np.int64)
    q = (j // up).astype(np.int64)

    y = np.zeros(n_out, np.float64)
    for phase in range(min(up, n_out)):
        sel = r == phase
        if not sel.any():
            continue
        taps = h[phase::up]
        c = np.convolve(x, taps)  # c[i] = sum_k taps[k] * x[i-k]
        qi = q[sel]
        valid = qi < len(c)  # beyond the tail the (zero-padded) conv is 0
        out = np.zeros(qi.shape, np.float64)
        out[valid] = c[qi[valid]]
        y[sel] = out
    return y.astype(np.float32)
