"""Fused STFT -> power -> mel -> log1p as a single Pallas TPU kernel.

The XLA path (data/features.py, stft_method='conv') materializes the
complex spectrogram re/im [B, T, 2*bins] f32 to HBM (~50 MB per batch at
the bench shape) between the DFT conv and the power/mel stages. This
kernel keeps everything in VMEM: per 128-frame block it runs the windowed
DFT as MXU matmuls, squares into power, applies the mel filterbank, and
writes only the log-mel output [B, T, n_mels].

Framing without gathers or overlapping blocks — the q-decomposition:
with hop H and FFT size K, sample index k = q*H + r (q < ceil(K/H),
r < H), so for the hop-aligned signal matrix S[i, r] = x[i*H + r],

    frame_i @ W  ==  sum_q  S[i+q, :] @ W[q*H : q*H + H]

i.e. a few matmuls against row-shifted views of S. The shifted views are
built outside the kernel (cheap slices), so Pallas block specs tile the
frame axis with NO overlap and the pipeline double-buffers HBM->VMEM
automatically.

Parity: identical math to features.SpectrogramFrontend (windowed real DFT
bases, Slaney mel, log1p guard); tests/test_stft_pallas.py checks against
the XLA paths. Used via ``SpectrogramFrontend(stft_method='pallas')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..data.features import LOG_ZERO_GUARD

FRAME_BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_chunks, *refs):
    # refs: a_0..a_{n_chunks-1}, w_re, w_im, fb, out
    a_refs = refs[:n_chunks]
    w_re, w_im, fb, out = refs[n_chunks:]
    re = None
    im = None
    offset = 0
    for q in range(n_chunks):
        a = a_refs[q][0]                      # [FB, chunk_width]
        width = a.shape[-1]
        wr = w_re[offset:offset + width, :]
        wi = w_im[offset:offset + width, :]
        r = jnp.dot(a, wr, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        i = jnp.dot(a, wi, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        re = r if re is None else re + r
        im = i if im is None else im + i
        offset += width
    power = re * re + im * im
    mel = jnp.dot(power, fb[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out[0] = jnp.log1p(mel + LOG_ZERO_GUARD)


def stft_mel_log_pallas(padded, n_frames: int, hop: int, n_fft: int,
                        dft_re: np.ndarray, dft_im: np.ndarray,
                        fb_t: np.ndarray, interpret: bool = False):
    """padded: [B, P] center-padded audio. Returns feats [B, n_frames, M].

    dft_re/dft_im: [n_fft, n_bins] windowed DFT bases; fb_t: [n_bins, M].
    """
    B, P = padded.shape
    n_bins, n_mels = fb_t.shape
    bins_pad = _round_up(n_bins, 128)
    mels_pad = _round_up(n_mels, 128)
    nf_pad = _round_up(n_frames, FRAME_BLOCK)

    w_re = np.zeros((n_fft, bins_pad), np.float32)
    w_im = np.zeros((n_fft, bins_pad), np.float32)
    w_re[:, :n_bins] = dft_re
    w_im[:, :n_bins] = dft_im
    fb_pad = np.zeros((bins_pad, mels_pad), np.float32)
    fb_pad[:n_bins, :n_mels] = fb_t

    # Row-shifted hop-aligned views (see module docstring).
    n_full = n_fft // hop
    rem = n_fft - n_full * hop
    need = (nf_pad + n_full) * hop + max(rem, 1)
    x = jnp.pad(padded, ((0, 0), (0, max(0, need - P))))
    chunks = []
    for q in range(n_full):
        start = q * hop
        a = jax.lax.dynamic_slice_in_dim(x, start, nf_pad * hop, axis=1)
        chunks.append(a.reshape(B, nf_pad, hop))
    if rem:
        start = n_full * hop
        a = jax.lax.dynamic_slice_in_dim(x, start, nf_pad * hop, axis=1)
        chunks.append(a.reshape(B, nf_pad, hop)[:, :, :rem])
    n_chunks = len(chunks)

    grid = (B, nf_pad // FRAME_BLOCK)
    in_specs = (
        [pl.BlockSpec((1, FRAME_BLOCK, c.shape[-1]), lambda b, j: (b, j, 0))
         for c in chunks]
        + [pl.BlockSpec((n_fft, bins_pad), lambda b, j: (0, 0)),
           pl.BlockSpec((n_fft, bins_pad), lambda b, j: (0, 0)),
           pl.BlockSpec((bins_pad, mels_pad), lambda b, j: (0, 0))]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, mels_pad),
                               lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nf_pad, mels_pad), jnp.float32),
        interpret=interpret,
    )(*chunks, jnp.asarray(w_re), jnp.asarray(w_im), jnp.asarray(fb_pad))
    return out[:, :n_frames, :n_mels]
