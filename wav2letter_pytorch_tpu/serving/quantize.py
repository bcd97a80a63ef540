"""Weight-only int8 quantization for serving.

Batch-1 (and small-batch) inference on TPU is HBM-bandwidth-bound: the
153 M-parameter flagship reads ~600 MB of f32 weights per step while doing
comparatively few FLOPs. Symmetric per-output-channel int8 weights cut that
4x; the dequantize (int8 -> f32 multiply by a [Cout] scale) fuses into the
conv's weight read under XLA. Activations stay f32/bf16 — weight-only
quantization preserves accuracy without calibration data.

Quantization is applied AFTER BatchNorm folding (streaming.fold_batchnorm),
so the BN scale — often the largest per-channel dynamic-range spread — is
absorbed before rounding.
"""

from __future__ import annotations

import numpy as np


def quantize_folded(folded):
    """[(w [k,Cin,Cout], b)] -> [(w_q int8, scale [Cout] f32, b)].

    Symmetric per-output-channel: scale = max|w[..., c]| / 127.
    """
    out = []
    for w, b in folded:
        w = np.asarray(w, np.float32)
        scale = np.max(np.abs(w), axis=(0, 1)) / 127.0
        scale = np.maximum(scale, 1e-12).astype(np.float32)
        q = np.clip(np.round(w / scale[None, None, :]), -127, 127) \
            .astype(np.int8)
        out.append((q, scale,
                    None if b is None else np.asarray(b, np.float32)))
    return out


def calibrate_activation_scales(layers, folded, frontend, audio, lengths,
                                percentile: float = 99.9,
                                padding_mode: str = 'reflect'):
    """Static per-layer activation scales for ``offline_forward_q8``.

    Runs the f32 folded forward over calibration audio and takes the given
    percentile of |input| at every conv (and the head), divided by 127.
    Static scales remove the per-batch max reduction from the serving
    graph and are robust to activation outliers that would stretch a
    dynamic scale's grid. ``folded`` must be the f32 fold.
    Returns a python list of floats, len == len(folded).
    """
    from .infer import offline_forward
    feats, flens = frontend(np.asarray(audio, np.float32),
                            np.asarray(lengths))
    _, _, acts = offline_forward(layers, folded, feats, flens,
                                 padding_mode=padding_mode,
                                 return_activations=True)
    # Percentiles run over each sample's VALID frames only — calibration
    # batches mix utterance lengths, and padding-region activations would
    # otherwise dominate the high percentiles.
    strides = [int(l.get('stride', 1)) for l in layers]
    cur = np.asarray(flens, np.int64)
    scales = []
    for i, a in enumerate(acts):
        a = np.asarray(a)
        vals = np.concatenate([np.abs(a[b, :cur[b]]).ravel()
                               for b in range(a.shape[0])])
        p = float(np.percentile(vals, percentile))
        scales.append(max(p, 1e-6) / 127.0)
        if i < len(strides):
            cur = cur // strides[i]
    return scales


def quantized_bytes(folded_q) -> int:
    """Total parameter bytes of a quantized stack (int8 + scales + bias)."""
    total = 0
    for q, scale, b in folded_q:
        total += q.size + scale.nbytes + (0 if b is None else b.nbytes)
    return total
