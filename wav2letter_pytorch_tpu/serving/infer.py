"""Serving-optimized offline forward: BN-folded, optionally int8 weights.

The training model (models/wav2letter.py) tracks BatchNorm statistics and
keeps BN as a separate op so train/eval share one module. For serving,
eval-mode BN is a constant affine map, so it folds into each conv's
kernel/bias (streaming.fold_batchnorm) — one fused conv+bias+clamp per
layer, fewer HBM round-trips, and the natural place to hang weight-only
int8 quantization (quantize.py) for the memory-bound batch-1 regime.

``offline_forward`` reproduces ``Wav2Letter.apply(train=False)`` exactly
(same reflect SAME padding from the static trace-time length, models/
base.py:27-38) for any input length.
"""

from __future__ import annotations

from ..models.base import same_pad_amount


def _layer_geometry(layers):
    return [(int(l['kernel_size']), int(l.get('stride', 1)),
             int(l.get('dilation', 1))) for l in layers]


def offline_forward(layers, folded, feats, input_lengths=None,
                    padding_mode: str = 'reflect',
                    return_activations: bool = False):
    """Run the folded conv stack over ``feats [B, T, M]``.

    ``layers``: the model layer spec truncated to mid_layers.
    ``folded``: output of ``fold_batchnorm`` (f32) or
    ``quantize.quantize_folded`` (int8 + per-channel scales).
    ``padding_mode`` must match the trained model's (reflect | zeros).
    ``return_activations`` additionally returns each conv's (and the
    head's) input tensor — used by int8 calibration (quantize.py).
    Returns (log_probs [B, T', L], out_lengths | None[, activations]).
    """
    import jax
    import jax.numpy as jnp

    x = feats
    scale_total = 1
    acts = []
    for (k, s, d), wb in zip(_layer_geometry(layers), folded[:-1]):
        w, b = _materialize(wb)
        acts.append(x)
        left, right = same_pad_amount(x.shape[1], k, s, d)
        if left or right:
            x = jnp.pad(x, ((0, 0), (left, right), (0, 0)),
                        mode='reflect' if padding_mode == 'reflect'
                        else 'constant')
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(s,), padding='VALID', rhs_dilation=(d,),
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        x = jnp.clip(out + b, 0.0, 20.0)
        scale_total *= s
    acts.append(x)
    wh, bh = _materialize(folded[-1])
    logits = jnp.einsum('btc,cl->btl', x, wh[0]) + bh
    logp = jax.nn.log_softmax(logits, axis=-1)
    out_lens = None if input_lengths is None \
        else jnp.asarray(input_lengths, jnp.int32) // scale_total
    if return_activations:
        return logp, out_lens, acts
    return logp, out_lens


def offline_forward_q8(layers, folded_q, feats, input_lengths=None,
                       padding_mode: str = 'reflect', act_scales=None,
                       f32_layers=()):
    """Full int8 inference: int8 weights AND int8 activations.

    Activations are quantized with a symmetric scale before each conv; the
    conv accumulates int8 x int8 in int32 on the MXU — measured ~1.7x the
    bf16 conv throughput on v5e-class chips (281 TOPS vs 162 TFLOPS at the
    flagship's widest layer). The dequantize is one fused scale-multiply
    on the int32 output.

    ``act_scales``: optional static per-layer scales from
    ``quantize.calibrate_activation_scales`` (len == len(folded_q)).
    Without them, scales are dynamic per batch row — max|x|/127 over each
    sample's VALID frames (padding excluded when ``input_lengths`` is
    given, so a bucket's padding cannot stretch the quantization grid).
    Use ``quantize.quantize_folded`` weights; accuracy is approximate —
    validate WER on a dev set before deploying.

    ``f32_layers``: layer indices (and/or ``'head'``) to run with
    dequantized-f32 math instead of int8 activations — the standard
    mixed-precision mitigation when full-int8 costs too much accuracy
    (first conv and head are typically the sensitive ones). Compute cost
    is per-layer proportional, so exempting 2 of 21 layers keeps ~90% of
    the int8 speedup.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(feats, jnp.float32)
    cur_len = None if input_lengths is None \
        else jnp.asarray(input_lengths, jnp.int32)
    scale_total = 1
    geometry = _layer_geometry(layers)
    for i, ((k, s, d), (q, w_scale, b)) in enumerate(
            zip(geometry, folded_q[:-1])):
        left, right = same_pad_amount(x.shape[1], k, s, d)
        pad_mode = 'reflect' if padding_mode == 'reflect' else 'constant'
        if i in f32_layers:
            w = jnp.asarray(q, jnp.float32) \
                * jnp.asarray(w_scale)[None, None, :]
            xf = x
            if left or right:
                xf = jnp.pad(xf, ((0, 0), (left, right), (0, 0)),
                             mode=pad_mode)
            y = jax.lax.conv_general_dilated(
                xf, w, window_strides=(s,), padding='VALID',
                rhs_dilation=(d,), dimension_numbers=('NWC', 'WIO', 'NWC'))
        else:
            a_scale = _act_scale(x, act_scales, i, cur_len)
            xq = quantize_act(x, a_scale)
            if left or right:
                xq = jnp.pad(xq, ((0, 0), (left, right), (0, 0)),
                             mode=pad_mode)
            y = jax.lax.conv_general_dilated(
                xq, jnp.asarray(q), window_strides=(s,), padding='VALID',
                rhs_dilation=(d,), dimension_numbers=('NWC', 'WIO', 'NWC'),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (a_scale * jnp.asarray(w_scale)
                                         [None, None, :])
        x = jnp.clip(y + jnp.asarray(b), 0.0, 20.0)
        scale_total *= s
        if cur_len is not None:
            cur_len = cur_len // s
    qh, sh, bh = folded_q[-1]
    if 'head' in f32_layers:
        wh = jnp.asarray(qh, jnp.float32)[0] * jnp.asarray(sh)[None, :]
        logits = jnp.einsum('btc,cl->btl', x, wh) + jnp.asarray(bh)
    else:
        a_scale = _act_scale(x, act_scales, len(folded_q) - 1, cur_len)
        xq = quantize_act(x, a_scale)
        logits = jax.lax.dot_general(
            xq, jnp.asarray(qh)[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) \
            .astype(jnp.float32) * (a_scale * jnp.asarray(sh)[None, None, :]) \
            + jnp.asarray(bh)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if input_lengths is None:
        return logp, None
    return logp, jnp.asarray(input_lengths, jnp.int32) // scale_total


def dynamic_act_scale(x, valid_lengths=None):
    """Per-row symmetric int8 activation scale max|x|/127, reduced over
    valid frames only when ``valid_lengths`` [B] is given."""
    import jax.numpy as jnp
    a = jnp.abs(x)
    if valid_lengths is not None:
        mask = (jnp.arange(x.shape[1])[None, :]
                < valid_lengths[:, None])[:, :, None]
        a = jnp.where(mask, a, 0.0)
    return jnp.maximum(jnp.max(a, axis=(1, 2), keepdims=True), 1e-6) / 127.0


def quantize_act(x, a_scale):
    import jax.numpy as jnp
    return jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)


def _act_scale(x, act_scales, i, valid_lengths):
    import jax.numpy as jnp
    if act_scales is not None:
        return jnp.asarray(act_scales[i], jnp.float32).reshape(1, 1, 1)
    return dynamic_act_scale(x, valid_lengths)


def _materialize(wb):
    """(w, b) f32 passthrough, or (w_q int8, scale, b) -> dequantized.
    ``b`` may be None (bias-free convs, e.g. Jasper's MaskedConv)."""
    import jax.numpy as jnp
    if len(wb) == 2:
        w, b = wb
        return jnp.asarray(w), (None if b is None else jnp.asarray(b))
    q, scale, b = wb
    w = jnp.asarray(q, jnp.float32) * jnp.asarray(scale)[None, None, :]
    return w, (None if b is None else jnp.asarray(b))
