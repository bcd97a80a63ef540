"""Quantization-aware finetuning (QAT) of the folded serving graph.

``offline_forward_q8`` (infer.py) buys ~1.7x throughput by running int8
weights AND int8 activations on the MXU, at a measured accuracy cost
(0.6 WER points on the full-depth corpus, benchmarks/full_depth_run.json).
This module recovers that gap: it finetunes the BN-folded weights through
a *fake-quantized* forward that mirrors the int8 inference graph
operation-for-operation in f32 math, using straight-through estimators
(STE) so gradients flow through the round/clip. The finetuned fold is
re-exported as a normal int8 artifact — deployment code is unchanged.

Design notes (why this shape, not in-training QAT):

* The serving graph is the *folded* stack — conv+bias+clamp with BN
  absorbed (streaming.fold_batchnorm). Finetuning the fold directly
  trains exactly what serving executes; simulating BN folding inside the
  training model (torch-style QAT) would add running-stat bookkeeping for
  no fidelity gain.
* Activation scales stay FIXED at their calibrated values during
  finetuning (the artifact's ``act_scales``): deployment uses those exact
  scales, so the weights adapt to the grid that will actually be used.
* Weight fake-quant re-derives the per-output-channel scale from the
  live weights each step (same max|w|/127 rule as quantize.quantize_folded),
  so the exported ``quantize_folded(new_fold)`` is bit-identical to what
  training simulated.

No reference-upstream equivalent exists (assafmu/wav2letter_pytorch has
no quantization); this extends the serving stack the same way the int8
path itself does.
"""

from __future__ import annotations

import numpy as np

from ..models.base import same_pad_amount
from .infer import _layer_geometry


def ste_round(x):
    """round(x) with identity gradient (straight-through estimator)."""
    import jax
    import jax.numpy as jnp
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant_weight(w):
    """Per-output-channel symmetric int8 fake-quant of ``w [k, Cin, Cout]``.

    Reproduces quantize.quantize_folded exactly: scale = max|w|/127
    (stop-gradient), values rounded/clipped via STE then rescaled.
    """
    import jax
    import jax.numpy as jnp
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1)) / 127.0
    scale = jax.lax.stop_gradient(jnp.maximum(scale, 1e-12))
    q = jnp.clip(ste_round(w / scale[None, None, :]), -127, 127)
    return q * scale[None, None, :]


def fake_quant_act(x, scale):
    """Symmetric int8 fake-quant of activations with a fixed scale."""
    import jax
    import jax.numpy as jnp
    scale = jax.lax.stop_gradient(jnp.asarray(scale, jnp.float32))
    return jnp.clip(ste_round(x / scale), -127, 127) * scale


def qat_forward(layers, params, feats, input_lengths=None,
                act_scales=None, padding_mode: str = 'reflect',
                f32_layers=()):
    """Fake-quantized folded forward — ``offline_forward_q8`` in f32 math.

    ``params``: list of (w, b) f32 pairs (the trainable fold). Each conv
    quantizes its input with the layer's static scale and its weight with
    the live per-channel rule; conv → +bias → clamp(0, 20) as in
    infer.offline_forward_q8:102-131. Padding is applied AFTER activation
    fake-quant, matching the int8 path (which pads the quantized tensor).
    Layers listed in ``f32_layers`` (indices, or ``'head'``) skip the
    ACTIVATION quantization but keep the weight fake-quant, mirroring the
    mixed-precision inference option exactly (infer.offline_forward_q8's
    f32 branch dequantizes the int8 weights — and export quantizes every
    layer's weights regardless of the exemption list).

    With ``act_scales=None`` the activation scale is dynamic per batch row
    (max|x|/127 over valid frames), matching the uncalibrated int8 path.
    Returns (log_probs [B, T', L], out_lengths | None).
    """
    import jax
    import jax.numpy as jnp

    from .infer import dynamic_act_scale

    def a_scale(x, i, cur_len):
        if act_scales is not None:
            return jnp.asarray(act_scales[i], jnp.float32).reshape(1, 1, 1)
        return jax.lax.stop_gradient(dynamic_act_scale(x, cur_len))

    x = jnp.asarray(feats, jnp.float32)
    cur_len = None if input_lengths is None \
        else jnp.asarray(input_lengths, jnp.int32)
    scale_total = 1
    pad_mode = 'reflect' if padding_mode == 'reflect' else 'constant'
    for i, ((k, s, d), (w, b)) in enumerate(
            zip(_layer_geometry(layers), params[:-1])):
        wi = fake_quant_weight(w)
        if i in f32_layers:
            xi = x
        else:
            xi = fake_quant_act(x, a_scale(x, i, cur_len))
        left, right = same_pad_amount(x.shape[1], k, s, d)
        if left or right:
            xi = jnp.pad(xi, ((0, 0), (left, right), (0, 0)), mode=pad_mode)
        y = jax.lax.conv_general_dilated(
            xi, wi, window_strides=(s,), padding='VALID', rhs_dilation=(d,),
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        x = jnp.clip(y + jnp.asarray(b), 0.0, 20.0)
        scale_total *= s
        if cur_len is not None:
            cur_len = cur_len // s
    wh, bh = params[-1]
    wi = fake_quant_weight(wh)
    if 'head' in f32_layers:
        xi = x
    else:
        xi = fake_quant_act(x, a_scale(x, len(params) - 1, cur_len))
    logits = jnp.einsum('btc,cl->btl', xi, wi[0]) + jnp.asarray(bh)
    logp = jax.nn.log_softmax(logits, axis=-1)
    out_lens = None if input_lengths is None \
        else jnp.asarray(input_lengths, jnp.int32) // scale_total
    return logp, out_lens


def qat_finetune(layers, folded, frontend, loader, *, act_scales=None,
                 steps: int = 300, learning_rate: float = 1e-4,
                 optimizer: str = 'lamb', f32_layers=(),
                 padding_mode: str = 'reflect',
                 log_every: int = 25, progress=None, ctc_impl=None):
    """Finetune a folded f32 stack against its int8 deployment graph.

    ``folded``: f32 fold from streaming.fold_batchnorm (NOT int8 — start
    from the true weights so QAT can move them off rounding boundaries).
    ``frontend``: batched feature extractor (audio, lengths) -> (feats,
    flens); use the serving frontend (dither=0, per-utterance norm) so
    training sees deployment features. ``loader``: BucketBatchLoader over
    the finetuning manifest (re-iterating it advances epochs).

    Runs ``steps`` Adam steps of masked-mean CTC loss through
    ``qat_forward`` and returns (new_folded, history) where ``history``
    is a list of (step, loss) floats. One jitted program per length
    bucket (weights are jit arguments — memory: closure constants bake
    600 MB into the HLO). ``ctc_impl``: alternative CTC loss (e.g.
    ops.ctc_pallas.ctc_loss_pallas on TPU, ~16x the scan's speed).

    ``optimizer``: 'lamb' (default) or 'adam'. LAMB's trust ratio scales
    each layer's update by its weight norm, so ``learning_rate`` is a
    *relative* per-step drift — essential here because BN-folded conv
    weights span orders of magnitude across layers (the fold divides by
    running std), and Adam's scale-free absolute steps at any lr large
    enough to move big layers destroy the small ones (measured: loss
    0.005 -> 2.7 in 4 Adam steps at 1e-4; LAMB at 1e-4 is stable).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..ops.ctc import ctc_loss
    from ..training.trainer import masked_ctc_mean

    if ctc_impl is None:
        ctc_impl = ctc_loss

    params = [(jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
              for w, b in folded]
    if optimizer == 'lamb':
        opt = optax.lamb(learning_rate)
    elif optimizer == 'adam':
        opt = optax.adam(learning_rate)
    else:
        raise ValueError(f'unknown optimizer {optimizer!r}')
    opt_state = opt.init(params)

    def loss_fn(p, feats, flens, targets, tlens, mask):
        logp, out_lens = qat_forward(
            layers, p, feats, input_lengths=flens, act_scales=act_scales,
            padding_mode=padding_mode, f32_layers=f32_layers)
        return masked_ctc_mean(logp, out_lens, targets, tlens, mask,
                               ctc_impl=ctc_impl)

    @jax.jit
    def step_fn(p, o, audio, alens, targets, tlens, mask):
        feats, flens = frontend(audio, alens)
        loss, grads = jax.value_and_grad(loss_fn)(
            p, feats, flens, targets, tlens, mask)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    history = []
    step = 0
    while step < steps:
        for batch in loader:
            if step >= steps:
                break
            params, opt_state, loss = step_fn(
                params, opt_state, batch['audio'], batch['audio_lengths'],
                batch['targets'], batch['target_lengths'],
                batch['batch_mask'])
            step += 1
            if step % log_every == 0 or step == steps:
                lv = float(loss)
                history.append((step, lv))
                if progress is not None:
                    progress(f'qat step {step}/{steps}: loss {lv:.4f}')
    new_folded = [(np.asarray(w, np.float32), np.asarray(b, np.float32))
                  for w, b in jax.device_get(params)]
    return new_folded, history
