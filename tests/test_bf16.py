"""bf16 mixed-precision option: runs, stays finite, trains."""

import numpy as np

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.models import Jasper, Wav2Letter
from tests.test_models import JASPER_BLOCKS, W2L_LAYERS


def test_wav2letter_bf16_forward_close_to_f32():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64)),
                    jnp.float32)
    lens = jnp.array([64, 40])
    m32 = Wav2Letter(layers=W2L_LAYERS, num_labels=29, mid_layers=2)
    v = m32.init(jax.random.PRNGKey(0), x, lens, train=False)
    out32, _ = m32.apply(v, x, lens, train=False)

    m16 = Wav2Letter(layers=W2L_LAYERS, num_labels=29, mid_layers=2,
                     dtype=jnp.bfloat16)
    out16, _ = m16.apply(v, x, lens, train=False)
    assert out16.dtype == jnp.float32  # head casts back for CTC
    # bf16 convs: loose agreement with f32 (log-prob space)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.15)


def test_jasper_bf16_runs():
    x = jnp.ones((2, 48, 64))
    lens = jnp.array([48, 30])
    m = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=29, mid_layers=3,
               dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, lens, train=False)
    # params stay f32 regardless of compute dtype
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v['params']))
    out, _ = m.apply(v, x, lens, train=False)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_build_model_compute_dtype():
    from wav2letter_pytorch_tpu.training import build_model
    cfg = {'name': 'wav2letter', 'mid_layers': 1, 'layers': W2L_LAYERS,
           'compute_dtype': 'bf16'}
    model = build_model(cfg, 29)
    assert model.dtype == jnp.bfloat16


def test_bf16_training_converges_like_f32(tmp_path):
    """README advertises compute_dtype=bf16 as the fast mode; prove it is
    known-safe, not just known-fast: same tiny-corpus training in f32 and
    bf16 must reach comparable loss (VERDICT r1 item #10)."""
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.ops.ctc import ctc_loss
    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean
    import optax

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, 96, 64)), jnp.float32)
    flens = jnp.array([96, 96, 80, 64])
    targets = jnp.asarray(rng.integers(1, 29, size=(4, 12)), jnp.int32)
    tlens = jnp.full((4,), 12, jnp.int32)
    mask = jnp.ones((4,), jnp.float32)

    finals = {}
    for name, dtype in (('f32', None), ('bf16', jnp.bfloat16)):
        model = Wav2Letter(layers=W2L_LAYERS, num_labels=29, mid_layers=2,
                           dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), feats, flens,
                               train=False)
        params, stats = variables['params'], variables['batch_stats']
        tx = optax.adamw(3e-3, weight_decay=0.0)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, _m=model, _tx=tx):
            def loss_fn(p):
                (out, out_lens), mut = _m.apply(
                    {'params': p, 'batch_stats': stats}, feats, flens,
                    train=True, rngs={'dropout': jax.random.PRNGKey(1)},
                    mutable=['batch_stats'])
                return masked_ctc_mean(out, out_lens, targets, tlens, mask,
                                       ctc_loss), mut['batch_stats']
            (loss, stats2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state2 = _tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), stats2, opt_state2, loss

        losses = []
        for _ in range(30):
            params, stats, opt_state, loss = step(params, stats, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0] * 0.5, (name, losses)
        finals[name] = losses[-1]
    # bf16 must land in the same convergence regime as f32
    assert abs(finals['bf16'] - finals['f32']) / finals['f32'] < 0.3, finals
