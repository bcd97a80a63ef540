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
