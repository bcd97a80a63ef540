"""Acoustic model tests: shapes, masking, and weight-copy parity vs torch.

The reference never tests its models (SURVEY.md §4 coverage gaps); here we
check structural behavior plus numerical parity of the core blocks against
freshly-built torch equivalents with identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2letter_pytorch_tpu.models import Jasper, Wav2Letter
from wav2letter_pytorch_tpu.models.jasper import MaskedConv
from wav2letter_pytorch_tpu.models.wav2letter import Conv1dBlock

W2L_LAYERS = [
    dict(output_size=32, kernel_size=11, stride=2, dilation=1, dropout=0.2),
    dict(output_size=32, kernel_size=11, stride=1, dilation=1, dropout=0.2),
    dict(output_size=48, kernel_size=13, stride=1, dilation=2, dropout=0.3),
]

JASPER_BLOCKS = [
    dict(layer_size=32, kernel_size=11, stride=2, residual=False, separable=True),
    dict(layer_size=32, kernel_size=11, stride=1, residual=True, separable=True,
         repeat=2, dropout=0.1),
    dict(layer_size=64, kernel_size=1, stride=1, residual=False, separable=False),
]


def _init_w2l(mid_layers, num_labels=29, T=96, F=64):
    model = Wav2Letter(layers=W2L_LAYERS, num_labels=num_labels,
                       mid_layers=mid_layers)
    x = jnp.ones((2, T, F))
    lens = jnp.array([T, T // 2])
    variables = model.init(jax.random.PRNGKey(0), x, lens, train=False)
    return model, variables, x, lens


def test_wav2letter_shapes_and_lengths():
    model, variables, x, lens = _init_w2l(mid_layers=3)
    out, out_lens = model.apply(variables, x, lens, train=False)
    assert model.scaling_factor == 2
    assert out.shape == (2, 48, 29)  # ceil(96/2) frames, 29 labels
    assert out_lens.tolist() == [48, 24]
    # log-probs normalize
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)


def test_wav2letter_train_mode_runs():
    model, variables, x, lens = _init_w2l(mid_layers=2)
    out, _ = model.apply(variables, x, lens, train=True,
                         rngs={'dropout': jax.random.PRNGKey(1)},
                         mutable=['batch_stats'])[0], None
    assert np.isfinite(np.asarray(out[0])).all()


def test_conv1d_block_matches_torch():
    """Weight-copy parity: flax Conv1dBlock == reflect-pad conv + BN(eval) +
    clamp built from the same weights in torch. Even T so reference-style
    and SAME padding agree (SURVEY.md quirks: wav2letter.py:23-34)."""
    B, T, Cin, Cout, K = 2, 64, 16, 24, 11
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)

    block = Conv1dBlock(features=Cout, kernel_size=K, stride=1, dilation=1,
                        dropout=-1.0, precision='highest')
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

    kernel = np.asarray(variables['params']['Conv_0']['kernel'])  # [K, Cin, Cout]
    bias = np.asarray(variables['params']['Conv_0']['bias'])
    conv = torch.nn.Conv1d(Cin, Cout, K, padding=0)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(kernel.transpose(2, 1, 0)))
        conv.bias.copy_(torch.tensor(bias))
    bn = torch.nn.BatchNorm1d(Cout, momentum=0.9, eps=1e-3).eval()
    pad = torch.nn.ReflectionPad1d((5, 5))
    xt = torch.tensor(x.transpose(0, 2, 1))  # [B, C, T]
    with torch.no_grad():
        ref = torch.clamp(bn(conv(pad(xt))), 0, 20).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_masked_conv_matches_torch():
    """MaskedConv parity: zero-fill past lengths, pad k//2, depthwise conv."""
    B, T, C, K = 2, 40, 8, 7
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([40, 25], dtype=np.int32)

    mc = MaskedConv(features=C, kernel_size=K, groups=C, padding=K // 2,
                    use_mask=True, precision='highest')
    variables = mc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lens))
    ours, new_lens = mc.apply(variables, jnp.asarray(x), jnp.asarray(lens))

    kernel = np.asarray(variables['params']['Conv_0']['kernel'])  # [K, 1, C]
    conv = torch.nn.Conv1d(C, C, K, padding=K // 2, groups=C, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(kernel.transpose(2, 1, 0)))
    xt = torch.tensor(x.transpose(0, 2, 1)).clone()
    xt[1, :, 25:] = 0
    with torch.no_grad():
        ref = conv(xt).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
    assert np.asarray(new_lens).tolist() == [40.0, 25.0]  # k//2 SAME keeps lens


def test_jasper_shapes_and_masking():
    model = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=29, mid_layers=3)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 80, 64)),
                    jnp.float32)
    lens = jnp.array([80, 50])
    variables = model.init(jax.random.PRNGKey(0), x, lens, train=False)
    probs, out_lens = model.apply(variables, x, lens, train=False)
    assert model.scaling_factor == 2
    assert probs.shape == (2, 40, 29)
    assert out_lens.tolist() == [40, 25]
    # eval emits true probabilities (reference jasper.py:473)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=3e-4)

    # train mode emits log probs and needs dropout rng + mutable batch_stats
    (logp, _), _ = model.apply(variables, x, lens, train=True,
                               rngs={'dropout': jax.random.PRNGKey(3)},
                               mutable=['batch_stats'])
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=3e-4)


def test_jasper_residual_modes_and_norms():
    for mode, norm in [('add', 'batch'), ('max', 'group'), ('add', 'layer'),
                       ('max', 'instance')]:
        blocks = [dict(layer_size=16, kernel_size=5, residual=True,
                       separable=True, residual_mode=mode, normalization=norm,
                       norm_groups=4)]
        model = Jasper(jasper_blocks=blocks, num_labels=10, mid_layers=1)
        x = jnp.ones((1, 32, 16))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([32]),
                               train=False)
        out, _ = model.apply(variables, x, jnp.array([32]), train=False)
        assert np.isfinite(np.asarray(out)).all()


def test_jasper_dense_residual():
    blocks = [
        dict(layer_size=16, kernel_size=5, residual=False, separable=True),
        dict(layer_size=16, kernel_size=5, residual=True, separable=True,
             residual_dense=True),
        dict(layer_size=16, kernel_size=5, residual=True, separable=True,
             residual_dense=True),
    ]
    model = Jasper(jasper_blocks=blocks, num_labels=10, mid_layers=3)
    x = jnp.ones((1, 32, 16))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([32]),
                           train=False)
    # The last dense block must own residual branches for every pane.
    params = variables['params']['block2']
    assert any(k.startswith('res1') for k in params)
    out, _ = model.apply(variables, x, jnp.array([32]), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_jasper_heads_and_groupshuffle():
    blocks = [dict(layer_size=16, kernel_size=5, residual=True,
                   separable=True, heads=4, groups=2)]
    model = Jasper(jasper_blocks=blocks, num_labels=10, mid_layers=1)
    x = jnp.ones((2, 32, 16))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([32, 20]),
                           train=False)
    out, _ = model.apply(variables, x, jnp.array([32, 20]), train=False)
    assert out.shape == (2, 32, 10)
    params = variables['params']['block0']
    # heads folds the depthwise conv to `heads` channels (jasper.py:124-130)
    assert params['rep0_dw']['Conv_0']['kernel'].shape == (5, 1, 4)
    # pointwise is grouped by the block's groups
    assert params['rep0_pw']['Conv_0']['kernel'].shape == (1, 16 // 2, 16)
    # residual 1x1 branches are PLAIN convs — the reference builds them
    # with _get_conv_bn_layer defaults groups=1, heads=-1
    # (jasper.py:241-257), NOT the block's groups/heads.
    assert params['res0_conv']['Conv_0']['kernel'].shape == (1, 16, 16)


def test_jasper_remat_identical_loss_and_grads():
    """model.remat=true must be a pure performance knob: block-level
    nn.remat changes when activations are (re)computed, never what the
    step computes — loss and every gradient leaf bit-exact vs baseline,
    and the parameter/batch_stats trees identical (checkpoints
    interchangeable)."""
    base = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=29, mid_layers=3)
    rematted = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=29,
                      mid_layers=3, remat=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 40)), jnp.float32)
    lens = jnp.asarray([64, 48], jnp.int32)
    variables = base.init(jax.random.PRNGKey(0), x, lens, train=False)
    assert (jax.tree_util.tree_structure(variables) ==
            jax.tree_util.tree_structure(
                rematted.init(jax.random.PRNGKey(0), x, lens, train=False)))

    def loss_fn(model, params):
        (out, out_lens), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, lens, train=True, rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        t = jnp.arange(out.shape[1])[None, :] < out_lens[:, None]
        return jnp.sum(out * t[:, :, None])

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(base, p))(
        variables['params'])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(rematted, p))(
        variables['params'])
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jasper_dropout_default_fallback():
    """model.dropout_default supplies per-block dropout where a block spec
    omits it (the reference config ships none and its code defaults to 0,
    jasper.py:449 — memorizing small corpora); explicit per-block values
    still win."""
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.training import build_model

    cfg = load_config([
        'data.train_manifest=u', 'data.val_manifest=u', 'model=jasper',
        'model.mid_layers=2', 'model.input_size=32',
        'model.jasper_blocks=[{layer_size: 16, kernel_size: 7}, '
        '{layer_size: 16, kernel_size: 7, dropout: 0.05}]',
        '+model.dropout_default=0.3',
    ])
    model = build_model(cfg.model, num_labels=29)
    assert model.dropout_default == 0.3
    # Effective per-block rates follow the fallback rule.
    rates = [float(b.get('dropout', model.dropout_default))
             for b in model.jasper_blocks]
    assert rates == [0.3, 0.05]
