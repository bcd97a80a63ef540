"""Reference-checkpoint import: torch/Lightning state_dicts -> flax trees.

The torch models here are *state_dict-layout shells* built with the
reference's module/attribute names (conv1ds.conv1d_i.conv1/batch_norm,
jasper_encoder.b.mconv/res, final_layer.0 — /root/reference/wav2letter.py:49-72,
jasper.py:196-257,432-434) so the keys match what a real reference ``.ckpt``
contains; forwards are replicated functionally for numeric parity.
"""

from collections import OrderedDict

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.models import Jasper, Wav2Letter
from wav2letter_pytorch_tpu.models.jasper import get_same_padding
from wav2letter_pytorch_tpu.training.torch_import import (
    variables_from_torch_state_dict)

W2L_LAYERS = [
    dict(output_size=24, kernel_size=7, stride=2, dilation=1, dropout=0.1),
    dict(output_size=32, kernel_size=5, stride=1, dilation=2, dropout=0.1),
]


def _torch_w2l(f_in, layers, n_labels, seed=0):
    """Module tree with the reference's state_dict layout (wav2letter.py:49-72)."""
    torch.manual_seed(seed)
    blocks = []
    cin = f_in
    for i, spec in enumerate(layers):
        m = torch.nn.Module()
        m.conv1 = torch.nn.Conv1d(cin, spec['output_size'],
                                  spec['kernel_size'], stride=spec['stride'],
                                  dilation=spec['dilation'])
        m.batch_norm = torch.nn.BatchNorm1d(spec['output_size'],
                                            momentum=0.9, eps=1e-3)
        with torch.no_grad():  # non-trivial running stats to catch mapping
            m.batch_norm.running_mean.normal_(0.1, 0.2)
            m.batch_norm.running_var.uniform_(0.5, 1.5)
            m.batch_norm.weight.normal_(1.0, 0.1)
            m.batch_norm.bias.normal_(0.0, 0.1)
        blocks.append((f'conv1d_{i}', m))
        cin = spec['output_size']
    head = torch.nn.Module()
    head.conv1 = torch.nn.Conv1d(cin, n_labels, 1)
    blocks.append((f'conv1d_{len(layers)}', head))
    root = torch.nn.Module()
    root.conv1ds = torch.nn.Sequential(OrderedDict(blocks))
    return root


def _torch_w2l_forward(root, x, layers):
    """Eval forward under OUR (time-correct) SAME-padding convention —
    the importer maps weights; padding is a framework property."""
    xt = torch.tensor(x.transpose(0, 2, 1))
    t_in = x.shape[1]
    specs = list(layers) + [dict(output_size=None, kernel_size=1, stride=1,
                                 dilation=1)]
    with torch.no_grad():
        for i, spec in enumerate(specs):
            k, s, d = spec['kernel_size'], spec['stride'], spec['dilation']
            out_t = (t_in + s - 1) // s
            pad = max(0, (out_t - 1) * s + (k - 1) * d + 1 - t_in)
            t_in = out_t
            if pad:
                xt = torch.nn.functional.pad(xt, (pad // 2, pad - pad // 2),
                                             mode='reflect')
            blk = getattr(root.conv1ds, f'conv1d_{i}')
            xt = blk.conv1(xt)
            if i < len(layers):
                xt = blk.batch_norm.eval()(xt)
                xt = torch.clamp(xt, 0, 20)
        return torch.nn.functional.log_softmax(
            xt.transpose(1, 2), dim=-1).numpy()


def test_w2l_import_numeric_parity():
    B, T, F, L = 2, 64, 16, 29
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    root = _torch_w2l(F, W2L_LAYERS, L)
    ref = _torch_w2l_forward(root, x, W2L_LAYERS)

    model = Wav2Letter(layers=W2L_LAYERS, num_labels=L, mid_layers=2,
                       precision='highest')
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.array([T, T]), train=False)
    tree = variables_from_torch_state_dict(root.state_dict(), variables)
    ours, _ = model.apply(tree, jnp.asarray(x), jnp.array([T, T]),
                          train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def _mc(conv):
    """MaskedConv1d state_dict shell: the conv lives at ``.conv``
    (jasper.py:96-105)."""
    m = torch.nn.Module()
    m.conv = conv
    return m


def _bn(c, seed):
    bn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.1)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
        bn.running_var.copy_(torch.rand(c, generator=g) + 0.5)
        bn.weight.copy_(torch.randn(c, generator=g) * 0.1 + 1)
        bn.bias.copy_(torch.randn(c, generator=g) * 0.1)
    return bn


JASPER_BLOCKS = [
    dict(layer_size=16, kernel_size=5, stride=2, residual=False,
         separable=True, repeat=1),
    dict(layer_size=24, kernel_size=5, stride=1, residual=True,
         separable=True, repeat=2, dropout=0.1),
]


def _torch_jasper(f_in, blocks, n_labels):
    """jasper_encoder.{b}.mconv/res layout (jasper.py:196-257, 432-434):
    mconv = repeat x [dw conv, pw conv, norm, (act/dropout: no params)]."""
    torch.manual_seed(1)
    enc = []
    cin = f_in
    for spec in blocks:
        blk = torch.nn.Module()
        mods, seed = [], len(enc) * 100
        c_loop = cin
        repeat = spec.get('repeat', 1)
        for r in range(repeat):
            k = spec['kernel_size']
            s = spec['stride']
            pad = get_same_padding(k, s, 1)
            mods.append(_mc(torch.nn.Conv1d(c_loop, c_loop, k, stride=s,
                                            padding=pad, groups=c_loop,
                                            bias=False)))
            mods.append(_mc(torch.nn.Conv1d(c_loop, spec['layer_size'], 1,
                                            bias=False)))
            mods.append(_bn(spec['layer_size'], seed + r))
            if r < repeat - 1:
                # parameter-less act+dropout slots occupy mconv indices in
                # the reference (jasper.py:214-216, 374-377) — keep them so
                # this shell's state_dict keys match a real checkpoint's
                mods.append(torch.nn.ReLU())
                mods.append(torch.nn.Dropout(spec.get('dropout', 0.0)))
            c_loop = spec['layer_size']
        blk.mconv = torch.nn.ModuleList(mods)
        if spec.get('residual'):
            pane = torch.nn.ModuleList([
                _mc(torch.nn.Conv1d(cin, spec['layer_size'], 1, bias=False)),
                _bn(spec['layer_size'], seed + 50)])
            blk.res = torch.nn.ModuleList([pane])
        enc.append(blk)
        cin = spec['layer_size']
    root = torch.nn.Module()
    root.jasper_encoder = torch.nn.Sequential(*enc)
    root.final_layer = torch.nn.Sequential(torch.nn.Conv1d(cin, n_labels, 1))
    return root


def _torch_jasper_forward(root, x, blocks):
    """Eval replica: repeat x (dw->pw->bn->relu) ... last repeat bn, then
    +residual(conv->bn), relu; head conv; softmax (jasper.py:390-416,470-473)."""
    xt = torch.tensor(x.transpose(0, 2, 1))
    with torch.no_grad():
        for b, spec in enumerate(blocks):
            blk = root.jasper_encoder[b]
            h = xt
            i = 0
            for r in range(spec.get('repeat', 1)):
                h = blk.mconv[i].conv(h)
                h = blk.mconv[i + 1].conv(h)
                h = blk.mconv[i + 2].eval()(h)
                i += 3
                if r < spec.get('repeat', 1) - 1:
                    h = torch.relu(h)
                    i += 2  # act + dropout slots
            if spec.get('residual'):
                r0 = blk.res[0][1].eval()(blk.res[0][0].conv(xt))
                h = h + r0
            xt = torch.relu(h)
        out = root.final_layer(xt).transpose(1, 2)
        return torch.softmax(out, dim=-1).numpy()


def test_jasper_import_numeric_parity():
    B, T, F, L = 2, 32, 16, 29
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    root = _torch_jasper(F, JASPER_BLOCKS, L)
    ref = _torch_jasper_forward(root, x, JASPER_BLOCKS)

    model = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=L, mid_layers=2,
                   precision='highest')
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.array([T, T]), train=False)
    tree = variables_from_torch_state_dict(root.state_dict(), variables)
    ours, _ = model.apply(tree, jnp.asarray(x), jnp.array([T, T]),
                          train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_w2l_export_strict_loads_and_roundtrips():
    """Export emits the reference's exact key set (strict load) and
    import(export(v)) == v."""
    from wav2letter_pytorch_tpu.training.torch_import import (
        torch_state_dict_from_variables)

    F, L = 16, 29
    model = Wav2Letter(layers=W2L_LAYERS, num_labels=L, mid_layers=2)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, F)),
                           jnp.array([64]), train=False)
    sd = torch_state_dict_from_variables(variables)
    shell = _torch_w2l(F, W2L_LAYERS, L, seed=9)
    shell.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                          strict=True)
    back = variables_from_torch_state_dict(shell.state_dict(), variables)
    for a, b in zip(jax.tree_util.tree_leaves(
            {'params': variables['params'],
             'batch_stats': variables['batch_stats']}),
            jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_jasper_export_strict_loads_and_roundtrips():
    from wav2letter_pytorch_tpu.training.torch_import import (
        torch_state_dict_from_variables)

    F, L = 16, 29
    model = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=L, mid_layers=2)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, F)),
                           jnp.array([32]), train=False)
    sd = torch_state_dict_from_variables(variables,
                                         jasper_blocks=JASPER_BLOCKS)
    shell = _torch_jasper(F, JASPER_BLOCKS, L)
    shell.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                          strict=True)
    back = variables_from_torch_state_dict(shell.state_dict(), variables)
    for a, b in zip(jax.tree_util.tree_leaves(
            {'params': variables['params'],
             'batch_stats': variables['batch_stats']}),
            jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_import_rejects_geometry_mismatch():
    root = _torch_w2l(16, W2L_LAYERS, 29)
    model = Wav2Letter(layers=W2L_LAYERS[:1], num_labels=29, mid_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)),
                           jnp.array([32]), train=False)
    with pytest.raises((KeyError, ValueError)):
        variables_from_torch_state_dict(root.state_dict(), variables)


def test_import_cli_roundtrip(tmp_path):
    """scripts/import_torch_checkpoint.py -> run dir -> test.py eval."""
    import importlib.util
    import os

    from tests.test_train_e2e import _make_corpus

    layers = [dict(output_size=24, kernel_size=7, stride=2, dilation=1,
                   dropout=0.1)]
    root = _torch_w2l(32, layers, 29)
    ckpt = str(tmp_path / 'ref.ckpt')
    torch.save({'state_dict': root.state_dict(),
                'epoch': 4, 'global_step': 1234}, ckpt)

    out = str(tmp_path / 'imported')
    spec = importlib.util.spec_from_file_location(
        'import_torch_checkpoint',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'import_torch_checkpoint.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(['--ckpt', ckpt, '--out', out,
                   'model.input_size=32',
                   'model.layers=[{output_size: 24, kernel_size: 7, '
                   'stride: 2, dilation: 1, dropout: 0.1}]',
                   'trainer.mesh.data=2'])
    assert rc == 0

    # weights really came from the torch checkpoint
    from wav2letter_pytorch_tpu.training import load_run
    _, trainer, _, _, _ = load_run(out)
    got = np.asarray(jax.device_get(
        trainer.state.params['conv1d_0']['Conv_0']['kernel']))
    want = root.conv1ds.conv1d_0.conv1.weight.detach().numpy()
    np.testing.assert_allclose(got, want.transpose(2, 1, 0), atol=1e-7)

    manifest = _make_corpus(tmp_path)
    import test as test_cli
    rc = test_cli.main(['--model-path', out, '--test-manifest', manifest])
    assert rc == 0

    # full circle: export back to a reference-format torch checkpoint and
    # compare tensor-for-tensor with the original state_dict
    spec2 = importlib.util.spec_from_file_location(
        'export_torch_checkpoint',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'export_torch_checkpoint.py'))
    mod2 = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(mod2)
    back_ckpt = str(tmp_path / 'back.ckpt')
    rc = mod2.main(['--model-path', out, '--out', back_ckpt])
    assert rc == 0
    back_sd = torch.load(back_ckpt, map_location='cpu',
                         weights_only=True)['state_dict']
    orig_sd = root.state_dict()
    assert set(back_sd) == set(orig_sd)
    for k in orig_sd:
        np.testing.assert_allclose(back_sd[k].numpy(), orig_sd[k].numpy(),
                                   atol=1e-7, err_msg=k)
