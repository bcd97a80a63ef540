"""Full-model weight-copy parity: flax Wav2Letter vs a torch replica.

Stacks multiple blocks + the 1x1 head and compares eval-mode outputs with
identical weights, covering inter-block composition, BN-eval chains, and
the final log_softmax — stronger than the per-block parity test.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from wav2letter_pytorch_tpu.models import Wav2Letter

LAYERS = [
    dict(output_size=24, kernel_size=7, stride=2, dilation=1, dropout=0.1),
    dict(output_size=32, kernel_size=5, stride=1, dilation=2, dropout=0.1),
]


def test_full_wav2letter_matches_torch_replica():
    B, T, F, L = 2, 64, 16, 29
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, F)).astype(np.float32)

    model = Wav2Letter(layers=LAYERS, num_labels=L, mid_layers=2,
                       precision='highest')
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.array([T, T]), train=False)
    ours, out_lens = model.apply(variables, jnp.asarray(x),
                                 jnp.array([T, T // 2]), train=False)
    ours = np.asarray(ours)
    assert out_lens.tolist() == [T // 2, T // 4]

    # torch replica with copied weights, NCW layout
    params = variables['params']
    mods = []
    t_in = T
    for i, spec in enumerate(LAYERS + [dict(output_size=L, kernel_size=1,
                                            stride=1, dilation=1)]):
        k, s, d = spec['kernel_size'], spec['stride'], spec['dilation']
        out_t = (t_in + s - 1) // s
        pad = max(0, (out_t - 1) * s + (k - 1) * d + 1 - t_in)
        t_in = out_t
        p = params[f'conv1d_{i}']
        kernel = np.asarray(p['Conv_0']['kernel'])   # [k, cin, cout]
        conv = torch.nn.Conv1d(kernel.shape[1], kernel.shape[2], k, stride=s,
                               dilation=d)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(kernel.transpose(2, 1, 0)))
            conv.bias.copy_(torch.tensor(np.asarray(p['Conv_0']['bias'])))
        is_head = i == 2
        bn = None
        if not is_head:
            bn = torch.nn.BatchNorm1d(kernel.shape[2], momentum=0.9,
                                      eps=1e-3).eval()
        mods.append((pad, conv, bn, not is_head))

    xt = torch.tensor(x.transpose(0, 2, 1))
    with torch.no_grad():
        for pad, conv, bn, act in mods:
            if pad:
                xt = torch.nn.functional.pad(xt, (pad // 2, pad - pad // 2),
                                             mode='reflect')
            xt = conv(xt)
            if bn is not None:
                xt = bn(xt)
            if act:
                xt = torch.clamp(xt, 0, 20)
        ref = torch.nn.functional.log_softmax(xt.transpose(1, 2), dim=-1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)


def test_jasper_eval_feeds_beam_search():
    """Jasper eval output is prob-space and passes the beam-search
    non-negativity contract (reference jasper.py:473 + decoder.py:164)."""
    from wav2letter_pytorch_tpu.decoding import prefix_beam_search
    from wav2letter_pytorch_tpu.models import Jasper
    from wav2letter_pytorch_tpu.data.label_sets import english_labels

    blocks = [dict(layer_size=16, kernel_size=5, residual=True,
                   separable=True)]
    model = Jasper(jasper_blocks=blocks, num_labels=len(english_labels),
                   mid_layers=1)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 20, 16)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([20]),
                           train=False)
    probs, lens = model.apply(variables, x, jnp.array([20]), train=False)
    probs = np.asarray(probs)[0]
    assert (probs >= 0).all()
    out = prefix_beam_search(probs, english_labels, k=2)
    assert isinstance(out, str)
