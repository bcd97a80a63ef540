"""Streaming Jasper: exact offline equivalence of chunked inference.

Same contract as tests/test_streaming.py but for the Jasper block
structure: zero symmetric padding, separable convs, masked float length
arithmetic, in-block residual branches (add/max, dense panes), eval-mode
softmax output.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.models.jasper import Jasper
from wav2letter_pytorch_tpu.serving import StreamingJasper
from tests.test_streaming import _run_stream

SR = 16000
HOP = 160
N_MELS = 8

JASPER_SMALL = [
    {'layer_size': 12, 'kernel_size': 8, 'stride': 2, 'residual': False,
     'separable': True},
    {'layer_size': 12, 'kernel_size': 7, 'stride': 1, 'residual': True,
     'separable': True, 'repeat': 2},
    {'layer_size': 16, 'kernel_size': 5, 'stride': 1, 'residual': True,
     'separable': False, 'residual_mode': 'max'},
]

JASPER_DENSE = [
    {'layer_size': 12, 'kernel_size': 8, 'stride': 2, 'residual': False,
     'separable': True},
    {'layer_size': 12, 'kernel_size': 7, 'residual': True,
     'residual_dense': True, 'separable': True},
    {'layer_size': 12, 'kernel_size': 11, 'residual': True,
     'residual_dense': True, 'separable': True},
    {'layer_size': 14, 'kernel_size': 5, 'residual': True,
     'separable': False},
]


def _build(blocks, num_labels=7, seed=0):
    import jax
    frontend = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0)
    model = Jasper(jasper_blocks=blocks, num_labels=num_labels,
                   mid_layers=len(blocks))
    t0 = 8000
    feats, flens = frontend(np.zeros((1, t0), np.float32), np.array([t0]))
    variables = model.init(jax.random.PRNGKey(seed), feats, flens,
                           train=False)
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])
    rng = np.random.default_rng(seed + 1)
    for blk in stats.values():
        for bn in blk.values():
            bn['mean'] = rng.normal(0, 0.1, bn['mean'].shape) \
                .astype(np.float32)
            bn['var'] = (1.0 + rng.uniform(0, 0.5, bn['var'].shape)) \
                .astype(np.float32)
    for blk in params.values():
        for name, sub in blk.items():
            if name.endswith('_norm'):
                sub['scale'] = (1.0 + rng.uniform(-0.2, 0.2,
                                                  sub['scale'].shape)) \
                    .astype(np.float32)
    return model, {'params': params, 'batch_stats': stats}, frontend


def _offline(model, variables, frontend, audio, lengths, pad_samples):
    B = audio.shape[0]
    buf = np.zeros((B, pad_samples), np.float32)
    buf[:, :audio.shape[1]] = audio
    feats, flens = frontend(buf, np.asarray(lengths))
    probs, out_lens = model.apply(variables, feats, flens, train=False)
    return np.asarray(probs), np.asarray(out_lens)


def _parity(blocks, tail_offsets, chunk_frames=16, n_chunks=3, seed=0,
            norm='precomputed'):
    model, variables, frontend = _build(blocks, seed=seed)
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats if norm == 'precomputed'
                             else None)
    sj = StreamingJasper(blocks, 7, variables, fe,
                         chunk_frames=chunk_frames, norm=norm,
                         norm_stats=stats if norm == 'precomputed'
                         else None)
    base = sj.prime_samples + n_chunks * sj.chunk_samples
    lengths = [base + t for t in tail_offsets]
    rng = np.random.default_rng(42 + seed)
    audio = (rng.standard_normal((len(lengths), max(lengths))) * 0.1) \
        .astype(np.float32)
    for b, L in enumerate(lengths):
        audio[b, L:] = 0.0

    margin = (sj.lookahead_frames + 16) * HOP
    probs_off, out_lens = _offline(model, variables, fe, audio, lengths,
                                   max(lengths) + margin)
    emitted, total_valid = _run_stream(sj, audio, np.asarray(lengths))
    np.testing.assert_array_equal(total_valid, out_lens)
    for b in range(len(lengths)):
        v = int(total_valid[b])
        np.testing.assert_allclose(emitted[b, :v], probs_off[b, :v],
                                   atol=1e-4, rtol=1e-3)
    return sj


def test_jasper_stream_matches_offline():
    # Separable + repeat-2 + non-separable max-residual; ragged ends.
    _parity(JASPER_SMALL, [1311, 707])


def test_jasper_stream_boundary_ends():
    _parity(JASPER_SMALL, [0, 2559], n_chunks=2, seed=3)


def test_jasper_stream_dense_residual():
    _parity(JASPER_DENSE, [901], seed=5)


def test_jasper_flagship_structure():
    """The real 15-block config geometry (toy widths): even kernels up to
    74, stride-2 separable entry."""
    from wav2letter_pytorch_tpu.config import load_config
    cfg = load_config(['data.train_manifest=u', 'data.val_manifest=u',
                       'model=jasper', 'model.mid_layers=15'])
    blocks = []
    for b in [dict(x) for x in cfg.model.jasper_blocks][:15]:
        b['layer_size'] = 12
        blocks.append(b)
    sj = _parity(blocks, [640], chunk_frames=32, n_chunks=1, seed=7)
    assert sj.lookahead_frames > 100


def test_jasper_int8_close_to_f32():
    """Weight-only int8 Jasper streaming stays close to the f32 session
    (same chunks, same state machinery)."""
    model, variables, frontend = _build(JASPER_SMALL)
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    kw = dict(chunk_frames=16, norm='precomputed', norm_stats=stats)
    s32 = StreamingJasper(JASPER_SMALL, 7, variables, fe, **kw)
    s8 = StreamingJasper(JASPER_SMALL, 7, variables, fe, weights='int8',
                         **kw)
    length = s32.prime_samples + s32.chunk_samples + 640
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)
    a, va = _run_stream(s32, audio, np.array([length]))
    b, vb = _run_stream(s8, audio, np.array([length]))
    v = int(va[0])
    assert v == int(vb[0])
    assert np.mean(np.abs(a[0, :v] - b[0, :v])) < 0.02
    agree = np.mean(np.argmax(a[0, :v], -1) == np.argmax(b[0, :v], -1))
    assert agree > 0.9


def test_jasper_unsupported_configs():
    model, variables, frontend = _build(JASPER_SMALL)
    bad = [dict(JASPER_SMALL[0]), dict(JASPER_SMALL[1])]
    bad[1]['normalization'] = 'layer'
    with pytest.raises(ValueError, match='batch norm'):
        StreamingJasper(bad, 7, variables, frontend)
