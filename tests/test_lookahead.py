"""Bounded-lookahead streamer (serving/lookahead.py).

Correctness anchor: with ``lookahead_frames`` >= the model's one-sided
receptive field and precomputed normalization, every committed row has
its FULL real context, so the bounded streamer must reproduce the offline
forward exactly (float tolerance). With a small lookahead it must still
produce the right row count and only deviate near context boundaries.
"""

import numpy as np
import pytest

import jax

from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.data.features import SpectrogramFrontend, AudioConfig
from wav2letter_pytorch_tpu.models import Wav2Letter
from wav2letter_pytorch_tpu.serving.lookahead import (
    BoundedLookaheadStreamer, bounded_stream_logprobs, one_sided_context,
    _conv_specs_w2l)

LAYERS = [
    {'output_size': 32, 'kernel_size': 11, 'stride': 2, 'dilation': 1,
     'dropout': 0.0},
    {'output_size': 32, 'kernel_size': 13, 'stride': 1, 'dilation': 1,
     'dropout': 0.0},
    {'output_size': 48, 'kernel_size': 7, 'stride': 1, 'dilation': 2,
     'dropout': 0.0},
]


@pytest.fixture(scope='module')
def setup():
    frontend = SpectrogramFrontend(AudioConfig(), n_mels=32, dither=0.0)
    model = Wav2Letter(layers=[dict(l) for l in LAYERS], num_labels=29,
                       mid_layers=3)
    rng = np.random.default_rng(0)
    # 299 * hop samples -> 300 feature frames: the even-frame (bucketed)
    # SAME-padding convention the window program and the exact streamer
    # share; an odd offline length phase-shifts the stride-2 layer's pad
    # split and is NOT the production eval shape (buckets are even).
    audio = (rng.standard_normal((1, 299 * 160)) * 0.1).astype(np.float32)
    feats, flens = jax.jit(frontend)(audio,
                                     np.array([audio.shape[1]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), np.asarray(feats), flens,
                           train=False)
    stats = (np.zeros((32,), np.float32), np.ones((32,), np.float32))
    return frontend, model, variables, audio, stats


def _offline(model, variables, frontend, audio, stats):
    fe = SpectrogramFrontend(AudioConfig(), n_mels=32, dither=0.0,
                             norm_stats=stats)
    feats, flens = jax.jit(fe)(audio, np.array([audio.shape[1]], np.int32))
    out, out_lens = model.apply(variables, np.asarray(feats), flens,
                                train=False)
    return np.asarray(out)[:, :int(out_lens[0])]


def _interior(rows, specs, scale=2):
    """Slice away the sequence-edge rows where the window program's
    zero padding legitimately deviates from offline reflect padding
    (documented bounded-lookahead behavior)."""
    edge = -(-one_sided_context(specs) // scale) + 1
    return rows[:, edge:-edge]


def test_full_lookahead_matches_offline(setup):
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    rf = one_sided_context(specs)
    la = -(-rf // 2) * 2 + 2  # round up to stride multiple, plus margin
    sw = BoundedLookaheadStreamer(model, variables, frontend, specs,
                                  chunk_frames=32, lookahead_frames=la,
                                  norm='precomputed', norm_stats=stats)
    got = bounded_stream_logprobs(sw, audio)
    want = _offline(model, variables, frontend, audio, stats)
    assert got.shape == want.shape
    np.testing.assert_allclose(_interior(got, specs), _interior(want, specs),
                               rtol=1e-4, atol=1e-4)


def test_full_lookahead_matches_offline_irregular_feed(setup):
    """Feeding in odd-sized pieces must not change committed outputs."""
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    rf = one_sided_context(specs)
    la = -(-rf // 2) * 2 + 2
    sw = BoundedLookaheadStreamer(model, variables, frontend, specs,
                                  chunk_frames=32, lookahead_frames=la,
                                  norm='precomputed', norm_stats=stats)
    sess = sw.start()
    outs = []
    off, sizes = 0, [1111, 4096, 373, 16000, 9999]
    i = 0
    while off < audio.shape[1]:
        n = sizes[i % len(sizes)]
        outs.append(sess.feed(audio[:, off:off + n]))
        off += n
        i += 1
    outs.append(sess.finish())
    got = np.concatenate([o for o in outs if o.shape[1]], axis=1)
    want = _offline(model, variables, frontend, audio, stats)
    assert got.shape == want.shape
    np.testing.assert_allclose(_interior(got, specs), _interior(want, specs),
                               rtol=1e-4, atol=1e-4)


def test_bounded_lookahead_shape_and_locality(setup):
    """With a small lookahead the row count still matches offline and the
    early rows (whose truncated future context is mostly padding-free)
    stay close to offline."""
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    sw = BoundedLookaheadStreamer(model, variables, frontend, specs,
                                  chunk_frames=32, lookahead_frames=16,
                                  norm='precomputed', norm_stats=stats)
    got = bounded_stream_logprobs(sw, audio)
    want = _offline(model, variables, frontend, audio, stats)
    assert got.shape == want.shape
    # outputs are log-prob rows: each row still normalizes
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-3)


@pytest.mark.parametrize('mode', ['reflect', 'repeat'])
def test_extrap_window_shape_and_rows(setup, mode):
    """Extrapolated windows keep the committed row count/geometry: same
    shape as offline, rows normalized, and extrap_frames=0 path equal to
    the default streamer's output."""
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    sw = BoundedLookaheadStreamer(model, variables, frontend, specs,
                                  chunk_frames=32, lookahead_frames=16,
                                  extrap_frames=24, extrap_mode=mode,
                                  norm='precomputed', norm_stats=stats)
    got = bounded_stream_logprobs(sw, audio)
    want = _offline(model, variables, frontend, audio, stats)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-3)


def test_extrap_zero_equals_default(setup):
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    kw = dict(chunk_frames=32, lookahead_frames=16, norm='precomputed',
              norm_stats=stats)
    base = bounded_stream_logprobs(BoundedLookaheadStreamer(
        model, variables, frontend, specs, **kw), audio)
    ex0 = bounded_stream_logprobs(BoundedLookaheadStreamer(
        model, variables, frontend, specs, extrap_frames=0, **kw), audio)
    np.testing.assert_array_equal(base, ex0)


def test_extrap_validation(setup):
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    with pytest.raises(ValueError):
        BoundedLookaheadStreamer(model, variables, frontend, specs,
                                 chunk_frames=32, lookahead_frames=16,
                                 extrap_mode='linear')
    with pytest.raises(ValueError):
        BoundedLookaheadStreamer(model, variables, frontend, specs,
                                 chunk_frames=8, lookahead_frames=2,
                                 left_frames=2, extrap_frames=1000)


def test_short_stream_finish(setup):
    """A stream shorter than one frontend chunk still flushes correctly."""
    frontend, model, variables, audio, stats = setup
    specs = _conv_specs_w2l(LAYERS)
    sw = BoundedLookaheadStreamer(model, variables, frontend, specs,
                                  chunk_frames=32, lookahead_frames=16,
                                  norm='precomputed', norm_stats=stats)
    sess = sw.start()
    short = audio[:, :3000]
    out1 = sess.feed(short)
    out2 = sess.finish()
    rows = out1.shape[1] + out2.shape[1]
    want = _offline(model, variables, frontend, short, stats)
    assert rows == want.shape[1]
