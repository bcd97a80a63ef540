"""Streaming serving path: exact offline equivalence of chunked inference.

Contract under test (serving/streaming.py): with fixed normalization stats,
a StreamingWav2Letter session fed arbitrary-sized audio pieces emits the
same log-probs as the offline pipeline (SpectrogramFrontend ->
Wav2Letter.apply(train=False)) applied to the same audio zero-padded to an
even frame length beyond the utterance + network lookahead — the regime of
every bucketed offline eval batch.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.decoding.decoder import GreedyDecoder
from wav2letter_pytorch_tpu.models.wav2letter import Wav2Letter
from wav2letter_pytorch_tpu.serving import (StreamingTranscriber,
                                            StreamingWav2Letter)

SR = 16000
HOP = 160
N_MELS = 8

SMALL_LAYERS = [
    {'output_size': 12, 'kernel_size': 7, 'stride': 2, 'dilation': 1,
     'dropout': 0.2},
    {'output_size': 12, 'kernel_size': 5, 'stride': 1, 'dilation': 1,
     'dropout': 0.2},
    {'output_size': 12, 'kernel_size': 5, 'stride': 1, 'dilation': 2,
     'dropout': 0.2},
]

# The full flagship structure (every kernel size, the stride-2 entry, the
# dilated tail) at toy channel width, so the static stream plan is exercised
# on the real geometry without flagship compute cost.
FLAGSHIP_STRUCTURE = [
    {'output_size': 16, 'kernel_size': k, 'stride': s, 'dilation': d}
    for k, s, d in ([(11, 2, 1)] + [(11, 1, 1)] * 3 + [(13, 1, 1)] * 3
                    + [(17, 1, 1)] * 3 + [(21, 1, 1)] * 3 + [(25, 1, 1)] * 3
                    + [(29, 1, 2)] * 3 + [(1, 1, 1)])
]


def _build(layers, num_labels=7, seed=0):
    import jax
    frontend = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0)
    model = Wav2Letter(layers=layers, num_labels=num_labels,
                       mid_layers=len(layers))
    t0 = 4000
    feats, flens = frontend(np.zeros((1, t0), np.float32), np.array([t0]))
    variables = model.init(jax.random.PRNGKey(seed), feats, flens,
                           train=False)
    # Make BN folding non-trivial: perturb the running stats and affines.
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])
    rng = np.random.default_rng(seed + 1)
    for blk in stats.values():
        bn = blk['BatchNorm_0']
        bn['mean'] = rng.normal(0, 0.1, bn['mean'].shape).astype(np.float32)
        bn['var'] = (1.0 + rng.uniform(0, 0.5, bn['var'].shape)) \
            .astype(np.float32)
    for name, blk in params.items():
        if 'BatchNorm_0' in blk:
            blk['BatchNorm_0']['scale'] = (1.0 + rng.uniform(
                -0.2, 0.2, blk['BatchNorm_0']['scale'].shape)) \
                .astype(np.float32)
    return model, {'params': params, 'batch_stats': stats}, frontend


def _offline(model, variables, frontend, audio, lengths, pad_samples):
    B = audio.shape[0]
    buf = np.zeros((B, pad_samples), np.float32)
    buf[:, :audio.shape[1]] = audio
    feats, flens = frontend(buf, np.asarray(lengths))
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    return np.asarray(logp), np.asarray(out_lens)


def _run_stream(sw, audio, lengths, piece=1777):
    """Feed in awkward piece sizes; return (emitted logp, valid [B])."""
    sess = sw.start(audio.shape[0])
    outs = []
    maxlen = int(np.max(lengths))
    for start in range(0, maxlen, piece):
        outs.append(sess.feed(audio[:, start:start + piece]))
    logp_fin, valid_fin = sess.finish(lengths)
    emitted = np.concatenate([o for o in outs if o.shape[1]] + [logp_fin],
                             axis=1)
    total_valid = sess.head_frames_emitted + valid_fin
    return emitted, total_valid


@pytest.fixture(scope='module')
def small():
    return _build(SMALL_LAYERS)


def _parity_case(small, tail_offsets, chunk_frames=16, piece=1777,
                 n_chunks=3):
    """Streams end ``tail_offsets`` samples into the final chunk window —
    the documented batched-finish contract (ends anywhere within one chunk
    of each other; sess.consumed_samples guides the caller)."""
    model, variables, frontend = small
    B = len(tail_offsets)
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    frontend_fixed = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS,
                                         dither=0.0, norm_stats=stats)
    sw = StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend_fixed,
                             chunk_frames=chunk_frames, norm='precomputed',
                             norm_stats=stats)
    base = sw.prime_samples + n_chunks * sw.chunk_samples
    assert all(0 <= t <= sw.chunk_samples for t in tail_offsets)
    lengths = [base + t for t in tail_offsets]
    rng = np.random.default_rng(42)
    maxlen = max(lengths)
    audio = (rng.standard_normal((B, maxlen)) * 0.1).astype(np.float32)
    for b, L in enumerate(lengths):
        audio[b, L:] = 0.0

    # Offline pad: beyond max length + lookahead, with an even frame count.
    margin = (sw.lookahead_frames + 8) * HOP
    pad = maxlen + margin
    pad += HOP - pad % HOP
    if (1 + pad // HOP) % 2:
        pad += HOP
    logp_off, out_lens = _offline(model, variables, frontend_fixed, audio,
                                  lengths, pad)

    emitted, total_valid = _run_stream(sw, audio, np.asarray(lengths),
                                       piece=piece)
    flens = 1 + np.asarray(lengths) // HOP
    np.testing.assert_array_equal(total_valid, flens // 2)
    np.testing.assert_array_equal(out_lens, flens // 2)
    for b in range(B):
        v = int(total_valid[b])
        np.testing.assert_allclose(emitted[b, :v], logp_off[b, :v],
                                   atol=5e-4, rtol=1e-4)


def test_stream_matches_offline_small(small):
    # Ends NOT frame-aligned, different per sample, odd/even flen mix.
    _parity_case(small, [1311, 707])


def test_stream_matches_offline_chunk_sizes(small):
    _parity_case(small, [1555, 640], chunk_frames=10, piece=503)


def test_stream_exact_chunk_boundary_end(small):
    """Ends at the extremes of the finish window: exactly on a chunk
    boundary (tail_len == 0) and one sample short of the next one."""
    _parity_case(small, [0, 2559], n_chunks=2)


def test_stream_flagship_structure():
    """Full 20-layer geometry (toy widths): the static plan must solve and
    match offline through the stride-2 entry and the dilated k=29 tail."""
    model, variables, frontend = _build(FLAGSHIP_STRUCTURE, num_labels=7,
                                        seed=3)
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    frontend_fixed = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS,
                                         dither=0.0, norm_stats=stats)
    sw = StreamingWav2Letter(FLAGSHIP_STRUCTURE, 7, variables,
                             frontend_fixed, chunk_frames=64,
                             norm='precomputed', norm_stats=stats)
    assert sw.lookahead_frames > 300  # the architecture's inherent lag

    rng = np.random.default_rng(7)
    length = sw.prime_samples + sw.chunk_samples + 4321
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    margin = (sw.lookahead_frames + 8) * HOP
    pad = length + margin
    pad += HOP - pad % HOP
    if (1 + pad // HOP) % 2:
        pad += HOP
    logp_off, out_lens = _offline(model, variables, frontend_fixed, audio,
                                  [length], pad)
    emitted, total_valid = _run_stream(sw, audio, np.array([length]))
    v = int(total_valid[0])
    assert v == int(out_lens[0]) == (1 + length // HOP) // 2
    np.testing.assert_allclose(emitted[0, :v], logp_off[0, :v],
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize('variant', ['zeros', 'mfcc', 'wide_hop', 'fft',
                                     '8khz'])
def test_stream_parity_config_variants(variant):
    """Non-default configs must stream exactly too: padding_mode='zeros',
    MFCC features (n_mfcc != n_mels), a hop where the frontend boundary
    lag is 1 instead of 2 (window_stride=0.02 -> hop 320), a frontend
    built with stft_method='fft' (no precomputed DFT basis), and the 8 kHz
    audio group (n_fft 256 / hop 80)."""
    import jax

    if variant == 'wide_hop':
        ac = AudioConfig(window_stride=0.02)
    elif variant == '8khz':
        ac = AudioConfig(sample_rate=8000)
    else:
        ac = AudioConfig()
    hop = ac.hop_samples
    fe_kw = dict(n_mels=N_MELS, dither=0.0)
    n_feat = N_MELS
    pad_mode = 'reflect'
    tol = 5e-4
    if variant == 'mfcc':
        fe_kw.update(feature_type='mfcc', n_mfcc=6)
        n_feat = 6
    elif variant == 'fft':
        fe_kw.update(stft_method='fft')
        tol = 5e-3  # jnp.fft vs DFT-basis matmul numerics
    elif variant == 'zeros':
        pad_mode = 'zeros'
    stats = (np.zeros(n_feat, np.float32), np.ones(n_feat, np.float32))
    fe = SpectrogramFrontend(ac, norm_stats=stats, **fe_kw)

    model = Wav2Letter(layers=SMALL_LAYERS, num_labels=7,
                       mid_layers=len(SMALL_LAYERS), padding_mode=pad_mode)
    t0 = 6400
    feats, flens = fe(np.zeros((1, t0), np.float32), np.array([t0]))
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(1), feats, flens, train=False))

    sw = StreamingWav2Letter(SMALL_LAYERS, 7, variables, fe,
                             chunk_frames=16, norm='precomputed',
                             norm_stats=stats, padding_mode=pad_mode)
    length = sw.prime_samples + 2 * sw.chunk_samples + 3 * hop + 17
    rng = np.random.default_rng(13)
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    pad = length + (sw.lookahead_frames + 8) * hop
    pad += hop - pad % hop
    if (1 + pad // hop) % 2:
        pad += hop
    buf = np.zeros((1, pad), np.float32)
    buf[:, :length] = audio
    feats, flens = fe(buf, np.array([length]))
    logp_off, out_lens = model.apply(variables, feats, flens, train=False)
    logp_off, out_lens = np.asarray(logp_off), np.asarray(out_lens)

    emitted, total_valid = _run_stream(sw, audio, np.array([length]))
    v = int(total_valid[0])
    assert v == int(out_lens[0]) == (1 + length // hop) // 2
    np.testing.assert_allclose(emitted[0, :v], logp_off[0, :v],
                               atol=tol, rtol=tol)


def test_streaming_transcriber_matches_offline_greedy(small):
    model, variables, frontend = small
    labels = ['_', 'a', 'b', 'c', 'd', 'e', ' ']
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    frontend_fixed = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS,
                                         dither=0.0, norm_stats=stats)
    sw = StreamingWav2Letter(SMALL_LAYERS, len(labels), variables,
                             frontend_fixed, chunk_frames=16,
                             norm='precomputed', norm_stats=stats)
    rng = np.random.default_rng(5)
    base = sw.prime_samples + 2 * sw.chunk_samples
    lengths = [base + 2000, base + 900]
    audio = (rng.standard_normal((2, max(lengths))) * 0.3).astype(np.float32)
    audio[1, lengths[1]:] = 0.0

    margin = (sw.lookahead_frames + 8) * HOP
    pad = max(lengths) + margin
    pad += HOP - pad % HOP
    if (1 + pad // HOP) % 2:
        pad += HOP
    logp_off, out_lens = _offline(model, variables, frontend_fixed, audio,
                                  lengths, pad)
    offline_texts = GreedyDecoder(labels).decode(np.exp(logp_off),
                                                 sizes=out_lens)

    sess = sw.start(2)
    tr = StreamingTranscriber(sess, labels)
    for start in range(0, max(lengths), 1234):
        tr.feed(audio[:, start:start + 1234])
    final = tr.finish(np.asarray(lengths))
    assert final == offline_texts

    # Incremental word timings == offline decoder offsets path.
    from wav2letter_pytorch_tpu.decoding import get_time_per_word
    _, off_offsets = GreedyDecoder(labels).decode(np.exp(logp_off),
                                                  sizes=out_lens,
                                                  return_offsets=True)
    for b in range(2):
        offline_times = get_time_per_word(list(offline_texts[b]),
                                          list(off_offsets[b]), ratio=0.02)
        assert tr.word_timings(0.02)[b] == offline_times


def test_cumulative_norm_converges(small):
    """Running-stat normalization drifts from the offline per-utterance
    stats early and converges late (stationary input)."""
    model, variables, frontend = small
    sw = StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend,
                             chunk_frames=16, norm='cumulative')
    rng = np.random.default_rng(11)
    length = sw.prime_samples + 6 * sw.chunk_samples
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    margin = (sw.lookahead_frames + 8) * HOP
    pad = length + margin
    pad += HOP - pad % HOP
    if (1 + pad // HOP) % 2:
        pad += HOP
    logp_off, _ = _offline(model, variables, frontend, audio, [length], pad)
    emitted, total_valid = _run_stream(sw, audio, np.array([length]))
    v = int(total_valid[0])
    k = sw.chunk_out
    early = np.mean(np.abs(emitted[0, :k] - logp_off[0, :k]))
    late = np.mean(np.abs(emitted[0, v - k:v] - logp_off[0, v - k:v]))
    assert late < early
    assert late < 0.15


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_stream_plan_fuzz(seed):
    """Random layer geometries (kernels/strides/dilations, reflect or
    zeros padding) must plan and stream exactly — structural fuzz over the
    carry arithmetic."""
    import jax

    rng = np.random.default_rng(100 + seed)
    n_layers = int(rng.integers(2, 5))
    layers, scale = [], 1
    for li in range(n_layers):
        s = int(rng.choice([1, 1, 2])) if li == 0 else 1
        layers.append({'output_size': 8,
                       'kernel_size': int(rng.integers(2, 14)),
                       'stride': s,
                       'dilation': int(rng.choice([1, 1, 2, 3]))})
        scale *= s
    pad_mode = str(rng.choice(['reflect', 'zeros']))
    chunk = 8 * scale

    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    model = Wav2Letter(layers=layers, num_labels=7, mid_layers=n_layers,
                       padding_mode=pad_mode)
    feats, flens = fe(np.zeros((1, 6400), np.float32), np.array([6400]))
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(seed), feats, flens, train=False))
    sw = StreamingWav2Letter(layers, 7, variables, fe, chunk_frames=chunk,
                             norm='precomputed', norm_stats=stats,
                             padding_mode=pad_mode)
    length = sw.prime_samples + 2 * sw.chunk_samples \
        + int(rng.integers(0, sw.chunk_samples))
    audio = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    pad = length + (sw.lookahead_frames + 8) * HOP
    pad += HOP - pad % HOP
    while (1 + pad // HOP) % scale:
        pad += HOP
    buf = np.zeros((1, pad), np.float32)
    buf[:, :length] = audio
    feats, flens = fe(buf, np.array([length]))
    logp_off, out_lens = model.apply(variables, feats, flens, train=False)
    emitted, total_valid = _run_stream(sw, audio, np.array([length]))
    v = int(total_valid[0])
    assert v == int(out_lens[0])
    np.testing.assert_allclose(emitted[0, :v], np.asarray(logp_off)[0, :v],
                               atol=1e-3, rtol=1e-3)


def test_long_stream_state_stays_bounded(small):
    """40 steady chunks: carries keep constant shapes, outputs stay finite,
    and the tail still matches offline (no cross-chunk state drift)."""
    _parity_case(small, [1000, 321], n_chunks=40, piece=7919)


def test_streaming_errors(small):
    model, variables, frontend = small
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    with pytest.raises(ValueError, match='divisible'):
        StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend,
                            chunk_frames=15)
    with pytest.raises(ValueError, match='norm_stats'):
        StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend,
                            chunk_frames=16, norm='precomputed')
    sw = StreamingWav2Letter(SMALL_LAYERS, 7, variables, frontend,
                             chunk_frames=16)
    sess = sw.start(1)
    sess.feed(np.zeros((1, 100), np.float32))
    with pytest.raises(ValueError, match='prime window'):
        sess.finish()
