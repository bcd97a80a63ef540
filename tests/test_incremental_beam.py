"""Incremental prefix beam search: chunked DP == one-shot DP, and the
streaming beam transcriber matches offline beam decoding."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.decoding import (IncrementalPrefixBeam,
                                             prefix_beam_search)

LABELS = ['_', 'a', 'b', 'c', ' ']


def _random_probs(T, L, seed):
    rng = np.random.default_rng(seed)
    p = rng.dirichlet(np.full(L, 0.6), size=T)
    return p.astype(np.float64)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('params', [
    dict(k=5, alpha=0.3, beta=5, prune=0.001),
    dict(k=2, alpha=0.8, beta=0.5, prune=0.05),
    dict(k=8, alpha=0.0, beta=2, prune=0.0005),
])
def test_incremental_equals_oneshot(seed, params):
    probs = _random_probs(40, len(LABELS), seed)
    one = prefix_beam_search(probs, LABELS, return_weights=True, **params)
    inc = IncrementalPrefixBeam(LABELS, **params)
    cuts = [0, 3, 10, 11, 25, 40]
    for a, b in zip(cuts[:-1], cuts[1:]):
        inc.step(probs[a:b])
    assert inc.result(return_weights=True) == one


def test_incremental_with_lm():
    probs = _random_probs(30, len(LABELS), 7)
    lm = lambda s: 10.0 if s.endswith('ab') else 1.0
    one = prefix_beam_search(probs, LABELS, lm=lm, k=4, alpha=0.7, beta=2,
                             prune=0.01)
    inc = IncrementalPrefixBeam(LABELS, lm=lm, k=4, alpha=0.7, beta=2,
                                prune=0.01)
    for t in range(probs.shape[0]):   # one frame at a time — worst case
        inc.step(probs[t:t + 1])
    assert inc.result() == one


def test_streaming_beam_transcriber_matches_offline_beam():
    """End to end: streaming session + incremental beam == offline
    prefix_beam_search on the offline log-probs (exact-parity mode)."""
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.serving import (StreamingBeamTranscriber,
                                                StreamingWav2Letter)
    from tests.test_streaming import N_MELS, SMALL_LAYERS, _build

    model, variables, frontend = _build(SMALL_LAYERS)
    labels = ['_', 'a', 'b', 'c', 'd', 'e', ' ']
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    sw = StreamingWav2Letter(SMALL_LAYERS, len(labels), variables, fe,
                             chunk_frames=16, norm='precomputed',
                             norm_stats=stats)
    lengths = [sw.prime_samples + 2 * sw.chunk_samples + 901,
               sw.prime_samples + 2 * sw.chunk_samples + 333]
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((2, max(lengths))) * 0.3).astype(np.float32)
    audio[1, lengths[1]:] = 0.0

    # Reference: one-shot beam over the streamed log-probs themselves
    # (logp-vs-offline parity is covered by test_streaming.py; near-tie
    # probabilities on a random-weight model make cross-path beam output
    # chaotic at 5e-4 logp differences).
    from tests.test_streaming import _run_stream
    params = dict(k=4, alpha=0.3, beta=2, prune=0.002)
    emitted, total_valid = _run_stream(sw, audio, np.asarray(lengths))
    oneshot = [prefix_beam_search(np.exp(emitted[b, :int(total_valid[b])]),
                                  labels, **params) for b in range(2)]

    sess = sw.start(2)
    tr = StreamingBeamTranscriber(sess, labels, **params)
    for s in range(0, max(lengths), 2048):
        tr.feed(audio[:, s:s + 2048])
    final = tr.finish(np.asarray(lengths))
    assert final == oneshot


def test_streaming_beam_transcriber_hotwords():
    """Hotword biasing rides the streaming transcriber: chunked biased
    decode == one-shot biased beam over the same streamed probabilities."""
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.serving import (StreamingBeamTranscriber,
                                                StreamingWav2Letter)
    from tests.test_streaming import (N_MELS, SMALL_LAYERS, _build,
                                      _run_stream)

    model, variables, frontend = _build(SMALL_LAYERS)
    labels = ['_', 'a', 'b', 'c', 'd', 'e', ' ']
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    sw = StreamingWav2Letter(SMALL_LAYERS, len(labels), variables, fe,
                             chunk_frames=16, norm='precomputed',
                             norm_stats=stats)
    L = sw.prime_samples + 2 * sw.chunk_samples + 901
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)

    params = dict(k=4, alpha=0.0, beta=0, prune=0.002)
    hw = dict(hotwords=['bad', 'ace'], hotword_weight=2.5)
    emitted, total_valid = _run_stream(sw, audio, np.asarray([L]))
    oneshot = prefix_beam_search(np.exp(emitted[0, :int(total_valid[0])]),
                                 labels, **params, **hw)

    sess = sw.start(1)
    tr = StreamingBeamTranscriber(sess, labels, **params, **hw)
    for s in range(0, L, 2048):
        tr.feed(audio[:, s:s + 2048])
    final = tr.finish(np.asarray([L]))
    assert final == [oneshot]


def test_hour_scale_stream_does_not_underflow():
    """The raw-probability DP is exactly 0.0 after ~6k frames without the
    ranking-preserving renormalization; a long stream must keep decoding
    the same text a per-segment search produces."""
    rng = np.random.default_rng(3)
    pattern = 'ab cab ba '
    frames = []
    ix = {ch: i for i, ch in enumerate(LABELS)}
    for _ in range(300):                        # 300 x 20 = 6000 frames
        for ch in pattern:
            row = np.full(len(LABELS), 0.01)
            row[ix[ch]] = 0.9
            frames.append(row)
            blank = np.full(len(LABELS), 0.01)
            blank[0] = 0.9
            frames.append(blank)
    probs = np.stack(frames)
    probs /= probs.sum(-1, keepdims=True)
    inc = IncrementalPrefixBeam(LABELS, k=4, alpha=0.0, beta=0.0,
                                prune=0.001)
    for lo in range(0, len(probs), 200):        # 640 ms-ish chunks
        inc.step(probs[lo:lo + 200])
    out = inc.result()
    assert out.split() == ('ab cab ba ' * 300).split()
    assert inc.renorm_log10 < -50                # it really renormalized
    # The carried masses stayed in float range.
    top = inc._p_b[out] + inc._p_nb[out]
    assert top > 0.0
