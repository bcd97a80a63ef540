"""Live CTC endpointing (serving/endpoint.py).

Three layers of contract:
1. State-machine exactness on crafted emissions (fake session): endpoint
   placement, segment texts/frames, silence never produces segments, gaps
   shorter than the trailing run never split.
2. Greedy concatenation parity on a REAL random streaming model: finalized
   segments + live partial concatenate character-exact to un-segmented
   streaming greedy decode, for any blank_threshold >= 0.5 (the documented
   invariant — silence frames are argmax-blank, where greedy collapse emits
   nothing and parks its carry).
3. Beam mode: per-segment prefix-beam finals agree with offline
   prefix_beam_search run on exactly the segment's frames.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.models.wav2letter import Wav2Letter
from wav2letter_pytorch_tpu.serving import (SegmentingTranscriber,
                                            StreamingTranscriber,
                                            StreamingWav2Letter)

LABELS = ['_', 'a', 'b', 'c', ' ']


class _FakeModel:
    emits_probs = True


class _FakeSession:
    """Replays crafted probability chunks through the transcriber API."""

    def __init__(self, chunks, valid=None):
        self.m = _FakeModel()
        self.B = chunks[0].shape[0]
        self._chunks = list(chunks)
        self._valid = valid

    def feed(self, _audio=None):
        return self._chunks.pop(0)

    def finish(self, lengths=None):
        out = (self._chunks.pop(0) if self._chunks
               else np.zeros((self.B, 0, len(LABELS)), np.float32))
        valid = (np.full((self.B,), out.shape[1], np.int32)
                 if self._valid is None else self._valid)
        return out, valid


def _frames(spec):
    """'a' -> frame with p(a)=0.9 spread rest; '.' -> confident blank."""
    out = []
    for ch in spec:
        row = np.full(len(LABELS), 0.01, np.float32)
        ix = 0 if ch == '.' else LABELS.index(ch)
        row[ix] = 0.0
        row[ix] = 1.0 - row.sum()
        out.append(row)
    return np.stack(out)[None]  # [1, T, L]


def _seg(session, **kw):
    kw.setdefault('blank_threshold', 0.9)
    kw.setdefault('trailing_blank_frames', 3)
    return SegmentingTranscriber(session, LABELS, **kw)


def test_two_utterances_split_and_timed():
    # 'ab' ... long silence ... 'c a', then trailing silence at finish.
    chunks = [_frames('.ab.'), _frames('..c a'), _frames('...')]
    st = _seg(_FakeSession(chunks))
    new1 = st.feed(None)
    assert new1 == [[]]               # only 1 trailing blank so far
    assert st.partial == ['ab']
    new2 = st.feed(None)
    assert len(new2[0]) == 1
    seg = new2[0][0]
    assert seg.text == 'ab'
    # chars at global frames 1 and 2; end exclusive.
    assert (seg.start_frame, seg.end_frame) == (1, 3)
    assert st.partial == ['c a']
    new3 = st.finish()
    assert [s.text for s in new3[0]] == ['c a']
    assert st.segments[0][1].start_frame == 6
    assert st.partial == ['']
    # timings scale frames by frame_seconds
    (t1, a1, b1), (t2, a2, b2) = st.timings(0.5)[0]
    assert (t1, a1, b1) == ('ab', 0.5, 1.5)
    assert t2 == 'c a'


def test_pure_silence_yields_no_segments():
    st = _seg(_FakeSession([_frames('......')]))
    assert st.feed(None) == [[]]
    assert st.finish() == [[]]
    assert st.segments == [[]]


def test_short_gap_does_not_split():
    # gap of 2 confident blanks < trailing_blank_frames=3 -> one segment.
    st = _seg(_FakeSession([_frames('a..b')]))
    st.feed(None)
    new = st.finish()
    assert [s.text for s in new[0]] == ['ab']


def test_low_confidence_blank_is_not_silence():
    # argmax blank but p(blank)=0.6 < threshold 0.9: run never accumulates.
    row = np.array([[0.6, 0.3, 0.05, 0.03, 0.02]], np.float32)
    quiet = np.repeat(row, 8, axis=0)[None]
    st = _seg(_FakeSession([_frames('ab'), quiet]))
    st.feed(None)
    assert st.feed(None) == [[]]      # no endpoint despite 8 blank frames
    assert [s.text for s in st.finish()[0]] == ['ab']


def test_validates_args():
    sess = _FakeSession([_frames('.')])
    with pytest.raises(ValueError):
        SegmentingTranscriber(sess, LABELS, blank_threshold=0.3)
    with pytest.raises(ValueError):
        SegmentingTranscriber(sess, LABELS, trailing_blank_frames=0)
    with pytest.raises(ValueError):
        SegmentingTranscriber(sess, LABELS, decoder='viterbi')
    with pytest.raises(ValueError):
        SegmentingTranscriber(sess, LABELS, max_segment_frames=0)


def test_feed_after_finish_raises():
    st = _seg(_FakeSession([_frames('.a.'), _frames('..')]))
    st.feed(None)
    st.finish()
    with pytest.raises(RuntimeError):
        st.feed(None)
    with pytest.raises(RuntimeError):
        st.finish()


def test_max_segment_frames_bounds_pause_free_audio():
    # 16 pause-free frames, cap at 6: state must split into multiple
    # segments whose concatenation equals the unsplit greedy decode.
    spec = 'abcabcabcabcabca'
    st = _seg(_FakeSession([_frames(spec)]), max_segment_frames=6)
    st.feed(None)
    new = st.finish()
    segs = st.segments[0]
    assert len(segs) >= 2, 'cap never split a pause-free stream'
    assert ''.join(s.text for s in segs) == spec  # collapse is identity here
    # Beam mode: buffered frames per segment stay <= cap.
    st2 = _seg(_FakeSession([_frames(spec)]), decoder='beam', k=4,
               max_segment_frames=6)
    st2.feed(None)
    st2.finish()
    assert len(st2.segments[0]) >= 2


def test_beam_empty_text_segment_is_dropped():
    # A segment whose only emission is a space beam-decodes (after strip)
    # to '' — it must not appear in segments, matching decode_segmented.
    st = _seg(_FakeSession([_frames('. ...a...')]), decoder='beam', k=4)
    st.feed(None)
    st.finish()
    texts = [s.text for s in st.segments[0]]
    assert '' not in texts
    assert 'a' in texts


def test_beam_segments_match_offline_beam_per_segment():
    from wav2letter_pytorch_tpu.decoding.decoder import prefix_beam_search
    chunks = [_frames('.aab..'), _frames('.b ca.'), _frames('..')]
    full = np.concatenate(chunks, axis=1)[0]
    st = _seg(_FakeSession([c.copy() for c in chunks]), decoder='beam', k=4)
    st.feed(None)
    st.feed(None)
    st.finish()
    segs = st.segments[0]
    assert len(segs) == 2
    # Greedy detector bounds each segment; offline beam over those frames
    # (extended through the trailing silence — pure-blank frames multiply
    # every prefix's p_b identically, so the argmax string is unchanged)
    # must equal the finalized beam text.
    for seg, (lo, hi) in zip(segs, [(1, 7), (7, 14)]):
        want = prefix_beam_search(full[lo:hi], LABELS, k=4).strip()
        assert seg.text == want


# --- real-model invariant -------------------------------------------------

SR = 16000
N_MELS = 8
SMALL_LAYERS = [
    {'output_size': 12, 'kernel_size': 7, 'stride': 2, 'dilation': 1},
    {'output_size': 12, 'kernel_size': 5, 'stride': 1, 'dilation': 1},
]


@pytest.fixture(scope='module')
def small_stream():
    import jax
    frontend = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                                   norm_stats=(np.zeros(N_MELS, np.float32),
                                               np.ones(N_MELS, np.float32)))
    model = Wav2Letter(layers=SMALL_LAYERS, num_labels=len(LABELS),
                       mid_layers=len(SMALL_LAYERS))
    feats, flens = frontend(np.zeros((1, 4000), np.float32),
                            np.array([4000]))
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), feats,
                                          flens, train=False))
    # Shape the head so emissions are INPUT-driven (a raw random init is
    # nearly input-independent — r3 advisor: a flat +8 blank bias saturated
    # p(blank)>=0.998 everywhere and the parity test went vacuous): the
    # blank logit becomes a pure constant (kernel zeroed, bias +2.0) while
    # non-blank kernels are amplified 16x, so noisy audio fires sporadic
    # characters and the silence stretch yields confident-blank runs —
    # realistic serving emissions through the real conv/streaming path.
    head = variables['params'][f'conv1d_{len(SMALL_LAYERS)}']['Conv_0']
    kernel = np.asarray(head['kernel']).copy()
    kernel[..., 0] = 0.0
    kernel[..., 1:] *= 16.0
    head['kernel'] = kernel
    head['bias'] = np.array([2.0] + [0.0] * (len(LABELS) - 1), np.float32)
    return StreamingWav2Letter(SMALL_LAYERS, len(LABELS), variables,
                               frontend, chunk_frames=16,
                               norm='precomputed',
                               norm_stats=(np.zeros(N_MELS, np.float32),
                                           np.ones(N_MELS, np.float32)))


def test_greedy_concat_parity_on_real_model(small_stream):
    sw = small_stream
    rng = np.random.default_rng(7)
    n = sw.prime_samples + 6 * sw.chunk_samples
    audio = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    audio[:, n // 3:n // 2] = 0.0     # a real silence stretch mid-stream

    ref = StreamingTranscriber(sw.start(2), LABELS)
    st = SegmentingTranscriber(sw.start(2), LABELS, blank_threshold=0.6,
                               trailing_blank_frames=2)
    for s in range(0, n, sw.chunk_samples):
        piece = audio[:, s:s + sw.chunk_samples]
        ref.feed(piece)
        st.feed(piece)
    want = ref.finish()
    st.finish()
    got = [''.join(seg.text for seg in st.segments[b]) + st.partial[b]
           for b in range(2)]
    assert got == want
    # The blank-biased head + silence stretch must actually exercise
    # endpointing, otherwise this parity test is vacuous.
    assert any(len(st.segments[b]) >= 1 for b in range(2)), \
        'no endpoint fired; test setup no longer exercises segmentation'
