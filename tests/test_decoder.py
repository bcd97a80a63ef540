"""Decoder tests.

Replicates the reference's six decoder tests
(/root/reference/unit_tests/decoder_test.py:14-81) — they are
framework-agnostic (numpy probabilities in, strings out) — plus extra
coverage for metrics, offsets, and word timings that the reference lacks.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.label_sets import english_labels
from wav2letter_pytorch_tpu.decoding import (GreedyDecoder,
                                             PrefixBeamSearchLMDecoder,
                                             get_time_per_word,
                                             prefix_beam_search)


def _asr_sample():
    sample = np.zeros((10, len(english_labels)))
    sample[0, 2] = 0.5   # 'A'
    sample[1, 20] = 0.5  # 'S'
    sample[2, 19] = 0.5  # 'R'
    sample[3:, 0] = 0.5  # blank
    return sample


def test_sanity():
    assert prefix_beam_search(_asr_sample(), english_labels) == 'ASR'


def test_inconsistent_sizes():
    sample = np.zeros((10, len(english_labels) - 1))
    with pytest.raises(AssertionError):
        prefix_beam_search(sample, english_labels)


def test_beam_is_not_greedy():
    # Canonical 2-step example where beam search recovers 'A' (p=0.52) but
    # greedy argmax yields the empty string.
    labels = ['_', 'A', 'B', ' ']
    samples = np.array([[0.8, 0.2, 0, 0], [0.6, 0.4, 0, 0]])
    res = prefix_beam_search(samples, labels, blank_index=0, return_weights=True)
    assert res[0] == 'A'
    assert res[1] == pytest.approx(0.52)

    greedy = GreedyDecoder(labels, blank_index=0)
    assert greedy.decode(samples[None]) == ['']


def test_beam_width_changes():
    def the_lm(s):
        return 0.5 if s == 'A' else 1

    labels = ['_', 'A', ' ']
    samples = np.array([[0.8, 0.2, 0],
                        [0.7, 0.3, 0],
                        [0.6, 0.4, 0],
                        [0.0, 0.0, 1]])
    wide = prefix_beam_search(samples, labels, lm=the_lm, k=25, alpha=1, beta=0)
    narrow = prefix_beam_search(samples, labels, lm=the_lm, k=1, alpha=1, beta=0)
    assert wide == ' '
    assert narrow == 'A '


def test_class_wrapper():
    decoder = PrefixBeamSearchLMDecoder('', english_labels)
    assert decoder.decode(_asr_sample()) == 'ASR'


def test_pbs_batch_dimensions():
    decoder = PrefixBeamSearchLMDecoder('', english_labels)
    assert decoder.decode(_asr_sample()[None]) == ['ASR']


# --- additional coverage beyond the reference suite ---------------------

def test_greedy_collapse_and_offsets():
    labels = ['_', 'a', 'b', ' ']
    decoder = GreedyDecoder(labels)
    # a a _ a b b -> 'aab' with offsets at first occurrence of each emission
    ids_probs = np.zeros((6, 4))
    for t, i in enumerate([1, 1, 0, 1, 2, 2]):
        ids_probs[t, i] = 1.0
    strings, offsets = decoder.decode(ids_probs[None], return_offsets=True)
    assert strings == ['aab']
    assert offsets[0].tolist() == [0, 3, 4]


def test_greedy_sizes_truncate():
    labels = ['_', 'a', 'b', ' ']
    decoder = GreedyDecoder(labels)
    probs = np.zeros((2, 4, 4))
    probs[0, :, 1] = 1.0       # 'a' x4 -> 'a'
    probs[1, :, 3] = 1.0       # spaces
    out = decoder.decode(probs, sizes=[4, 1])
    assert out == ['a', ' ']


def test_greedy_accepts_string_label_name():
    # Passing a label-set name must resolve to the real list (the reference
    # had a latent bug here, decoder.py:23-24).
    decoder = GreedyDecoder('english')
    probs = np.zeros((3, len(english_labels)))
    probs[0, 2] = 1.0
    probs[1:, 0] = 1.0
    assert decoder.decode(probs) == ['A']


def test_wer_cer_metrics():
    decoder = GreedyDecoder(english_labels)
    assert decoder.wer('THE CAT SAT', 'THE CAT SAT') == 0
    assert decoder.wer('THE CAT SAT', 'THE BAT SAT') == 1
    assert decoder.cer('ABC', 'ABD') == 1
    assert decoder.cer('A B C', 'ABC') == 0  # spaces ignored
    dist, denom = decoder.wer_ratio('THE CAT', 'THE BAT')
    assert (dist, denom) == (1, 2)
    dist, denom = decoder.cer_ratio('THE CAT', 'THE CAT')
    assert (dist, denom) == (0, 6)


def test_get_time_per_word():
    chars = list('ab a')
    offsets = [2, 3, 5, 8]
    words = get_time_per_word(chars, offsets, ratio=0.5)
    assert words == [('ab', 1.0, 1.5), ('a', 4.0, 4.0)]


def test_beam_search_end_char_terminates():
    labels = ['_', 'a', '>', ' ']
    probs = np.zeros((4, 4))
    probs[0, 1] = 0.9
    probs[1, 2] = 0.9   # end char
    probs[2, 1] = 0.9   # should NOT extend past '>'
    probs[3, 0] = 0.9
    res = prefix_beam_search(probs, labels, k=3)
    assert res.endswith('>')


# --- beam-search offsets (forced-alignment based; the reference raises) --

def test_beam_offsets_deterministic():
    """Beam decode with return_offsets: offsets must point at the frames
    that emit each character (same convention as greedy's first-emission
    offsets on an unambiguous input)."""
    labels = ['_', 'a', 'b', ' ']
    dec = PrefixBeamSearchLMDecoder('', labels, k=4, beta=0, prune=1e-3,
                                    backend='python')
    probs = np.full((6, 4), 1e-4)
    for t, i in enumerate([1, 1, 0, 1, 2, 2]):   # a a _ a b b -> 'aab'
        probs[t, i] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    text, offsets = dec.decode(probs, return_offsets=True)
    assert text == 'aab'
    greedy_text, greedy_off = GreedyDecoder(labels).decode(
        probs[None], return_offsets=True)
    assert greedy_text == ['aab']
    assert offsets.tolist() == greedy_off[0].tolist() == [0, 3, 4]
    # word timings flow through the same reference surface
    from wav2letter_pytorch_tpu.decoding import get_time_per_word
    times = get_time_per_word(list(text), offsets.tolist(), ratio=0.02)
    assert times == [('aab', 0.0, 0.08)]


def test_beam_offsets_batched_with_sizes():
    labels = ['_', 'a', 'b', ' ']
    dec = PrefixBeamSearchLMDecoder('', labels, k=4, beta=0, prune=1e-3,
                                    backend='python')
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((2, 10, 4)) * 3.0
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    sizes = np.array([10, 6])
    texts, offs = dec.decode(probs, sizes, return_offsets=True)
    assert len(texts) == len(offs) == 2
    for b in range(2):
        assert texts[b] == dec.decode(probs[b, :sizes[b]])
        assert len(offs[b]) == len(texts[b])
        if len(offs[b]):
            assert (np.diff(offs[b]) >= 0).all()
            assert offs[b].max() < sizes[b]


def test_device_beam_offsets_match_host():
    from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
    labels = ['_', 'a', 'b', ' ']
    rng = np.random.default_rng(13)
    logits = rng.standard_normal((2, 12, 4)) * 3.0
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    host = PrefixBeamSearchLMDecoder('', labels, k=5, beta=0, prune=1e-3,
                                     backend='python')
    dev = DeviceBeamDecoder(labels, k=5, beta=0.0, prune=1e-3)
    h_texts, h_offs = host.decode(probs, return_offsets=True)
    d_texts, d_offs = dev.decode(probs, return_offsets=True)
    assert d_texts == h_texts
    for b in range(2):
        assert d_offs[b].tolist() == h_offs[b].tolist()
