"""Contextual biasing (hotwords) in the prefix beam search.

Trie-based partial-credit shallow fusion (FlexCTC-style,
arXiv:2508.07315): every character extending a prefix of a hotword
multiplies the path mass, credit cancels on divergence or non-hotword
completion. Off by default — reference parity untouched
(/root/reference/decoder.py:147-233 has no biasing at all).
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.decoding import (HotwordTrie,
                                             IncrementalPrefixBeam,
                                             PrefixBeamSearchLMDecoder,
                                             prefix_beam_search)

LABELS = ['_', 'a', 'b', 'c', 'd', 'p', 't', 'u', ' ']
IX = {c: i for i, c in enumerate(LABELS)}


def _emit(chars, strong=0.6, rest_on=None):
    """[T, L] probs emitting ``chars`` with mass ``strong`` each step;
    ``rest_on[t]`` (a char) gets most of the remainder at step t."""
    T = len(chars)
    probs = np.full((T, len(LABELS)), (1 - strong) / (len(LABELS) - 1))
    for t, c in enumerate(chars):
        probs[t] = (1 - strong) / (len(LABELS) - 1)
        probs[t, IX[c]] = strong
        if rest_on and rest_on[t]:
            probs[t, IX[rest_on[t]]] = 1 - strong - 0.05
            mask = np.ones(len(LABELS), bool)
            mask[[IX[c], IX[rest_on[t]]]] = False
            probs[t, mask] = 0.05 / mask.sum()
    return probs


def test_trie_units_and_weights():
    trie = HotwordTrie(['cat', 'cab', 'up down'], weight=2.0)
    assert trie.words == {'cat', 'cab', 'up', 'down'}
    assert trie.units('c') == 1 and trie.units('ca') == 2
    assert trie.units('cat') == 3 and trie.units('cx') == 0
    assert trie.extend('ca', 't') == 2.0          # +1 matched char
    assert trie.extend('ca', 'x') == 0.25         # diverged: cancel 2 units
    assert trie.extend('xy', 'z') == 1.0          # never matched
    assert trie.complete('cat') == 1.0            # full hotword: keep
    assert trie.complete('ca') == 0.25            # partial only: cancel
    assert trie.complete('xyz') == 1.0
    with pytest.raises(ValueError):
        HotwordTrie([])
    with pytest.raises(ValueError):
        HotwordTrie(['a'], weight=0)


def test_hotword_flips_ambiguous_decode():
    # 'put' slightly stronger than 'but' at the first step
    probs = _emit('put ', strong=0.5, rest_on=['b', None, None, None])
    base = prefix_beam_search(probs, LABELS, k=8)
    assert base.strip() == 'put'
    biased = prefix_beam_search(probs, LABELS, k=8, hotwords=['but'],
                                hotword_weight=3.0)
    assert biased.strip() == 'but'
    # biasing toward the already-winning word changes nothing
    assert prefix_beam_search(probs, LABELS, k=8,
                              hotwords=['put']).strip() == 'put'


def test_hotword_partial_credit_survives_narrow_beam():
    """With k=1, a weak first character kills the hotword before its end
    unless partial credit keeps it on the beam."""
    probs = _emit('cab ', strong=0.5, rest_on=['d', None, None, None])
    assert prefix_beam_search(probs, LABELS, k=1).strip() != 'cab'
    biased = prefix_beam_search(probs, LABELS, k=1, hotwords=['cab'],
                                hotword_weight=3.0)
    assert biased.strip() == 'cab'


def test_hotword_credit_cancels_on_divergence():
    """A word that starts like a hotword but diverges or completes as a
    non-hotword must end with ZERO net credit: the winning prefix's score
    is bit-identical to the unbiased search's (every path's per-char
    multipliers telescope to 1 through divergence/completion)."""
    probs = _emit('cad ', strong=0.7)
    base, s0 = prefix_beam_search(probs, LABELS, k=16, return_weights=True)
    biased, s1 = prefix_beam_search(probs, LABELS, k=16, hotwords=['cab'],
                                    hotword_weight=1.5,
                                    return_weights=True)
    assert biased == base and base.strip() == 'cad'
    # credit fully cancelled, not merely outvoted (float rounding only)
    assert abs(s1 - s0) < 1e-12 * s0


def test_strong_weight_can_hallucinate_documented():
    """The flip side of keeping credit on full matches: an aggressive
    weight CAN override clear acoustics — weight choice is the contract
    (3 matched chars at weight 4 = 64x vs the 16x acoustic margin)."""
    probs = _emit('cad ', strong=0.7)
    out = prefix_beam_search(probs, LABELS, k=16, hotwords=['cab'],
                             hotword_weight=4.0)
    assert out.strip() == 'cab'


def test_incremental_matches_one_shot_with_hotwords():
    rng = np.random.default_rng(11)
    probs = rng.dirichlet(np.ones(len(LABELS)) * 0.4, size=40)
    one = prefix_beam_search(probs, LABELS, k=6, hotwords=['cab', 'put'],
                             hotword_weight=2.5)
    inc = IncrementalPrefixBeam(LABELS, k=6, hotwords=['cab', 'put'],
                                hotword_weight=2.5)
    for chunk in np.split(probs, [7, 19, 33]):
        if len(chunk):
            inc.step(chunk)
    assert inc.result() == one


@pytest.mark.parametrize('backend', ['python', 'native'])
def test_decoder_level_hotwords(backend):
    from wav2letter_pytorch_tpu.decoding.beam_native import native_available
    if backend == 'native' and not native_available():
        pytest.skip('native library not built')
    probs = _emit('put ', strong=0.5, rest_on=['b', None, None, None])
    dec = PrefixBeamSearchLMDecoder('', LABELS, k=8, hotwords=['but'],
                                    hotword_weight=3.0, backend=backend)
    assert dec.decode(probs).strip() == 'but'


def test_native_hotword_parity_random():
    """C++ biased search == Python biased search, string- and score-exact
    across random inputs and weights."""
    from wav2letter_pytorch_tpu.decoding.beam_native import (
        native_available, prefix_beam_search_native)
    if not native_available():
        pytest.skip('native library not built')
    rng = np.random.default_rng(23)
    for trial in range(20):
        probs = rng.dirichlet(np.ones(len(LABELS)) * 0.4,
                              size=rng.integers(8, 60)).astype(np.float32)
        hw = list(rng.choice(['but', 'cab', 'dab', 'up', 'a'],
                             size=rng.integers(1, 3), replace=False))
        w = float(rng.uniform(1.2, 4.0))
        k = int(rng.integers(2, 8))
        py, s_py = prefix_beam_search(probs, LABELS, k=k, hotwords=hw,
                                      hotword_weight=w, return_weights=True)
        nat, s_nat = prefix_beam_search_native(
            probs, LABELS, k=k, hotwords=hw, hotword_weight=w,
            return_weights=True)
        assert nat == py, (trial, hw, w, k)
        assert abs(s_nat - s_py) < 1e-9 * max(s_py, 1e-30), (trial, hw, w)


def test_return_nbest():
    """n-best surface: ranked (hypothesis, score) pairs, head == 1-best."""
    rng = np.random.default_rng(31)
    probs = rng.dirichlet(np.ones(len(LABELS)) * 0.5, size=30)
    best, s_best = prefix_beam_search(probs, LABELS, k=6,
                                      return_weights=True)
    nbest = prefix_beam_search(probs, LABELS, k=6, return_nbest=4)
    assert len(nbest) == 4
    assert nbest[0][0] == best and abs(nbest[0][1] - s_best) < 1e-12
    assert len({h for h, _ in nbest}) == 4       # distinct hypotheses
    ranks = [s for _, s in nbest]
    assert ranks == sorted(ranks, reverse=True)  # rank-ordered
