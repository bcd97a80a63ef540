"""Native C++ ARPA LM scorer: hand-computed backoff math + beam fusion."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.decoding import PrefixBeamSearchLMDecoder
from wav2letter_pytorch_tpu.decoding.arpa_lm import ArpaLM

TINY_ARPA = """\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-1.0\t<s>\t-0.5
-1.3\t</s>
-0.7\tthe\t-0.3
-1.0\tcat\t-0.4
-1.2\t<unk>

\\2-grams:
-0.3\t<s> the
-0.5\tthe cat
-0.9\tcat </s>
-1.1\tthe </s>

\\end\\
"""


@pytest.fixture(scope='module')
def lm_path(tmp_path_factory):
    path = tmp_path_factory.mktemp('lm') / 'tiny.arpa'
    path.write_text(TINY_ARPA)
    return str(path)


def test_order_and_load(lm_path):
    lm = ArpaLM(lm_path)
    assert lm.order == 2


def test_exact_bigram_scores(lm_path):
    lm = ArpaLM(lm_path)
    # All bigrams exist: P(the|<s>) + P(cat|the) + P(</s>|cat)
    assert lm.score('the cat') == pytest.approx(-0.3 - 0.5 - 0.9)


def test_backoff_scores(lm_path):
    lm = ArpaLM(lm_path)
    # P(cat|<s>) backs off: bo(<s>) + P(cat) = -0.5 + -1.0 = -1.5
    # P(the|cat) backs off: bo(cat) + P(the) = -0.4 + -0.7 = -1.1
    # P(</s>|the) = -1.1 (bigram exists)
    assert lm.score('cat the') == pytest.approx(-1.5 - 1.1 - 1.1)


def test_unknown_word_maps_to_unk(lm_path):
    lm = ArpaLM(lm_path)
    # dog -> <unk>: P(<unk>|<s>) = bo(<s>) + P(<unk>) = -0.5 - 1.2 = -1.7
    # P(</s>|<unk>) = bo(<unk>)=0 + P(</s>) = -1.3
    assert lm.score('dog') == pytest.approx(-1.7 - 1.3)
    assert lm.score('dog') == lm.score('zebra')  # all OOVs identical


def test_bos_eos_flags(lm_path):
    lm = ArpaLM(lm_path)
    # No eos: drop the </s> term. No bos: 'the' scored without <s> context.
    assert lm.score('the cat', eos=False) == pytest.approx(-0.3 - 0.5)
    assert lm.score('the cat', bos=False, eos=False) == \
        pytest.approx(-0.7 - 0.5)


def test_beam_decoder_with_native_lm(lm_path):
    """PrefixBeamSearchLMDecoder end-to-end with the native ARPA scorer."""
    labels = ['_', 't', 'h', 'e', 'c', 'a', ' ']
    decoder = PrefixBeamSearchLMDecoder(lm_path, labels, k=8, alpha=0.5,
                                        beta=1)
    # emissions spelling 'the' then space
    T = 8
    probs = np.full((T, len(labels)), 0.01)
    for t, c in enumerate('the '):
        probs[t, labels.index(c)] = 0.9
    probs[4:, 0] = 0.9
    out = decoder.decode(probs)
    assert out.startswith('the')


def test_missing_file_raises(tmp_path):
    with pytest.raises(ValueError):
        ArpaLM(str(tmp_path / 'nope.arpa'))


def test_kenlm_seam_preferred_when_installed(tmp_path, monkeypatch):
    """load_lm must prefer kenlm when importable (the reference's actual LM
    backend, decoder.py:249-251) and the decoder must wrap it as 10**score.
    kenlm isn't installed here, so inject a stub module through the same
    import seam."""
    import sys
    import types

    calls = []

    class FakeModel:
        def __init__(self, path):
            calls.append(('load', path))

        def score(self, sentence, bos=True, eos=True):
            calls.append(('score', sentence))
            return -2.0  # log10 prob

    fake = types.ModuleType('kenlm')
    fake.Model = FakeModel
    monkeypatch.setitem(sys.modules, 'kenlm', fake)

    from wav2letter_pytorch_tpu.decoding.arpa_lm import load_lm
    lm = load_lm('/some/lm.arpa')
    assert isinstance(lm, FakeModel) and calls[0] == ('load', '/some/lm.arpa')

    from wav2letter_pytorch_tpu.decoding.decoder import \
        PrefixBeamSearchLMDecoder
    dec = PrefixBeamSearchLMDecoder('/some/lm.arpa', list('_ab '),
                                    backend='python')
    assert dec.lm_weigh('ab') == pytest.approx(10 ** -2.0)
    assert ('score', 'ab') in calls
