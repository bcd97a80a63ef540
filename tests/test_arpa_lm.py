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


# ---------------------------------------------------------------------------
# kenlm-compat hardening: pruned backoffs, missing <unk>, out-of-order and
# CRLF/e-notation lines, higher order, and a native-vs-python fuzz
# cross-check (PyArpaLM is an independent oracle with the same contract).
# ---------------------------------------------------------------------------

from wav2letter_pytorch_tpu.decoding.arpa_lm import PyArpaLM

TRIGRAM_QUIRKS = (
    # out-of-order lines within sections, e-notation logp, CRLF endings,
    # pruned backoffs (kenlm writes no backoff for pruned contexts ->
    # weight 0), double-digit-safe headers.
    "\\data\\\r\n"
    "ngram 1=6\r\n"
    "ngram 2=4\r\n"
    "ngram 3=2\r\n"
    "\r\n"
    "\\1-grams:\r\n"
    "-1.0\tthe\t-0.3\r\n"
    "-8e-1\t<s>\t-0.5\r\n"
    "-1.3\t</s>\r\n"
    "-1.1\tcat\r\n"            # PRUNED backoff (no third column)
    "-1.4\tsat\t-0.2\r\n"
    "-1.9\t<unk>\r\n"
    "\r\n"
    "\\2-grams:\r\n"
    "-0.6\tthe cat\t-0.1\r\n"
    "-0.4\t<s> the\t-0.25\r\n"
    "-0.7\tcat sat\r\n"        # pruned backoff
    "-0.9\tsat </s>\r\n"
    "\r\n"
    "\\3-grams:\r\n"
    "-0.2\t<s> the cat\r\n"
    "-0.35\tthe cat sat\r\n"
    "\r\n"
    "\\end\\\r\n"
)

NO_UNK = """\\data\\
ngram 1=3

\\1-grams:
-0.5\t<s>\t-0.4
-0.9\t</s>
-0.6\tthe\t-0.2

\\end\\
"""


@pytest.fixture(scope='module')
def quirks_path(tmp_path_factory):
    path = tmp_path_factory.mktemp('lm2') / 'quirks.arpa'
    path.write_bytes(TRIGRAM_QUIRKS.encode())
    return str(path)


def test_trigram_quirks_hand_math(quirks_path):
    lm = ArpaLM(quirks_path)
    assert lm.order == 3
    # All grams exist: P(the|<s>) -0.4, P(cat|<s> the) -0.2,
    # P(sat|the cat) -0.35, P(</s>|cat sat): trigram missing ->
    # bo(cat sat)=0 (PRUNED) + P(</s>|sat) = -0.9.
    assert lm.score('the cat sat') == pytest.approx(-0.4 - 0.2 - 0.35 - 0.9)
    # P(sat|cat) exists -0.7; context 'the cat' has backoff -0.1:
    # P(the|<s>) -0.4, P(sat|<s> the): missing -> bo(<s> the) -0.25
    #   + P(sat|the): missing -> bo(the) -0.3 + P(sat) -1.4 = -1.95
    assert lm.score('the sat', eos=False) == pytest.approx(
        -0.4 + (-0.25 - 0.3 - 1.4))
    # Pruned-backoff context 'cat': P(the|cat) = bo(cat)=0 + P(the) = -1.0
    assert lm.score('cat the', bos=False, eos=False) == pytest.approx(
        -1.1 - 1.0)
    # e-notation unigram: P(<s>) as a mid-sentence token never scores, but
    # bo(<s>) = -0.5 engages for unseen <s>-contexts:
    # P(cat|<s>) = bo(<s>) + P(cat) = -0.5 - 1.1
    assert lm.score('cat', eos=False) == pytest.approx(-0.5 - 1.1)


def test_missing_unk_floor(tmp_path):
    """No <unk> in the model: OOV unigrams score log10 -100 (kenlm's
    unknown_missing_logprob substitution default), and OOV tokens do NOT
    collapse to <unk> in contexts."""
    path = tmp_path / 'no_unk.arpa'
    path.write_text(NO_UNK)
    for cls in (ArpaLM, PyArpaLM):
        lm = cls(str(path))
        # Order-1 model: no context terms. P(dog) = floor -100 (no <unk>
        # to substitute), P(</s>) = -0.9.
        assert lm.score('dog') == pytest.approx(-100.0 - 0.9), cls


def test_python_oracle_agrees_on_fixtures(lm_path, quirks_path):
    sentences = ['the cat', 'cat the', 'dog', 'the sat', 'cat', '',
                 'the the the cat sat']
    for path in (lm_path, quirks_path):
        native, py = ArpaLM(path), PyArpaLM(path)
        for s in sentences:
            for bos in (True, False):
                for eos in (True, False):
                    assert native.score(s, bos, eos) == pytest.approx(
                        py.score(s, bos, eos), abs=1e-5), (path, s, bos, eos)


def test_native_vs_python_fuzz(tmp_path):
    """Randomly generated ARPA models (random pruning, probs, vocab) +
    random sentences incl. OOVs: the two implementations must agree
    everywhere."""
    rng = np.random.default_rng(0)
    vocab = ['a', 'b', 'c', 'd', 'e']
    for trial in range(5):
        grams = {1: {}, 2: {}, 3: {}}
        for w in ['<s>', '</s>', '<unk>'] + vocab:
            if w == '<unk>' and trial % 2:
                continue  # half the models have no <unk>
            grams[1][(w,)] = (round(float(-rng.uniform(0.1, 3)), 4),
                              round(float(-rng.uniform(0, 1)), 4)
                              if rng.random() < 0.7 else None)
        uni = [k[0] for k in grams[1]]
        for _ in range(12):
            k = (uni[int(rng.integers(len(uni)))],
                 uni[int(rng.integers(len(uni)))])
            grams[2][k] = (round(float(-rng.uniform(0.1, 3)), 4),
                           round(float(-rng.uniform(0, 1)), 4)
                           if rng.random() < 0.5 else None)
        for _ in range(6):
            k2 = list(grams[2])[int(rng.integers(len(grams[2])))]
            w = vocab[int(rng.integers(len(vocab)))]
            grams[3][k2 + (w,)] = (round(float(-rng.uniform(0.1, 3)), 4),
                                   None)
        lines = ['\\data\\'] + [f'ngram {n}={len(g)}'
                                for n, g in grams.items()] + ['']
        for n, g in grams.items():
            lines.append(f'\\{n}-grams:')
            for words, (lp, bo) in g.items():
                row = f'{lp}\t{" ".join(words)}'
                if bo is not None and n < 3:
                    row += f'\t{bo}'
                lines.append(row)
            lines.append('')
        lines.append('\\end\\')
        path = tmp_path / f'fuzz{trial}.arpa'
        path.write_text('\n'.join(lines))
        native, py = ArpaLM(str(path)), PyArpaLM(str(path))
        for _ in range(20):
            n_words = int(rng.integers(0, 6))
            sent = ' '.join(rng.choice(vocab + ['zzz', 'qqq'])
                            for _ in range(n_words))
            got, want = native.score(sent), py.score(sent)
            assert got == pytest.approx(want, abs=1e-4), (trial, sent)


def test_kenlm_crosscheck_when_installed(lm_path, quirks_path):
    """Runs only where kenlm is importable: the native scorer must match
    kenlm's Model.score exactly on the fixtures."""
    kenlm = pytest.importorskip('kenlm')
    for path in (lm_path, quirks_path):
        km, native = kenlm.Model(path), ArpaLM(path)
        for s in ['the cat', 'cat the', 'dog', 'the sat', 'the cat sat']:
            assert native.score(s) == pytest.approx(km.score(s), abs=1e-4)


def test_pyarpa_fallback_seam(tmp_path, monkeypatch):
    """load_lm falls through native -> PyArpaLM when the .so is missing."""
    import wav2letter_pytorch_tpu.decoding.arpa_lm as mod
    path = tmp_path / 'tiny.arpa'
    path.write_text(TINY_ARPA)

    class NoNative:
        def __init__(self, p):
            raise RuntimeError('native ARPA scorer unavailable')

    monkeypatch.setattr(mod, 'ArpaLM', NoNative)
    lm = mod.load_lm(str(path))
    assert isinstance(lm, mod.PyArpaLM)
    assert lm.score('the cat') == pytest.approx(-0.3 - 0.5 - 0.9)
