"""Tests for the ARPA n-gram trainer (decoding/ngram_train.py).

The reference can only consume kenlm files built elsewhere
(/root/reference/decoder.py:249); our trainer closes the loop, so these
tests pin the statistical contracts a downstream beam search depends on:
proper normalization, OOV mass, order benefits, and compatibility with
every scorer tier.
"""

import math
import subprocess
import sys

import numpy as np
import pytest

from wav2letter_pytorch_tpu.decoding.arpa_lm import PyArpaLM
from wav2letter_pytorch_tpu.decoding.ngram_train import (BOS, NgramLM,
                                                         train_arpa)

SENTS = ['the cat sat on the mat', 'the dog sat on the log',
         'a cat and a dog', 'the cat ran', 'dogs and cats play',
         'the mat was flat', 'a dog ran to the cat',
         'the dog ran to the mat', 'a cat sat']


@pytest.fixture(scope='module')
def arpa(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('lm') / 'test.arpa')
    lm = train_arpa(SENTS, path, order=3)
    return path, lm


def test_conditionals_sum_to_one(arpa):
    """Every context's distribution over the vocabulary must sum to 1 —
    seen contexts, backoff contexts, and fully unseen contexts alike."""
    path, lm = arpa
    py = PyArpaLM(path)
    vocab = [w for w in lm.vocab if w != BOS]
    for ctx in ([], ['the'], ['on', 'the'], ['sat', 'on'],
                ['never', 'seenctx'], ['mat']):
        s = sum(10 ** py._cond(tuple(ctx + [w])) for w in vocab)
        assert s == pytest.approx(1.0, abs=1e-6), ctx


def test_seen_beats_unseen(arpa):
    path, _ = arpa
    py = PyArpaLM(path)
    assert py.score('the cat sat') > py.score('cat the sat')
    assert py.score('the cat') > py.score('the zzzunknown')


def test_order_improves_train_ppl(tmp_path):
    def ppl(order):
        path = str(tmp_path / f'o{order}.arpa')
        train_arpa(SENTS, path, order=order)
        py = PyArpaLM(path)
        logp = n = 0
        for s in SENTS:
            logp += py.score(s)
            n += len(s.split()) + 1
        return 10 ** (-logp / n)
    p1, p3 = ppl(1), ppl(3)
    assert p3 < p1


def test_native_scorer_agrees(arpa):
    path, _ = arpa
    from wav2letter_pytorch_tpu.decoding.arpa_lm import ArpaLM
    try:
        native = ArpaLM(path)
    except (OSError, RuntimeError):
        pytest.skip('native library not built')
    py = PyArpaLM(path)
    for s in SENTS + ['the zebra sat on a dog', 'unseen words entirely']:
        assert native.score(s) == pytest.approx(py.score(s), abs=1e-4)


def test_pruning_drops_entries_and_still_scores(tmp_path):
    full = NgramLM(SENTS, order=3)
    pruned = NgramLM(SENTS, order=3, prune_count=1)
    path = str(tmp_path / 'pruned.arpa')
    pruned.write_arpa(path)
    assert len(pruned._kept(3)) < len(full._kept(3))
    py = PyArpaLM(path)
    assert math.isfinite(py.score('the cat sat on the mat'))


def test_empty_input_raises():
    with pytest.raises(ValueError, match='no training text'):
        NgramLM([], order=2)
    with pytest.raises(ValueError, match='no training text'):
        NgramLM(['', '   '], order=2)


def test_beam_decoder_accepts_trained_lm(arpa):
    """The trained file must plug into the LM-fused beam decoder and pull
    an ambiguous decode toward in-LM word sequences."""
    path, _ = arpa
    from wav2letter_pytorch_tpu.data.label_sets import labels_map
    from wav2letter_pytorch_tpu.decoding.decoder import \
        PrefixBeamSearchLMDecoder
    labels = labels_map['english_lowercase']
    ix = {ch: i for i, ch in enumerate(labels)}
    # Emissions spelling "the cat sat" with the 'c' of 'cat' ambiguous vs
    # 'k' ("the kat sat" is off-LM): the LM must resolve it. The ambiguous
    # word is non-final because the LM bonus applies at word boundaries
    # (reference decoder.py:210-212 semantics).
    text = 'the cat sat'
    T = 2 * len(text)
    probs = np.full((T, len(labels)), 1e-4, np.float32)
    for t, ch in enumerate(text):
        probs[2 * t, ix[ch]] = 0.9
        probs[2 * t + 1, 0] = 0.9
    c = ix['c']
    k = ix['k']
    probs[2 * 4, c] = 0.45      # 'c' of cat barely loses to 'k'
    probs[2 * 4, k] = 0.55
    probs /= probs.sum(-1, keepdims=True)
    dec = PrefixBeamSearchLMDecoder(path, labels, k=8, alpha=1.0, beta=0.0)
    out = dec.decode(probs[None], sizes=np.array([T]))[0]
    assert out == 'the cat sat'
    nolm = PrefixBeamSearchLMDecoder('', labels, k=8, alpha=0.0, beta=0.0)
    assert nolm.decode(probs[None], sizes=np.array([T]))[0] == 'the kat sat'


def test_cli_smoke(tmp_path):
    text = tmp_path / 'corpus.txt'
    text.write_text('\n'.join(SENTS))
    out = tmp_path / 'cli.arpa'
    res = subprocess.run(
        [sys.executable, 'scripts/build_arpa.py', '--text', str(text),
         '--out', str(out), '--order', '2'],
        capture_output=True, text=True, cwd='/root/repo')
    assert res.returncode == 0, res.stderr[-2000:]
    py = PyArpaLM(str(out))
    assert py.order == 2
    assert math.isfinite(py.score('the cat sat'))
