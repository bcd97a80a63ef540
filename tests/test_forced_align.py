"""CTC forced alignment (decoding/forced_align.py): Viterbi over the
blank-interleaved lattice. Capability absent from the reference (its word
timing needs the greedy decode to happen to equal the transcript —
decoder.py:270-302)."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.decoding.forced_align import (forced_align,
                                                          word_alignments)

LABELS = ['_', 'a', 'b', 'c', ' ']
IX = {c: i for i, c in enumerate(LABELS)}


def _logp_from_path(chars, T=None, hi=0.9):
    """Frame-wise log-probs strongly emitting ``chars`` (one per frame)."""
    T = T or len(chars)
    lp = np.full((T, len(LABELS)), np.log((1 - hi) / (len(LABELS) - 1)))
    for t, c in enumerate(chars):
        lp[t, IX[c]] = np.log(hi)
    return lp


def test_exact_alignment_simple():
    #           frames: a a _ b b b _ _ c
    lp = _logp_from_path('aa_bbb__c')
    spans = forced_align(lp, 'abc', LABELS)
    assert spans == [('a', 0, 2), ('b', 3, 6), ('c', 8, 9)]


def test_repeat_needs_blank():
    lp = _logp_from_path('aa_a')
    spans = forced_align(lp, 'aa', LABELS)
    # first 'a' absorbs frames 0-1, blank at 2, second 'a' at 3
    assert spans == [('a', 0, 2), ('a', 3, 4)]
    with pytest.raises(ValueError, match='cannot emit'):
        forced_align(lp[:2], 'aa', LABELS)


def test_unknown_char_raises():
    with pytest.raises(ValueError, match="'z'"):
        forced_align(_logp_from_path('aaaa'), 'z', LABELS)


def test_alignment_score_at_least_argmax_path():
    """The Viterbi path for the greedy transcript scores >= the argmax
    path itself (the argmax path is one feasible alignment of that
    transcript); spans are monotone and in range."""
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    rng = np.random.default_rng(3)
    dec = GreedyDecoder(LABELS)
    for trial in range(20):
        T = int(rng.integers(12, 60))
        lp = np.log(rng.dirichlet(np.ones(len(LABELS)) * 0.5, size=T))
        text = dec.decode(lp[None])[0]
        if not text.strip():
            continue
        spans = forced_align(lp, text, LABELS)
        assert ''.join(c for c, _, _ in spans) == text
        prev_end = 0
        viterbi_frames = set()
        for c, s, e in spans:
            assert 0 <= s < e <= T
            assert s >= prev_end or c != ' '
            prev_end = max(prev_end, s)
            viterbi_frames.update(range(s, e))
        # score comparison: best-path log-prob >= argmax path log-prob
        # restricted to the same transcript's lattice
        argmax = lp.argmax(1)
        argmax_score = lp[np.arange(T), argmax].sum()
        # build the viterbi path score: aligned char frames use the char,
        # all other frames must have been blanks on the path
        score = 0.0
        for c, s, e in spans:
            score += lp[s:e, IX[c]].sum()
        blank_frames = [t for t in range(T) if t not in viterbi_frames]
        score += lp[blank_frames, 0].sum()
        assert score >= argmax_score - 1e-9


def test_word_alignments():
    lp = _logp_from_path('ab_ _ca_', hi=0.95)
    words = word_alignments(lp, 'ab ca', LABELS, frame_seconds=0.02)
    assert [w for w, _, _ in words] == ['ab', 'ca']
    (w0, s0, e0), (w1, s1, e1) = words
    assert s0 == 0.0 and abs(e0 - 2 * 0.02) < 1e-9
    assert abs(s1 - 5 * 0.02) < 1e-9 and abs(e1 - 7 * 0.02) < 1e-9


def test_empty_and_spaces_only():
    assert forced_align(_logp_from_path('____'), '', LABELS) == []
    words = word_alignments(_logp_from_path('_ __'), ' ', LABELS)
    assert words == []


def test_align_cli(tmp_path):
    """scripts/align.py end to end: artifact + manifest -> word-time JSONL."""
    import importlib.util
    import json
    import os

    from tests.test_train_e2e import _make_corpus

    manifest = _make_corpus(tmp_path)
    run_dir = tmp_path / 'run'
    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}', f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'model.input_size=32',
        'model.layers=[{output_size: 24, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: 0.1}]',
        'trainer.max_epochs=1', 'trainer.max_steps=3',
        'trainer.string_metrics_interval=0', 'trainer.mesh.data=2',
        f'trainer.default_root_dir={run_dir}'])
    assert rc == 0

    def _load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                               rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    art = str(tmp_path / 'art')
    assert _load('export_serving_cli', 'scripts/export_serving.py').main(
        ['--model-path', str(run_dir), '--out', art]) == 0
    out = str(tmp_path / 'words.jsonl')
    rc = _load('align_cli', 'scripts/align.py').main(
        ['--artifact', art, '--manifest', manifest, '--out', out])
    assert rc == 0
    with open(out) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert len(recs) == 6
    for r in recs:
        assert 'error' not in r
        assert [w for w, _, _ in r['words']] == r['text'].split()
        for w, s, e in r['words']:
            assert 0 <= s <= e
