"""Hebrew language tools, label sets, and the Hebrew training path
(BASELINE.json config #5 includes the Hebrew-labels variant)."""

import json

import numpy as np

from wav2letter_pytorch_tpu.data.label_sets import (english_labels,
                                                    english_lowercase_labels,
                                                    hebrew_labels, labels_map,
                                                    resolve_labels)
from wav2letter_pytorch_tpu.data.language_specific_tools import (
    hebrew_final_to_normal, hebrew_normal_to_final)


def test_label_set_structure():
    assert english_labels[0] == '_'          # CTC blank at index 0
    assert english_labels[-1] == ' '
    assert len(english_labels) == 29
    assert len(english_lowercase_labels) == 29
    assert hebrew_labels[0] == '_'
    assert hebrew_labels[-1] == ' '
    assert len(hebrew_labels) == 29          # 27 letters + blank + space
    assert set(labels_map) == {'english', 'english_lowercase', 'hebrew'}
    assert resolve_labels('english') == english_labels
    assert resolve_labels(['_', 'a']) == ['_', 'a']
    # resolve returns copies — mutating them must not corrupt the globals
    resolve_labels('english').append('!')
    assert english_labels[-1] == ' '


def test_hebrew_normal_to_final():
    # word-final mem becomes final-mem, both mid-string and at the end
    assert hebrew_normal_to_final('שלומ') == 'שלום'
    assert hebrew_normal_to_final('שלומ עולמ') == 'שלום עולם'
    # non-final positions untouched
    assert hebrew_normal_to_final('מים') == 'מים'


def test_hebrew_final_to_normal_roundtrip():
    assert hebrew_final_to_normal('שלום') == 'שלומ'
    s = 'אנציקלופדיה חופשית'
    assert hebrew_normal_to_final(hebrew_final_to_normal(s)) == s


def test_hebrew_list_handling():
    out = hebrew_normal_to_final(['שלומ', 'עולמ'])
    assert out == ['שלום', 'עולם']
    # the reference's list branch of final_to_normal recursed into the WRONG
    # function (language_specific_tools.py:13) — ours must not
    out2 = hebrew_final_to_normal(['שלום'])
    assert out2 == ['שלומ']


def test_hebrew_training_path(tmp_path):
    """End-to-end: hebrew labels + 8 kHz audio group compose and train."""
    from wav2letter_pytorch_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    rows = []
    for i, text in enumerate(['שלום עולם', 'אבא בא']):
        t = np.arange(4000) / 8000
        audio = (0.3 * np.sin(2 * np.pi * (300 + 50 * i) * t)).astype(np.float32)
        path = tmp_path / f'he{i}.wav'
        write_wav(str(path), audio, 8000)
        rows.append({'audio_filepath': str(path), 'text': text})
    manifest = tmp_path / 'he.jsonl'
    manifest.write_text('\n'.join(json.dumps(r, ensure_ascii=False)
                                  for r in rows))

    import train as train_cli
    rc = train_cli.main([
        f'data.train_manifest={manifest}',
        f'data.val_manifest={manifest}',
        'data.batch_size=2', 'data.num_length_buckets=1',
        'audio=standard_8k', 'model.labels=hebrew',
        'model.input_size=32',
        'model.layers=[{output_size: 16, kernel_size: 5, stride: 2, '
        'dilation: 1, dropout: -1.0}]',
        'trainer.max_epochs=1', 'trainer.max_steps=2',
        'trainer.string_metrics_interval=1',
        'trainer.mesh.data=2',
        f'trainer.default_root_dir={tmp_path / "run"}',
    ])
    assert rc == 0
    metrics = (tmp_path / 'run' / 'metrics.csv').read_text()
    assert 'train_wer' in metrics


def test_hebrew_corpus_generator(tmp_path):
    """scripts/make_offline_corpus --lang hebrew: every vocabulary word is
    writable in the 27-letter set, every letter renders, final forms are
    present (so the positional final-vs-normal task is actually exercised),
    and the written corpus encodes cleanly under hebrew labels."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.make_offline_corpus import (HEBREW_TO_PHONE, HEBREW_WORDS,
                                             build_split)
    from wav2letter_pytorch_tpu.data.dataset import ManifestDataset

    letters = set(hebrew_labels) | {' '}
    assert all(set(w) <= letters for w in HEBREW_WORDS)
    assert all(ch in HEBREW_TO_PHONE for w in HEBREW_WORDS for ch in w)
    finals = set('םןךףץ')
    assert any(w[-1] in finals for w in HEBREW_WORDS)
    # Final forms only ever appear word-finally (valid orthography).
    assert all(ch not in finals for w in HEBREW_WORDS for ch in w[:-1])

    manifest = build_split(str(tmp_path), 'train', 2, 16000, seed=0,
                           use_wav=True, lang='hebrew')
    conf = {'sample_rate': 16000, 'window': 'hamming',
            'window_size': 0.02, 'window_stride': 0.01}
    ds = ManifestDataset(manifest, conf, hebrew_labels)
    blank = hebrew_labels.index('_')
    for i in range(len(ds)):
        audio, target, _, text = ds[i]
        assert len(audio) > 1000 and np.isfinite(audio).all()
        # Round-trip: every transcript char encodes (nothing dropped as
        # unknown) and decodes back to the original Hebrew text.
        assert ''.join(hebrew_labels[t] for t in target) == text
        assert blank not in list(target)
