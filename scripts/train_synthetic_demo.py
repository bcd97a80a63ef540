#!/usr/bin/env python
"""Convergence demo: learn a synthetic tone-language end to end on TPU.

Builds a deterministic "spoken digits" corpus — each letter is rendered as
a fixed-frequency tone segment, utterances are 2-4 random digit words —
then trains the Wav2Letter stack with the NovoGrad config and reports val
WER/CER. A working pipeline drives WER to ~0 on this task; random output
would sit near 100%.

    python scripts/train_synthetic_demo.py [--epochs 12] [--out runs/demo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
WORDS = ['zero', 'one', 'two', 'three', 'four', 'five', 'six', 'seven',
         'eight', 'nine']
LETTER_SECONDS = 0.08
GAP_SECONDS = 0.04


def letter_freq(ch: str) -> float:
    if ch == ' ':
        return 0.0
    return 220.0 * 2 ** ((ord(ch) - ord('a')) / 12.0)  # a semitone ladder


def render(text: str, rng) -> np.ndarray:
    chunks = []
    for ch in text:
        n = int(LETTER_SECONDS * SR)
        t = np.arange(n) / SR
        f = letter_freq(ch)
        tone = 0.4 * np.sin(2 * np.pi * f * t) if f else np.zeros(n)
        chunks.append(tone)
        chunks.append(np.zeros(int(GAP_SECONDS * SR)))
    audio = np.concatenate(chunks)
    audio += 0.01 * rng.standard_normal(audio.shape)
    return audio.astype(np.float32)


def make_corpus(root: str, n_train: int = 400, n_val: int = 60):
    from wav2letter_pytorch_tpu.data.audio_io import write_wav
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    manifests = {}
    for split, n in (('train', n_train), ('val', n_val)):
        rows = []
        for i in range(n):
            text = ' '.join(rng.choice(WORDS)
                            for _ in range(rng.integers(2, 5)))
            path = os.path.join(root, f'{split}{i}.wav')
            write_wav(path, render(text, rng), SR)
            rows.append({'audio_filepath': path, 'text': text})
        manifest = os.path.join(root, f'{split}.jsonl')
        with open(manifest, 'w') as f:
            f.write('\n'.join(json.dumps(r) for r in rows))
        manifests[split] = manifest
    return manifests


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=12)
    parser.add_argument('--n-train', type=int, default=400)
    parser.add_argument('--augment', action='store_true',
                        help='enable SpecAugment during training')
    parser.add_argument('--out', default='/tmp/w2l_synth_demo')
    args = parser.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import train as train_cli

    manifests = make_corpus(os.path.join(args.out, 'data'),
                            n_train=args.n_train)
    run_dir = os.path.join(args.out, 'run')
    overrides = [
        f'data.train_manifest={manifests["train"]}',
        f'data.val_manifest={manifests["val"]}',
        'data.batch_size=16', 'data.num_length_buckets=2',
        'optimizer=novograd', 'model.optimizer.lr=2e-3',
        'model.scheduler.gamma=0.97',
        'model.mid_layers=3',
        'model.layers=[{output_size: 128, kernel_size: 11, stride: 2, '
        'dilation: 1, dropout: 0.1}, {output_size: 128, kernel_size: 11, '
        'stride: 1, dilation: 1, dropout: 0.1}, {output_size: 256, '
        'kernel_size: 13, stride: 1, dilation: 1, dropout: 0.1}]',
        *(['data.augment={spec_augment: {freq_masks: 2, time_masks: 2, '
           'freq_width: 8, time_width: 12}}'] if args.augment else []),
        f'trainer.max_epochs={args.epochs}',
        'trainer.string_metrics_interval=20',
        'trainer.log_every_n_steps=20',
        f'trainer.default_root_dir={run_dir}',
    ]
    rc = train_cli.main(overrides)
    assert rc == 0

    # Offline evaluation through test.py on both splits: train-split WER
    # shows fitting capacity; val-split WER shows generalization.
    import io
    import contextlib
    import test as test_cli
    results = {'demo': 'synthetic_digits'}
    for split in ('train', 'val'):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            test_cli.main(['--model-path', run_dir,
                           '--test-manifest', manifests[split]])
        metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
        results[f'{split}_wer'] = metrics['wer']
        results[f'{split}_cer'] = metrics['cer']
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
