#!/usr/bin/env python
"""Forced alignment CLI: word timestamps for manifests with KNOWN text.

    python scripts/align.py --artifact <dir> --manifest data.csv \
        --out words.jsonl [--cpu]

Writes one JSON record per utterance: the transcript's words with
(start_s, end_s) from CTC Viterbi alignment (decoding/forced_align.py) —
subtitling / corpus segmentation / training-data QA. Works from any
serving artifact (wav2letter family); alignment quality is the model's,
ground truth text is the manifest's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description='CTC forced alignment')
    parser.add_argument('--artifact', required=True)
    parser.add_argument('--manifest', required=True)
    parser.add_argument('--out', default='', help='JSONL output path')
    parser.add_argument('--norm', default='per-utterance',
                        choices=['per-utterance', 'cmvn'])
    parser.add_argument('--cpu', action='store_true',
                        help='pin JAX to CPU (see tests/conftest.py)')
    args = parser.parse_args(argv)

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.decoding.forced_align import word_alignments
    from wav2letter_pytorch_tpu.serving import MeshInference, load_serving

    meta, folded, norm_stats = load_serving(args.artifact)
    if meta.get('family', 'wav2letter') != 'wav2letter':
        raise SystemExit('align.py supports the wav2letter family')
    ac = meta['audio_conf']
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    frontend = SpectrogramFrontend(
        conf, n_mels=int(meta['n_mels']), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'),
        norm_stats=norm_stats if args.norm == 'cmvn' else None)
    mi = MeshInference(meta['layers'], folded, frontend,
                       mode=meta['format'],
                       padding_mode=meta.get('padding_mode', 'reflect'),
                       act_scales=meta.get('act_scales'))
    scale = 1
    for l in meta['layers']:
        scale *= int(l.get('stride', 1))
    frame_seconds = float(ac['window_stride']) * scale

    ds = ManifestDataset(args.manifest, ac, meta['labels'])
    n_dev = mi.mesh.shape['data']
    bs = max(8, n_dev) + (-max(8, n_dev)) % n_dev
    loader = BucketBatchLoader(ds, bs, num_buckets=4, shuffle=False,
                               frame_hop=frontend.hop)
    records, n_failed = [], 0
    for batch in loader:
        logp, out_lens = mi.logprobs(batch['audio'],
                                     batch['audio_lengths'])
        logp, sizes = np.asarray(logp), np.asarray(out_lens)
        for j, text in enumerate(batch['texts']):
            if not batch['batch_mask'][j]:
                continue
            try:
                words = word_alignments(logp[j, :int(sizes[j])], text,
                                        meta['labels'],
                                        frame_seconds=frame_seconds)
            except ValueError as e:
                n_failed += 1
                records.append({'path': batch['paths'][j], 'text': text,
                                'error': str(e)})
                continue
            records.append({
                'path': batch['paths'][j], 'text': text,
                'words': [[w, round(s, 3), round(e, 3)]
                          for w, s, e in words]})
    if args.out:
        with open(args.out, 'w') as f:
            for r in records:
                f.write(json.dumps(r) + '\n')
    print(json.dumps({'num_utterances': len(records),
                      'failed': n_failed,
                      'frame_seconds': frame_seconds,
                      'out': args.out or None}))
    return 0 if n_failed == 0 else 1


if __name__ == '__main__':
    sys.exit(main())
