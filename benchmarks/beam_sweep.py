#!/usr/bin/env python
"""Beam-search / LM hyperparameter sweep over cached artifact logprobs.

The expensive part of tuning beam decoding (k, alpha, beta, LM order) is
the acoustic forward, not the search. This script runs the serving
artifact over the val and test manifests ONCE on device (same path as
``test.py --artifact --offline``), keeps the per-utterance probability
matrices in RAM (~200 utts x ~400 frames x 29 labels = a few MB), and
then grid-searches the decode hyperparameters entirely host-side with
the C++ beam search — hundreds of configurations for the price of two
evals. Selection is on val; only the winner is scored on test.

    python benchmarks/beam_sweep.py --artifact /tmp/w2l_full_run/artifact_qat_avg \
        --val-manifest /tmp/w2l_corpus/val_manifest.csv \
        --test-manifest /tmp/w2l_corpus/test_manifest.csv \
        --lm /tmp/corpus_lm.arpa --lm /tmp/corpus_lm4.arpa --int8-full \
        --out benchmarks/beam_sweep.json

The reference exposes the same knobs through
``--beam-search-params k=,alpha=,beta=,prune=`` (README.md:46-56,
/root/reference/decoder.py:235-257) but gives no tuning tooling.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_logprobs(artifact, manifest, int8_full, norm):
    """One on-device pass: [(probs [T,L] float32, text), ...]."""
    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.serving import (MeshInference, load_serving,
                                                quantize_folded)

    meta, folded, norm_stats = load_serving(artifact)
    ac = meta['audio_conf']
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    frontend = SpectrogramFrontend(
        conf, n_mels=int(meta['n_mels']), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'),
        norm_stats=norm_stats if norm == 'cmvn' else None)
    mode = meta['format']
    if int8_full:
        if meta['format'] != 'int8':
            folded = quantize_folded(folded)
        mode = 'int8_full'
    mi = MeshInference(meta['layers'], folded, frontend, mode=mode,
                       padding_mode=meta.get('padding_mode', 'reflect'),
                       act_scales=meta.get('act_scales'))
    ds = ManifestDataset(manifest, ac, meta['labels'])
    n_dev = mi.mesh.shape['data']
    bs = max(8, n_dev) + (-max(8, n_dev)) % n_dev
    loader = BucketBatchLoader(ds, bs, num_buckets=4, shuffle=False,
                               frame_hop=frontend.hop)
    out = []
    for batch in loader:
        logp, out_lens = mi.logprobs(batch['audio'], batch['audio_lengths'])
        probs = np.exp(np.asarray(logp, np.float32))
        sizes = np.asarray(out_lens)
        for j, text in enumerate(batch['texts']):
            if not batch['batch_mask'][j]:
                continue
            out.append((probs[j, :int(sizes[j])].copy(), text))
    return meta['labels'], out


def eval_grid_point(decoder, cached, greedy: bool = False):
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator
    acc = RatioAccumulator()
    for probs, text in cached:
        # greedy argmax is scale-invariant, so probs work as-is
        hyp = decoder.decode(probs[None])[0] if greedy \
            else decoder.decode(probs)
        w, wd = decoder.wer_ratio(text, hyp)
        c, cd = decoder.cer_ratio(text, hyp)
        acc.add('wer', w, wd)
        acc.add('cer', c, cd)
    return acc.ratios()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='grid-search beam/LM decode hyperparameters')
    parser.add_argument('--artifact', required=True)
    parser.add_argument('--val-manifest', required=True)
    parser.add_argument('--test-manifest', default='',
                        help='score the val-selected winner on this set')
    parser.add_argument('--lm', action='append', default=[],
                        help='ARPA path; repeatable. "" entries mean no-LM')
    parser.add_argument('--int8-full', action='store_true')
    parser.add_argument('--norm', default='per-utterance',
                        choices=['per-utterance', 'cmvn'])
    parser.add_argument('--ks', default='8,16,32')
    parser.add_argument('--alphas', default='0.2,0.3,0.4,0.5,0.7,1.0')
    parser.add_argument('--betas', default='0,1,2')
    parser.add_argument('--prune', type=float, default=1e-3)
    parser.add_argument('--cpu', action='store_true',
                        help='pin JAX to CPU (the ambient env pins a TPU '
                             'tunnel in a way plain env vars do not '
                             'override; see tests/conftest.py)')
    parser.add_argument('--out', default='')
    args = parser.parse_args(argv)

    if args.cpu:
        import os as _os
        _os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from wav2letter_pytorch_tpu.decoding import (GreedyDecoder,
                                                 PrefixBeamSearchLMDecoder)

    t0 = time.perf_counter()
    labels, val = collect_logprobs(args.artifact, args.val_manifest,
                                   args.int8_full, args.norm)
    print(f'val logprobs: {len(val)} utts in {time.perf_counter()-t0:.1f}s',
          file=sys.stderr)

    greedy = GreedyDecoder(labels)
    gval = eval_grid_point(greedy, val, greedy=True)
    print(f'greedy val: {gval}', file=sys.stderr)

    ks = [int(x) for x in args.ks.split(',') if x]
    alphas = [float(x) for x in args.alphas.split(',') if x]
    betas = [float(x) for x in args.betas.split(',') if x]
    lms = args.lm or ['']
    rows, best = [], None
    for lm_path in lms:
        dec = PrefixBeamSearchLMDecoder(lm_path, labels, k=1,
                                        prune=args.prune)
        # no-LM search ignores alpha; don't rerun identical points
        grid = itertools.product(ks, alphas if lm_path else [0.0], betas)
        for k, alpha, beta in grid:
            dec.k, dec.alpha, dec.beta = k, alpha, beta
            t1 = time.perf_counter()
            r = eval_grid_point(dec, val)
            row = {'lm': lm_path, 'k': k, 'alpha': alpha, 'beta': beta,
                   'val_wer': r['wer'], 'val_cer': r['cer'],
                   'decode_s': round(time.perf_counter() - t1, 2)}
            rows.append(row)
            mark = ''
            if best is None or r['wer'] < best['val_wer']:
                best, mark = row, '  <-- best'
            print(f'lm={os.path.basename(lm_path) or "none":20s} k={k:3d} '
                  f'alpha={alpha:.2f} beta={beta:.1f}  '
                  f'val WER {r["wer"]:.4f} ({row["decode_s"]}s){mark}',
                  file=sys.stderr)

    result = {'artifact': args.artifact,
              'mode': 'int8_full' if args.int8_full else 'as-exported',
              'norm': args.norm, 'prune': args.prune,
              'greedy_val_wer': gval['wer'],
              'n_val': len(val), 'grid': rows, 'best': best}
    if args.test_manifest and best:
        _, test = collect_logprobs(args.artifact, args.test_manifest,
                                   args.int8_full, args.norm)
        dec = PrefixBeamSearchLMDecoder(best['lm'], labels, k=best['k'],
                                        alpha=best['alpha'],
                                        beta=best['beta'], prune=args.prune)
        rt = eval_grid_point(dec, test)
        gt = eval_grid_point(greedy, test, greedy=True)
        result.update(n_test=len(test), test_wer=rt['wer'],
                      test_cer=rt['cer'], greedy_test_wer=gt['wer'])
        print(f'test: greedy {gt["wer"]:.4f} -> beam+LM {rt["wer"]:.4f}',
              file=sys.stderr)
    print(json.dumps({k: v for k, v in result.items() if k != 'grid'}))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == '__main__':
    sys.exit(main())
