#!/usr/bin/env python
"""WER-vs-lookahead curve for bounded-lookahead streaming.

VERDICT r4 weak #4: serving/lookahead.py promised measured WER-vs-
lookahead curves in benchmarks/serving_latency.json but only a single
K=96 point existed (and it cost ~2 WER points vs offline streaming).
This sweep produces the curve on the full-depth checkpoint through the
shipped test.py CLI:

  - lookahead K in {24, 48, 96, 192} frames (0.24-1.92 s at 10 ms hop);
  - at K=96: window extrapolation variants (reflect/repeat synthesized
    future frames — zero added latency) and a reduced-left-context point;
  - results merged into serving_latency.json under
    'bounded_lookahead_wer_curve' (keeping lookahead.py's docstring true).

Usage (after scripts/full_depth_run.py has trained a checkpoint):

    python benchmarks/lookahead_sweep.py --model-path /tmp/w2l_full_run \
        --test-manifest /tmp/w2l_corpus/test_manifest.csv
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_test_cli(args_list):
    import test as test_cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(args_list)
    assert rc == 0, f'test.py failed: {args_list}'
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-path', default='/tmp/w2l_full_run')
    ap.add_argument('--test-manifest',
                    default='/tmp/w2l_corpus/test_manifest.csv')
    ap.add_argument('--chunk-frames', type=int, default=64)
    ap.add_argument('--lookaheads', type=int, nargs='+',
                    default=[24, 48, 96, 192])
    ap.add_argument('--extrap-modes', nargs='*', default=['reflect',
                                                          'repeat'])
    ap.add_argument('--extrap-frames', type=int, nargs='*',
                    default=[64, 192])
    ap.add_argument('--no-half-left', action='store_true')
    ap.add_argument('--key', default='bounded_lookahead_wer_curve',
                    help='serving_latency.json key to merge under')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'serving_latency.json'))
    args = ap.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    base = ['--model-path', args.model_path,
            '--test-manifest', args.test_manifest,
            '--streaming', '--streaming-chunk-frames',
            str(args.chunk_frames)]

    curve = {}

    # reference points: offline greedy and exact-parity streaming
    curve['offline_greedy'] = run_test_cli(
        ['--model-path', args.model_path,
         '--test-manifest', args.test_manifest])
    print(json.dumps({'point': 'offline', **curve['offline_greedy']}),
          flush=True)
    curve['streaming_full_rf'] = run_test_cli(base)
    print(json.dumps({'point': 'full_rf', **curve['streaming_full_rf']}),
          flush=True)

    for la in args.lookaheads:
        r = run_test_cli(base + ['--lookahead-frames', str(la)])
        curve[f'la{la}'] = r
        print(json.dumps({'point': f'la{la}', **r}), flush=True)

    # extrapolation variants at the headline K (zero added latency)
    for mode in args.extrap_modes:
        for ex in args.extrap_frames:
            r = run_test_cli(base + ['--lookahead-frames', '96',
                                     '--lookahead-extrap-frames', str(ex),
                                     '--lookahead-extrap-mode', mode])
            curve[f'la96_extrap{ex}_{mode}'] = r
            print(json.dumps({'point': f'la96_extrap{ex}_{mode}', **r}),
                  flush=True)

    # left-context variant: half the receptive field of past context
    # (cheaper windows; how much does exact past matter?)
    full_left = (None if args.no_half_left
                 else curve.get('la96', {}).get('left_frames'))
    if full_left:
        r = run_test_cli(base + ['--lookahead-frames', '96',
                                 '--lookahead-left-frames',
                                 str(int(full_left) // 2)])
        curve['la96_half_left'] = r
        print(json.dumps({'point': 'la96_half_left', **r}), flush=True)

    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[args.key] = {
        'checkpoint': args.model_path,
        'chunk_frames': args.chunk_frames,
        'points': curve,
    }
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(existing, f, indent=1)
    os.replace(tmp, args.out)
    print(f'wrote {args.out} [{args.key}]')


if __name__ == '__main__':
    main()
