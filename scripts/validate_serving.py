#!/usr/bin/env python
"""Serving validation on TRAINED weights: every inference path, one model.

Trains the synthetic-corpus demo model (scripts/train_synthetic_demo.py),
then evaluates the SAME validation manifest through each serving path and
records the WER/CER deltas — the quality-preservation evidence for the
serving layer (exact-parity paths must match the offline WER; quantized
paths show their real accuracy cost on trained weights, not random ones).

    python scripts/validate_serving.py --epochs 30 --out /tmp/w2l_serv_val

Paths compared:
  offline        test.py --model-path              (the baseline)
  streaming      test.py --model-path --streaming  (cumulative-norm)
  artifact       test.py --artifact                (CMVN streaming, int8 weights)
  artifact_offline           --artifact --offline  (mesh-sharded, int8 weights)
  artifact_int8_full         --artifact --offline --int8-full (MXU int8, static scales)

Writes benchmarks/serving_validation.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_eval(argv):
    import test as test_cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main(argv)
    assert rc == 0, f'eval failed: {argv}'
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=30)
    parser.add_argument('--n-train', type=int, default=400)
    parser.add_argument('--out', default='/tmp/w2l_serv_val')
    args = parser.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import importlib.util
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        'train_synthetic_demo', os.path.join(here,
                                             'train_synthetic_demo.py'))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    manifests = demo.make_corpus(os.path.join(args.out, 'data'),
                                 n_train=args.n_train)
    run_dir = os.path.join(args.out, 'run')
    if not os.path.isdir(os.path.join(run_dir, 'checkpoints')):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = demo.main(['--epochs', str(args.epochs),
                            '--n-train', str(args.n_train),
                            '--out', args.out])
        assert rc == 0
        print(buf.getvalue().strip().splitlines()[-1], file=sys.stderr)

    val = manifests['val']
    results = {}
    results['offline'] = _run_eval(['--model-path', run_dir,
                                    '--test-manifest', val])
    results['streaming'] = _run_eval(['--model-path', run_dir,
                                      '--test-manifest', val,
                                      '--streaming',
                                      '--streaming-chunk-frames', '32'])

    art = os.path.join(args.out, 'artifact')
    spec2 = importlib.util.spec_from_file_location(
        'export_serving', os.path.join(here, 'export_serving.py'))
    exp = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(exp)
    rc = exp.main(['--model-path', run_dir, '--out', art, '--int8',
                   '--cmvn-manifest', manifests['train'], '--calibrate'])
    assert rc == 0
    results['artifact_streaming'] = _run_eval(
        ['--artifact', art, '--test-manifest', val,
         '--streaming-chunk-frames', '32'])
    results['artifact_offline'] = _run_eval(
        ['--artifact', art, '--test-manifest', val, '--offline'])
    results['artifact_int8_full'] = _run_eval(
        ['--artifact', art, '--test-manifest', val, '--offline',
         '--int8-full'])

    out = {'corpus': 'synthetic (scripts/train_synthetic_demo.py)',
           'epochs': args.epochs}
    for name, r in results.items():
        out[name] = {'wer': round(r['wer'], 4), 'cer': round(r['cer'], 4)}
    path = os.path.join(os.path.dirname(here), 'benchmarks',
                        'serving_validation.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
