#!/usr/bin/env python
"""Parse a jax.profiler chrome trace into an op-class breakdown + roofline.

Answers the question the aggregate TFLOPS number can't: WHERE does a
train step's device time go, and is the step compute- or bandwidth-
bound? Used to settle the jasper-family efficiency question (VERDICT r3
next-step #1): the profiled step shows 100% device occupancy with
convolutions a small fraction of device time — the BN-train semantics of
the architecture (mask -> conv -> batch-stat reduce -> normalize+act,
reference jasper.py:198-236) make the step HBM-bandwidth-bound, so MFU
against the MXU FLOPS peak is the wrong lens. See
jasper_trace_analysis.json for the recorded numbers and
docs/ROADMAP.md for the narrative.

    # 1. capture a trace
    with jax.profiler.trace('/tmp/prof'):  # 3 steps recommended
        ...
    # 2. analyze
    python benchmarks/jasper_trace_analysis.py /tmp/prof --steps 3 \
        [--model-tflop-per-step 0.385]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(profile_dir: str) -> dict:
    paths = sorted(glob.glob(os.path.join(
        profile_dir, '**', '*.trace.json.gz'), recursive=True))
    if not paths:
        raise FileNotFoundError(f'no *.trace.json.gz under {profile_dir}')
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def analyze(trace: dict, steps: int, model_tflop: float | None = None):
    ev = trace['traceEvents']
    proc = {e['pid']: e['args']['name'] for e in ev
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    thread = {(e['pid'], e['tid']): e['args']['name'] for e in ev
              if e.get('ph') == 'M' and e.get('name') == 'thread_name'}
    tpu_pids = {p for p, n in proc.items()
                if 'TPU' in str(n) or 'device' in str(n).lower()}
    dev = [e for e in ev if e.get('ph') == 'X' and e.get('pid') in tpu_pids
           and thread.get((e['pid'], e['tid'])) == 'XLA Ops']
    if not dev:
        raise ValueError('no device-side XLA Ops events in trace')
    total_us = sum(e['dur'] for e in dev)
    span_us = (max(e['ts'] + e['dur'] for e in dev)
               - min(e['ts'] for e in dev))
    classes = collections.Counter()
    counts = collections.Counter()
    for e in dev:
        c = re.sub(r'\.\d+$', '', e['name'])
        classes[c] += e['dur']
        counts[c] += 1
    out = {
        'device_ops_per_step': round(len(dev) / steps, 1),
        'device_busy_ms_per_step': round(total_us / steps / 1e3, 3),
        'occupancy_pct': round(100 * total_us / span_us, 1),
        'by_class_us_per_step': {
            c: {'us': round(d / steps, 1), 'count': round(counts[c] / steps, 1)}
            for c, d in classes.most_common(12)},
    }
    if model_tflop:
        out['model_tflop_per_step'] = model_tflop
        out['device_tflops_effective'] = round(
            model_tflop / (total_us / steps / 1e6), 1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('profile_dir')
    p.add_argument('--steps', type=int, required=True,
                   help='train steps captured inside the trace')
    p.add_argument('--model-tflop-per-step', type=float, default=None)
    p.add_argument('--out', default=None,
                   help='also write the analysis JSON here')
    args = p.parse_args(argv)
    result = analyze(load_trace(args.profile_dir), args.steps,
                     args.model_tflop_per_step)
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
