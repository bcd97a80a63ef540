#!/usr/bin/env python
"""End-to-end training throughput: loader vs device vs the real fit loop.

VERDICT r4 weak #2: the device-step bench says 436 utt/s (8 s utterances,
B=16) while the full-depth run trained at ~47 utt/s end-to-end wall-clock,
and no artifact explained the gap. This benchmark publishes the number the
fight is about, split three ways on the SAME corpus and batch size:

  loader_only   host input pipeline alone (FLAC decode -> bucket -> pad),
                cold (first epoch) and warm (cache_audio second epoch);
  device_only   the jitted train step over pre-transferred device batches
                (true corpus shape mix, host pipeline out of the loop);
  e2e           trainer.fit's own steady-state utterances_per_sec (compile
                excluded by the trainer's t0-after-first-step rule).

The host is a single CPU core in this image (nproc=1): the loader thread
and the dispatch loop contend for it, so e2e < min(loader, device) is
expected without overlap credit. Variants quantify each shipped lever:
audio cache + int16 wire (r4), steps_per_dispatch, string metrics off.

Writes benchmarks/e2e_throughput.json (one entry per variant) and prints
one JSON line per phase. Reference anchor: the torch DataLoader hot path
this replaces, /root/reference/data/data_loader.py:123-158.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(cfg):
    from wav2letter_pytorch_tpu.training import (build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model, build_optimizer)
    import train as train_mod
    labels = build_labels(cfg.model)
    train_loader, _ = train_mod.get_data_loaders(labels, cfg.data)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model)
    steps = len(train_loader)
    optimizer, schedule = build_optimizer(cfg.model, steps, steps * 100)
    decoder = build_decoder(cfg.model, labels)
    return labels, train_loader, model, frontend, optimizer, schedule, decoder


def time_loader(loader, max_batches, sr):
    """Iterate the loader only; returns (utt/s, audio-seconds/s, batches)."""
    n_utts = 0
    audio_secs = 0.0
    t0 = time.perf_counter()
    for i, batch in enumerate(loader):
        n_utts += int(batch['batch_mask'].sum())
        audio_secs += float(batch['audio_lengths'].astype(np.float64).sum()
                            / sr)
        if i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n_utts / dt, audio_secs / dt, i + 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--manifest', default='/tmp/w2l_corpus/train_manifest.csv')
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--mid-layers', type=int, default=20)
    ap.add_argument('--model', default='wav2letter')
    ap.add_argument('--max-steps', type=int, default=160,
                    help='fit steps per e2e variant (after compile)')
    ap.add_argument('--loader-batches', type=int, default=120)
    ap.add_argument('--device-batches', type=int, default=24,
                    help='distinct pre-transferred batches for device_only')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'e2e_throughput.json'))
    args = ap.parse_args(argv)
    if not os.path.exists(args.manifest):
        raise SystemExit(f'{args.manifest} missing - run '
                         'scripts/make_offline_corpus.py first')

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.parallel.mesh import shard_batch
    from wav2letter_pytorch_tpu.training import Trainer

    base = [
        f'data.train_manifest={args.manifest}',
        f'data.val_manifest={args.manifest}',
        f'data.batch_size={args.batch_size}',
        f'model={args.model}',
        f'model.mid_layers={args.mid_layers}',
        'optimizer=novograd',
        'data.augment={spec_augment: {freq_masks: 2, time_masks: 2, '
        'freq_width: 10, time_width: 20}}',
        'trainer.checkpoint.every_n_epochs=1000000',
        'trainer.val_every_n_epochs=1000000',
        'trainer.max_epochs=1000000',
        f'trainer.max_steps={args.max_steps}',
    ]
    variants = {
        'base': [],
        'cache_int16': ['data.cache_audio=true', 'data.audio_dtype=int16'],
        'cache_spd8': ['data.cache_audio=true', 'data.audio_dtype=int16',
                       'trainer.steps_per_dispatch=8'],
        'cache_spd8_nometrics': ['data.cache_audio=true',
                                 'data.audio_dtype=int16',
                                 'trainer.steps_per_dispatch=8',
                                 'trainer.string_metrics_interval=0'],
        # trainer.device_cache: whole corpus resident in HBM after one
        # build pass — the host pipeline leaves the steady-state loop, so
        # e2e should approach device_only (the r5 lever for the
        # device-bench-vs-real-training gap).
        'device_cache': ['data.cache_audio=true', 'data.audio_dtype=int16',
                         'trainer.steps_per_dispatch=8',
                         'trainer.string_metrics_interval=0',
                         'trainer.device_cache=true'],
    }
    results = {'host_cpus': os.cpu_count(),
               'batch_size': args.batch_size,
               'model': f'{args.model} mid_layers={args.mid_layers}',
               'manifest': args.manifest, 'variants': {}}

    for name, extra in variants.items():
        cfg = load_config(base + extra)
        sr = int(cfg.data['audio_conf']['sample_rate'])
        (labels, loader, model, frontend,
         optimizer, schedule, decoder) = build(cfg)
        row = {}

        # ---- loader only (cold then, when caching, warm) ----------------
        utt_s, aud_s, nb = time_loader(loader, args.loader_batches, sr)
        row['loader_cold_utt_s'] = round(utt_s, 1)
        row['loader_cold_audio_s_per_s'] = round(aud_s, 1)
        if 'data.cache_audio=true' in extra:
            utt_s, aud_s, _ = time_loader(loader, args.loader_batches, sr)
            row['loader_warm_utt_s'] = round(utt_s, 1)
            row['loader_warm_audio_s_per_s'] = round(aud_s, 1)

        # ---- device only: pre-transferred true shape mix ------------------
        run_dir = f'/tmp/e2e_bench/{name}'
        os.makedirs(run_dir, exist_ok=True)
        trainer = Trainer(cfg, model, frontend, optimizer, schedule, decoder,
                          run_dir=run_dir)
        host_batches = []
        for i, b in enumerate(loader):
            host_batches.append(b)
            if i + 1 >= args.device_batches:
                break
        trainer.init_state(host_batches[0])
        dev = [shard_batch({k: v for k, v in b.items()
                            if isinstance(v, np.ndarray)}, trainer.mesh)
               for b in host_batches]
        step_fn = trainer._get_jitted('train')
        state = trainer.state
        for b in dev:                                   # compile every shape
            state, losses, _, _ = step_fn(state, b)
        float(losses)
        n_utts = sum(int(b['batch_mask'].sum()) for b in host_batches)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            for b in dev:
                state, losses, _, _ = step_fn(state, b)
        float(losses)
        dt = time.perf_counter() - t0
        row['device_only_utt_s'] = round(reps * n_utts / dt, 1)

        # ---- e2e: the real fit loop --------------------------------------
        # steady-state rate comes from the trainer's own bookkeeping
        # (compile excluded); read the last utterances_per_sec it logged.
        trainer.state = None          # re-init: drop the bench's state/step
        trainer.fit(loader, val_loader=None)
        rate = None
        with open(os.path.join(run_dir, 'metrics.csv')) as f:
            for rec in csv.reader(f):
                if rec and rec[2] == 'utterances_per_sec':
                    rate = float(rec[3])
        row['e2e_utt_s'] = round(rate, 1) if rate else None
        if rate:
            row['e2e_pct_of_device_only'] = round(
                100.0 * rate / row['device_only_utt_s'], 1)
        print(json.dumps({'variant': name, **row}), flush=True)
        results['variants'][name] = row
        trainer.logger.close()

    # Context: the r4 device bench (436 utt/s) is 8 s utterances; this
    # corpus is shorter ones. audio_s/s is the length-invariant rate.
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
