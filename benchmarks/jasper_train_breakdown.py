#!/usr/bin/env python
"""Jasper/QuartzNet train-step efficiency on the real chip.

step_breakdown.py covers the Wav2Letter flagship (86-97% of practical
bf16 peak). The Jasper family is a different roofline mix — depthwise
convs are VPU/HBM work, pointwise convs are MXU work — so its achieved
TFLOPS needs its own measurement before any kernel effort is justified.

Counts exact model FLOPs from the block spec (depthwise 2·T·K·C,
pointwise/full 2·T·K·Cin·Cout, residual 1×1 panes, head) at the real
post-frontend frame count, then times forward and forward+backward as
whole jitted programs (scalar-fetch sync; per docs/ROADMAP.md
methodology). Writes benchmarks/jasper_train_breakdown.json.

    python benchmarks/jasper_train_breakdown.py [--model quartznet]
                                                [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = 8
SR = 16000
STEPS = 10


def count_block_flops(blocks, t_in: int, c_in: int, batch: int,
                      num_labels: int):
    """Exact fwd FLOPs of the Jasper encoder + head (models/jasper.py
    geometry: repeat×(conv→norm→act), separable = depthwise+pointwise,
    residual 1×1 panes from the block input)."""
    flops, t, cin = 0, t_in, c_in
    for b in blocks:
        cout = int(b['layer_size'])
        k = int(b['kernel_size'])
        reps = int(b.get('repeat', 1))
        stride = int(b.get('stride', 1))
        dense = bool(b.get('dense_residual', False))
        block_in = cin
        for r in range(reps):
            s = stride if r == 0 else 1
            t = t // s
            if bool(b.get('separable', False)):
                flops += 2 * batch * t * k * cin          # depthwise
                flops += 2 * batch * t * cin * cout       # pointwise 1x1
            else:
                flops += 2 * batch * t * k * cin * cout
            cin = cout
        if bool(b.get('residual', True)):
            # one 1x1 conv per residual pane (dense: every prior pane)
            n_panes = 1 if not dense else 1  # config uses single-pane adds
            flops += 2 * batch * t * block_in * cout * n_panes
        cin = cout
    flops += 2 * batch * t * cin * num_labels             # 1x1 head
    return flops, t


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--model', choices=['jasper', 'quartznet'],
                   default='jasper')
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--compute-dtype', default=None,
                   help='override model.compute_dtype (e.g. bf16)')
    p.add_argument('--remat', action='store_true',
                   help='block-level rematerialization (model.remat=true): '
                        'backward recomputes each block forward instead of '
                        're-loading saved intermediates from HBM')
    args = p.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas
    from wav2letter_pytorch_tpu.training import (build_frontend, build_labels,
                                                 build_model)
    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean

    n_blocks = {'jasper': 15, 'quartznet': 18}[args.model]
    overrides = ['data.train_manifest=u', 'data.val_manifest=u',
                 f'model={args.model}', f'model.mid_layers={n_blocks}']
    if args.compute_dtype:
        overrides.append(f'model.compute_dtype={args.compute_dtype}')
    if args.remat:
        overrides.append('+model.remat=true')
    cfg = load_config(overrides)
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)

    B = args.batch
    rng = np.random.default_rng(0)
    t_samples = SECONDS * SR
    audio = (rng.standard_normal((B, t_samples)) * 0.1).astype(np.float32)
    audio_lengths = np.full((B,), t_samples, np.int32)
    targets = rng.integers(1, 29, size=(B, 128)).astype(np.int32)
    targets[:, 100:] = 0
    target_lengths = np.full((B,), 100, np.int32)
    batch_mask = np.ones((B,), np.float32)

    feats, flens = jax.jit(frontend)(audio, audio_lengths)
    feats = jax.block_until_ready(feats)
    blocks = [dict(b) for b in cfg.model.jasper_blocks][:n_blocks]
    fwd_flops, t_out = count_block_flops(
        blocks, feats.shape[1], feats.shape[2], B, len(labels))
    fwd_tflop = fwd_flops / 1e12

    variables = jax.jit(lambda r, f, fl: model.init(r, f, fl,
                                                    train=False))(
        jax.random.PRNGKey(0), feats, flens)
    params = variables['params']
    stats = variables.get('batch_stats', {})
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    def timeit(fn, *a):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*a)
        _sync(out)
        return (time.perf_counter() - t0) / STEPS

    @jax.jit
    def fwd_loss(params, feats, flens):
        (out, out_lens), _ = model.apply(
            {'params': params, 'batch_stats': stats}, feats, flens,
            train=True, rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        return masked_ctc_mean(out, out_lens, targets, target_lengths,
                               batch_mask, ctc_loss_pallas)

    results = {'model': f'{args.model}-{n_blocks}', 'batch': B,
               'params_m': round(n_params / 1e6, 1),
               'fwd_tflop_per_batch': round(fwd_tflop, 3),
               'frames_in': int(feats.shape[1]), 'frames_out': int(t_out)}
    dt = timeit(fwd_loss, params, feats, flens)
    results['fwd_ms'] = round(dt * 1e3, 2)
    results['fwd_tflops'] = round(fwd_tflop / dt, 1)

    grad_fn = jax.jit(jax.value_and_grad(fwd_loss))
    dt = timeit(grad_fn, params, feats, flens)
    results['fwd_bwd_ms'] = round(dt * 1e3, 2)
    results['fwd_bwd_tflops'] = round(3 * fwd_tflop / dt, 1)
    results['fwd_bwd_utt_per_sec'] = round(B / dt, 1)
    # practical bf16 matmul peak measured on this chip
    # (benchmarks/peak_flops.py)
    results['pct_of_practical_peak'] = round(
        100 * 3 * fwd_tflop / dt / 162.6, 1)

    print(json.dumps(results))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'jasper_train_breakdown.json')
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    key = f"{args.model}_b{B}" + (
        f"_{args.compute_dtype}" if args.compute_dtype else '') + (
        '_remat' if args.remat else '')
    existing[key] = results
    with open(out_path, 'w') as f:
        json.dump(existing, f, indent=1)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
