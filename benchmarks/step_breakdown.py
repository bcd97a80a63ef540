#!/usr/bin/env python
"""Decompose the flagship train step on the real chip.

Times (a) the full jitted train step, (b) frontend only, (c) model forward
only, (d) model value_and_grad, and dtype/padding variants — all as FULL
jitted programs (per round-1 findings, single-layer micro-benchmarks through
the device tunnel do not reflect in-model costs; whole-graph timings do).
Prints one JSON line per variant with achieved model TFLOPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
SECONDS = 8
SR = 16000
STEPS = 10


def main():
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.training import (build_frontend, build_labels,
                                                 build_model)
    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean
    from wav2letter_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas

    rng = np.random.default_rng(0)
    t_samples = SECONDS * SR
    audio = (rng.standard_normal((BATCH, t_samples)) * 0.1).astype(np.float32)
    audio_lengths = np.full((BATCH,), t_samples, np.int32)
    targets = rng.integers(1, 29, size=(BATCH, 128)).astype(np.int32)
    targets[:, 100:] = 0
    target_lengths = np.full((BATCH,), 100, np.int32)
    batch_mask = np.ones((BATCH,), np.float32)

    def timeit(fn, *args):
        out = fn(*args)          # compile
        jax.tree.map(lambda a: a, out)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / STEPS, out

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    results = {}

    def report(name, dt, model_tflop=None):
        row = {'variant': name, 'ms': round(dt * 1e3, 2)}
        if model_tflop:
            row['achieved_tflops'] = round(model_tflop / dt, 1)
        results[name] = row
        print(json.dumps(row), flush=True)

    for variant, overrides in [
        ('f32_reflect', []),
        ('bf16_reflect', ['model.compute_dtype=bf16']),
        ('f32_zeros', ['model.padding_mode=zeros']),
        ('bf16_zeros', ['model.compute_dtype=bf16',
                        'model.padding_mode=zeros']),
    ]:
        cfg = load_config(['data.train_manifest=u', 'data.val_manifest=u',
                           'model.mid_layers=20'] + overrides)
        labels = build_labels(cfg.model)
        model = build_model(cfg.model, num_labels=len(labels))
        frontend = build_frontend(cfg.model, dither=0.0)

        feats, flens = jax.jit(frontend)(audio, audio_lengths)
        feats = jax.block_until_ready(feats)
        T_in = feats.shape[1]

        # model FLOPs (fwd) from the real layer spec + real frame count
        specs = [dict(l) for l in cfg.model.layers[:20]]
        fwd_flops, t, cin = 0, T_in, feats.shape[2]
        for l in specs:
            t = t // int(l.get('stride', 1))
            fwd_flops += 2 * BATCH * t * int(l['kernel_size']) * cin * \
                int(l['output_size'])
            cin = int(l['output_size'])
        fwd_flops += 2 * BATCH * t * cin * len(labels)
        fwd_tflop = fwd_flops / 1e12

        variables = jax.jit(lambda r, f, fl: model.init(r, f, fl,
                                                        train=False))(
            jax.random.PRNGKey(0), feats, flens)
        params = variables['params']
        stats = variables.get('batch_stats', {})

        if variant == 'f32_reflect':
            dt, _ = timeit(jax.jit(frontend), audio, audio_lengths)
            report('frontend_only', dt)

        @jax.jit
        def fwd_loss(params, feats, flens):
            (out, out_lens), _ = model.apply(
                {'params': params, 'batch_stats': stats}, feats, flens,
                train=True, rngs={'dropout': jax.random.PRNGKey(1)},
                mutable=['batch_stats'])
            return masked_ctc_mean(out, out_lens, targets, target_lengths,
                                   batch_mask, ctc_loss_pallas)

        dt, _ = timeit(fwd_loss, params, feats, flens)
        report(f'{variant}_fwd', dt, fwd_tflop)

        grad_fn = jax.jit(jax.value_and_grad(fwd_loss))
        dt, _ = timeit(grad_fn, params, feats, flens)
        report(f'{variant}_fwd_bwd', dt, 3 * fwd_tflop)

    with open('/tmp/step_breakdown.json', 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
