#!/usr/bin/env python
"""Multi-chip scaling benchmark: training + serving over mesh sizes.

Measures, at data-mesh sizes {1,2,4,8,...}: (a) utt/s of the full jitted
SPMD training step (frontend + conv stack + CTC + optimizer, gradient
all-reduce over ICI), (b) utt/s of batched ``MeshInference`` serving, and
(c) real-time stream capacity of the mesh-sharded ``StreamMultiplexer``
(slot axis sharded across chips, zero collectives), with per-chip scaling
efficiency relative to the 1-device point.

Ready to run UNCHANGED the moment multi-chip hardware exists:

    python benchmarks/scaling.py                      # all visible chips
    python benchmarks/scaling.py --mesh-sizes 1,4,8

In this environment only one real TPU chip is visible (SURVEY.md §2.3), so
mesh sizes beyond the visible device count are skipped unless ``--cpu-smoke``
forces an 8-virtual-device CPU mesh (tiny shapes; validates that the sharded
programs compile and execute at every mesh size, not the throughput):

    python benchmarks/scaling.py --cpu-smoke

Timing method per docs/ROADMAP.md: warmup first (XLA compile excluded),
scalar-fetch sync (block_until_ready does not block through the device
tunnel), whole dependent chains only. Writes benchmarks/scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def _make_batch(batch: int, seconds: float, rng):
    t = int(seconds * SR)
    return dict(
        audio=(rng.standard_normal((batch, t)) * 0.1).astype(np.float32),
        audio_lengths=np.full((batch,), t, np.int32),
        targets=np.where(np.arange(64)[None, :] < 48,
                         rng.integers(1, 29, size=(batch, 64)),
                         0).astype(np.int32),
        target_lengths=np.full((batch,), 48, np.int32),
        batch_mask=np.ones((batch,), np.float32),
    )


def bench_train(n: int, args, cfg_overrides, rng):
    """utt/s of the jitted training step over an n-device data mesh."""
    import jax
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.parallel import shard_batch
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model, build_optimizer)

    cfg = load_config(cfg_overrides + [f'trainer.mesh.data={n}'])
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model)
    optimizer, schedule = build_optimizer(cfg.model, steps_per_epoch=1000,
                                          total_steps=5000)
    trainer = Trainer(cfg, model, frontend, optimizer, schedule,
                      build_decoder(cfg.model, labels),
                      run_dir='/tmp/w2l_scaling')
    batch = _make_batch(args.batch_per_chip * n, args.seconds, rng)
    trainer.init_state(batch)
    device_batch = shard_batch(batch, trainer.mesh)
    step = trainer._get_jitted('train')
    for _ in range(args.warmup):
        trainer.state, loss, _, _ = step(trainer.state, device_batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainer.state, loss, _, _ = step(trainer.state, device_batch)
    float(loss)
    dt = time.perf_counter() - t0
    return args.batch_per_chip * n * args.steps / dt


def bench_infer(n: int, args, cfg_overrides, rng):
    """utt/s of MeshInference batched serving over an n-device mesh."""
    import jax
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.parallel import make_mesh
    from wav2letter_pytorch_tpu.serving import MeshInference, fold_batchnorm
    from wav2letter_pytorch_tpu.training import (build_frontend, build_labels,
                                                 build_model)

    cfg = load_config(cfg_overrides)
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)
    layers = [dict(l) for l in cfg.model.layers][:cfg.model.mid_layers]

    batch = args.infer_batch_per_chip * n
    t = int(args.seconds * SR)
    audio = (rng.standard_normal((batch, t)) * 0.1).astype(np.float32)
    lengths = np.full((batch,), t, np.int32)
    feats, flens = frontend(audio[:1], lengths[:1])
    variables = jax.device_get(jax.jit(
        lambda f, l: model.init(jax.random.PRNGKey(0), f, l,
                                train=False))(feats, flens))
    folded = fold_batchnorm(variables, len(layers))
    mi = MeshInference(layers, folded, frontend, mesh=make_mesh(n),
                      padding_mode=str(getattr(cfg.model, 'padding_mode',
                                               'reflect')))
    for _ in range(args.warmup):
        logp, _ = mi.logprobs(audio, lengths)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        logp, _ = mi.logprobs(audio, lengths)
    dt = time.perf_counter() - t0
    return batch * args.steps / dt


def bench_stream(n: int, args, cfg_overrides, rng):
    """Streams-per-mesh supportable in real time: mesh-sharded
    StreamMultiplexer tick time vs the chunk's audio duration."""
    import jax
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.parallel import make_mesh
    from wav2letter_pytorch_tpu.serving import (StreamingWav2Letter,
                                                StreamMultiplexer)
    from wav2letter_pytorch_tpu.training import (build_frontend, build_labels,
                                                 build_model)

    cfg = load_config(cfg_overrides)
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)
    layers = [dict(l) for l in cfg.model.layers][:cfg.model.mid_layers]
    t = int(args.seconds * SR)
    audio = (rng.standard_normal((1, t)) * 0.1).astype(np.float32)
    feats, flens = frontend(audio, np.array([t], np.int32))
    variables = jax.device_get(jax.jit(
        lambda f, l: model.init(jax.random.PRNGKey(0), f, l,
                                train=False))(feats, flens))
    n_mels = feats.shape[-1]
    stats = (np.zeros(n_mels, np.float32), np.ones(n_mels, np.float32))
    sw = StreamingWav2Letter(
        layers, len(labels), variables, frontend,
        chunk_frames=args.chunk_frames, norm='precomputed',
        norm_stats=stats,
        padding_mode=str(getattr(cfg.model, 'padding_mode', 'reflect')))

    slots = args.streams_per_chip * n
    mux = StreamMultiplexer(sw, slots=slots, labels=labels,
                            mesh=make_mesh(n))
    cs, ps = sw.chunk_samples, sw.prime_samples
    for _ in range(slots):
        s = mux.attach()
        mux.feed(s, (rng.standard_normal(ps) * 0.1).astype(np.float32))

    def one_tick():
        chunk = (rng.standard_normal(cs) * 0.1).astype(np.float32)
        for s in range(slots):
            mux.feed(s, chunk)
        mux.tick()

    for _ in range(args.warmup):
        one_tick()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        one_tick()
    dt = (time.perf_counter() - t0) / args.steps
    chunk_seconds = cs / SR
    # real-time streams the mesh supports = slots x (chunk time / tick time)
    return slots * chunk_seconds / dt


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--mesh-sizes', default='1,2,4,8')
    parser.add_argument('--mode',
                        choices=['train', 'infer', 'stream', 'both', 'all'],
                        default='all',
                        help="'both' = train+infer (pre-stream-mode name)")
    parser.add_argument('--batch-per-chip', type=int, default=32)
    parser.add_argument('--infer-batch-per-chip', type=int, default=32)
    parser.add_argument('--streams-per-chip', type=int, default=16)
    parser.add_argument('--chunk-frames', type=int, default=64)
    parser.add_argument('--seconds', type=float, default=8.0)
    parser.add_argument('--warmup', type=int, default=2)
    parser.add_argument('--steps', type=int, default=8)
    parser.add_argument('--mid-layers', type=int, default=20)
    parser.add_argument('--cpu-smoke', action='store_true',
                        help='force an 8-virtual-device CPU mesh with tiny '
                             'shapes (compile/execute validation only)')
    parser.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'scaling.json'))
    args = parser.parse_args(argv)

    if args.cpu_smoke:
        from __graft_entry__ import _ensure_devices
        _ensure_devices(8)
        args.batch_per_chip = min(args.batch_per_chip, 2)
        args.infer_batch_per_chip = min(args.infer_batch_per_chip, 2)
        args.streams_per_chip = min(args.streams_per_chip, 2)
        args.chunk_frames = min(args.chunk_frames, 16)
        args.seconds = min(args.seconds, 0.4)
        args.warmup, args.steps = 1, 2
        args.mid_layers = min(args.mid_layers, 2)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax

    visible = len(jax.devices())
    sizes = sorted({int(s) for s in args.mesh_sizes.split(',')})
    skipped = [s for s in sizes if s > visible]
    sizes = [s for s in sizes if s <= visible]
    if skipped:
        print(f'# skipping mesh sizes {skipped}: only {visible} '
              f'device(s) visible')

    cfg_overrides = [
        'data.train_manifest=unused', 'data.val_manifest=unused',
        f'model.mid_layers={args.mid_layers}',
        'trainer.string_metrics_interval=0',
    ]
    rng = np.random.default_rng(0)
    results = {
        'workload': f'w2l-{args.mid_layers}, {args.seconds}s utterances, '
                    f'batch/chip train={args.batch_per_chip} '
                    f'infer={args.infer_batch_per_chip}',
        'platform': jax.default_backend(),
        'cpu_smoke': bool(args.cpu_smoke),
        'mesh_sizes': sizes,
        'train': {}, 'infer': {}, 'stream': {},
    }
    units = {'train': 'utt/s', 'infer': 'utt/s',
             'stream': 'real-time streams'}
    for kind, fn in (('train', bench_train), ('infer', bench_infer),
                     ('stream', bench_stream)):
        if args.mode != 'all' and args.mode != kind and not (
                args.mode == 'both' and kind in ('train', 'infer')):
            continue
        for n in sizes:
            utt_s = fn(n, args, cfg_overrides, rng)
            results[kind][str(n)] = round(utt_s, 2)
            print(f'{kind} mesh={n}: {utt_s:.2f} {units[kind]} '
                  f'({utt_s / n:.2f}/chip)')
        base = results[kind].get('1')
        if base:
            results[f'{kind}_scaling_efficiency'] = {
                str(n): round(results[kind][str(n)] / (base * n), 3)
                for n in sizes}
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
