#!/usr/bin/env python
"""Stream one audio file through the serving path, printing the transcript
incrementally with per-chunk latency and word timings.

    python scripts/stream_demo.py --model-path <run_dir> --wav utt.wav
    python scripts/stream_demo.py --model-path <run_dir> --synthetic 6 \
        --chunk-frames 64 --int8 --realtime

``--realtime`` sleeps between chunks to simulate a live microphone feed;
without it the stream is pushed as fast as the chip drains it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description='Streaming ASR demo')
    parser.add_argument('--model-path', required=True)
    parser.add_argument('--wav', default='', help='audio file to stream')
    parser.add_argument('--synthetic', type=float, default=0.0,
                        help='stream N seconds of synthetic audio instead')
    parser.add_argument('--chunk-frames', type=int, default=64)
    parser.add_argument('--int8', action='store_true')
    parser.add_argument('--realtime', action='store_true')
    args = parser.parse_args(argv)

    import jax
    from wav2letter_pytorch_tpu.serving import (StreamingJasper,
                                                StreamingTranscriber,
                                                StreamingWav2Letter)
    from wav2letter_pytorch_tpu.training import load_run

    cfg, trainer, model, frontend, labels = load_run(args.model_path)
    sr = int(cfg.model.audio_conf.sample_rate)
    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}

    weights = 'int8' if args.int8 else 'f32'
    if str(cfg.model.name) == 'jasper':
        blocks = [dict(b) for b in
                  cfg.model.jasper_blocks][:int(cfg.model.mid_layers)]
        sw = StreamingJasper(blocks, len(labels), variables, frontend,
                             chunk_frames=args.chunk_frames, weights=weights)
    else:
        layers = [dict(l) for l in
                  cfg.model.layers][:int(cfg.model.mid_layers)]
        sw = StreamingWav2Letter(
            layers, len(labels), variables, frontend,
            chunk_frames=args.chunk_frames, weights=weights,
            padding_mode=cfg.model.get('padding_mode', 'reflect'))
    hop_ms = float(cfg.model.audio_conf.window_stride) * 1e3
    print(f'prime {sw.prime_samples / sr:.2f}s | chunk '
          f'{args.chunk_frames * hop_ms:.0f} ms | lookahead '
          f'{sw.lookahead_frames * hop_ms / 1e3:.2f}s', file=sys.stderr)

    if args.wav:
        from wav2letter_pytorch_tpu.data.audio_io import load_audio
        audio = np.asarray(load_audio(args.wav), np.float32)
    elif args.synthetic:
        t = np.arange(int(args.synthetic * sr)) / sr
        audio = (0.3 * np.sin(2 * np.pi * 300 * t)
                 + 0.05 * np.random.default_rng(0).standard_normal(t.shape)) \
            .astype(np.float32)
    else:
        raise SystemExit('pass --wav or --synthetic')

    sess = sw.start(1)
    tr = StreamingTranscriber(sess, labels)
    chunk = sw.chunk_samples
    chunk_audio_ms = chunk / sr * 1e3
    lat = []
    for s in range(0, len(audio), chunk):
        piece = audio[None, s:s + chunk]
        t0 = time.perf_counter()
        fresh = tr.feed(piece)
        dt = (time.perf_counter() - t0) * 1e3
        if s >= sw.prime_samples:
            lat.append(dt)
        if fresh[0]:
            print(f'[{s / sr:6.2f}s +{dt:5.1f}ms] {fresh[0]!r}')
        if args.realtime:
            time.sleep(max(0.0, piece.shape[1] / sr - dt / 1e3))
    t0 = time.perf_counter()
    final = tr.finish(np.array([len(audio)]))
    fin_ms = (time.perf_counter() - t0) * 1e3
    print(f'final   (+{fin_ms:5.1f}ms): {final[0]!r}')
    frame_seconds = float(cfg.model.audio_conf.window_stride) \
        * model.scaling_factor
    times = tr.word_timings(frame_seconds)[0]
    if times:
        print('timings : ' + ' '.join(f'{w}[{a:.2f}-{b:.2f}]'
                                      for w, a, b in times))
    if lat:
        print(f'steady-state chunk latency: median '
              f'{np.median(lat):.1f} ms / p95 '
              f'{np.percentile(lat, 95):.1f} ms for '
              f'{chunk_audio_ms:.0f} ms audio chunks '
              f'(RTF {np.median(lat) / chunk_audio_ms:.4f})',
              file=sys.stderr)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
