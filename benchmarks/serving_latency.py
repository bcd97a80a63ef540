#!/usr/bin/env python
"""Serving latency on the ambient accelerator (run on the real TPU chip).

Measures the inference paths a deployment actually serves:

* offline batch-1, 8 s utterance: the training module (separate BN op),
  the BN-folded fused forward, and the int8 weight-only forward — batch-1
  is HBM-bound on the 153 M-param flagship, so folding and int8 target the
  weight-read bytes;
* streaming: steady-state per-chunk step latency of a 640 ms-chunk
  StreamingWav2Letter session (f32 and int8) and the implied real-time
  factor per stream.

Through the axon tunnel every dispatch carries a fixed ~1-3.6 ms overhead
(docs/ROADMAP.md); the dispatch floor is measured and reported so on-chip
time can be read separately. Prints one JSON line and writes
benchmarks/serving_latency.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = 8
SR = 16000
REPS = 30
CHUNK_FRAMES = 64   # 640 ms


def _timeit(fn, sync, reps=REPS, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.serving import (StreamingWav2Letter,
                                                fold_batchnorm,
                                                offline_forward,
                                                offline_forward_q8,
                                                quantize_folded,
                                                quantized_bytes)
    from wav2letter_pytorch_tpu.training import (build_frontend,
                                                 build_labels, build_model)

    cfg = load_config(['data.train_manifest=unused',
                       'data.val_manifest=unused', 'model.mid_layers=20'])
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)
    layers = [dict(l) for l in cfg.model.layers][:cfg.model.mid_layers]

    rng = np.random.default_rng(0)
    t_samples = SECONDS * SR
    audio = (rng.standard_normal((1, t_samples)) * 0.1).astype(np.float32)
    lengths = np.array([t_samples], np.int32)
    feats, flens = frontend(audio, lengths)
    variables = jax.jit(lambda f, l: model.init(jax.random.PRNGKey(0), f, l,
                                                train=False))(feats, flens)
    variables = jax.device_get(variables)

    folded = fold_batchnorm(variables, len(layers))
    folded_q = quantize_folded(folded)
    f32_bytes = sum(w.nbytes + b.nbytes for w, b in folded)

    # Fixed per-dispatch tunnel/runtime overhead (subtract mentally, not
    # numerically — reported raw).
    tiny = jax.jit(lambda x: x + 1.0)
    dispatch_ms = _timeit(lambda: tiny(jnp.zeros(())), lambda o: float(o),
                          reps=30) * 1e3

    dfeats = jax.device_put(feats)

    # Weights/variables as jit args (device-resident), never closure
    # constants: 600 MB baked into the HLO exceeds the tunnel's compile
    # request limit and bloats compile time everywhere.
    def run_path(name, fold):
        f = jax.jit(lambda fd, x: offline_forward(layers, fd, x)[0])
        dfold = jax.device_put([tuple(a for a in wb) for wb in fold])
        return _timeit(lambda: f(dfold, dfeats),
                       lambda o: float(o[0, 0, 0])) * 1e3

    apply_fn = jax.jit(
        lambda v, f, l: model.apply(v, f, l, train=False)[0])
    dvars = jax.device_put(variables)
    dlens = jax.device_put(jnp.asarray(flens))
    ms_apply = _timeit(lambda: apply_fn(dvars, dfeats, dlens),
                       lambda o: float(o[0, 0, 0])) * 1e3
    ms_folded = run_path('folded', folded)
    ms_int8 = run_path('int8', folded_q)

    # Streaming steady-state step: single stream (latency) and a
    # 16-stream batch (concurrent real-time capacity per chip).
    stream = {}
    for mode, w in (('f32', 'f32'), ('int8', 'int8'),
                    ('int8_full', 'int8_full')):
        sw = StreamingWav2Letter(layers, len(labels), variables, frontend,
                                 chunk_frames=CHUNK_FRAMES, weights=w)
        stream[mode] = {
            'chunk_ms_audio': CHUNK_FRAMES * 10,
            'prime_s': round(sw.prime_samples / SR, 2),
            'lookahead_s': round(sw.lookahead_frames * 0.01, 2),
        }
        for B in (1, 16):
            sess = sw.start(B)
            prime = (rng.standard_normal((B, sw.prime_samples)) * 0.1) \
                .astype(np.float32)
            sess.feed(prime)
            chunk = (rng.standard_normal((B, sw.chunk_samples)) * 0.1) \
                .astype(np.float32)
            state = sess._state
            weights = sw._weights_dev
            dchunk = jax.device_put(chunk)

            # K chained steps per dispatch: per-call timings at this
            # latency scale mostly measure the device-tunnel RTT
            # (docs/ROADMAP.md methodology) — amortize it 50x to report
            # the per-step DEVICE time.
            K = 50
            scan_fn = jax.jit(lambda w_, s_, c_: jax.lax.scan(
                lambda st, _: (sw._step(w_, st, c_)[0], 0), s_, None,
                length=K))
            ms = _timeit(lambda: scan_fn(weights, state, dchunk),
                         lambda o: float(o[0].norm_count[0]),
                         reps=4) * 1e3 / K
            stream[mode][f'step_ms_b{B}'] = round(ms, 3)
            stream[mode][f'rtf_b{B}'] = round(ms / (CHUNK_FRAMES * 10), 4)
            # Real-time streams one chip sustains at this batch width
            # (device compute bound; add one runtime dispatch per chunk
            # cadence in deployment).
            stream[mode][f'streams_per_chip_b{B}'] = int(
                B * CHUNK_FRAMES * 10 / ms)

    # Bounded-lookahead streaming (serving/lookahead.py): commit after
    # 0.96 s of future context instead of the full 4.2 s receptive field.
    # Latency = chunk cadence + lookahead + window compute; the window
    # program recomputes [left | chunk | la] per chunk, so the compute
    # overhead factor vs offline is window/chunk.
    from wav2letter_pytorch_tpu.serving.lookahead import (
        BoundedLookaheadStreamer, _conv_specs_w2l)
    LA = 96
    bla = BoundedLookaheadStreamer(model, variables, frontend,
                                   _conv_specs_w2l(layers),
                                   chunk_frames=CHUNK_FRAMES,
                                   lookahead_frames=LA)
    wfeats = jax.device_put((rng.standard_normal(
        (1, bla.window_frames, feats.shape[2])) * 0.1).astype(np.float32))
    wvars = bla._variables_dev
    K = 20

    # Weights/features must be ARGUMENTS: closing over them embeds the
    # 153 M params as HLO constants and the tunnel's remote-compile
    # rejects the oversized request body (HTTP 413).
    def chain_windows(c0, v, f):
        def body(c, _):
            o = bla._win_fn(v, f * (1 + c * 1e-12))
            return c + o[0, 0, 0] * 1e-12, None
        return jax.lax.scan(body, c0, None, length=K)[0]

    cw = jax.jit(chain_windows)
    ms_win = _timeit(lambda: cw(jnp.float32(0.0), wvars, wfeats),
                     lambda o: float(o), reps=4) * 1e3 / K
    stream['bounded_lookahead_f32'] = {
        'lookahead_s': round(LA * 0.01, 2),
        'chunk_ms_audio': CHUNK_FRAMES * 10,
        'window_frames': bla.window_frames,
        'window_compute_ms': round(ms_win, 3),
        'compute_overhead_vs_offline':
            round(bla.window_frames / CHUNK_FRAMES, 1),
        'worst_commit_latency_s': round(
            (CHUNK_FRAMES + LA) * 0.01 + ms_win / 1e3, 3),
        'streams_per_chip': int(CHUNK_FRAMES * 10 / ms_win),
    }

    # Batched offline inference throughput (the transcription-service
    # regime): 32 x 8 s utterances per dispatch through the folded path.
    B32 = 32
    feats32 = np.repeat(np.asarray(feats), B32, axis=0)
    dfeats32 = jax.device_put(feats32)
    tput = {}
    from wav2letter_pytorch_tpu.serving import calibrate_activation_scales
    cal_audio = (rng.standard_normal((4, t_samples)) * 0.1) \
        .astype(np.float32)
    act_scales = calibrate_activation_scales(
        layers, folded, frontend, cal_audio, np.full(4, t_samples))

    def q8_static(ls, w, f, fl=None, **kw):
        return offline_forward_q8(ls, w, f, fl, act_scales=act_scales)

    paths = (('f32', folded, offline_forward),
             ('int8_weights', folded_q, offline_forward),
             ('int8_full', folded_q, offline_forward_q8),
             ('int8_full_static', folded_q, q8_static))
    for name, fold, fwd in paths:
        f = jax.jit(lambda fd, x, fwd=fwd: fwd(layers, fd, x)[0])
        dfold = jax.device_put([tuple(a for a in wb) for wb in fold])
        ms = _timeit(lambda: f(dfold, dfeats32),
                     lambda o: float(o[0, 0, 0]), reps=10) * 1e3
        tput[name] = {'batch': B32, 'ms_per_batch': round(ms, 2),
                      'utt_per_sec': round(B32 / (ms / 1e3), 1),
                      'audio_sec_per_sec': round(
                          B32 * SECONDS / (ms / 1e3), 0)}

    out = {
        'metric': 'serving_latency_w2l20',
        'batch1_offline_8s_ms': {
            'train_module': round(ms_apply, 2),
            'bn_folded': round(ms_folded, 2),
            'int8_weight_only': round(ms_int8, 2),
        },
        'offline_throughput': tput,
        'weight_bytes': {'f32': f32_bytes,
                         'int8': quantized_bytes(folded_q)},
        'streaming': stream,
        'dispatch_floor_ms': round(dispatch_ms, 3),
        'device': str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'serving_latency.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
