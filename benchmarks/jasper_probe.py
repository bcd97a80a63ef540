#!/usr/bin/env python
"""Microbenchmark: where does the Jasper separable-conv step's time go?

Times the individual ops of one Jasper repeat-unit (mask -> depthwise ->
pointwise -> BN -> ReLU) in isolation on the real chip, each wrapped in an
in-jit fori_loop so the ~3.6 ms tunnel dispatch overhead amortizes away
(docs/ROADMAP.md methodology). This tells us whether the 19%-of-peak
jasper step (jasper_train_breakdown.json) is bound by the depthwise conv's
lowering, the pointwise GEMM size, or the elementwise/norm traffic, and
measures the chip's practical VPU FIR throughput to roofline any Pallas
depthwise kernel before writing it.

    python benchmarks/jasper_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_looped(fn, x, iters):
    """Time fn applied iters times inside one jit dispatch (chained)."""
    import jax

    @jax.jit
    def run(x):
        # Unrolled dependency chain: no while-loop per-iteration overhead
        # (measured ~0.25 ms/iter through this runtime), pure back-to-back
        # kernels.
        for _ in range(iters):
            x = fn(x)
        return x

    x = jax.device_put(x)  # input transfer over the tunnel must not be timed
    out = run(x)
    float(out.ravel()[0])  # scalar fetch (not a full-array tunnel transfer)
    t0 = time.perf_counter()
    out = run(x)
    float(out.ravel()[0])
    dt = time.perf_counter() - t0
    return dt / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--t', type=int, default=400)
    args = p.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    B, T = args.batch, args.t
    results = {}

    for C, K in [(256, 33), (512, 51), (512, 75)]:
        rng = np.random.default_rng(0)
        x32 = rng.standard_normal((B, T, C)).astype(np.float32) * 0.1
        wdw = rng.standard_normal((K, 1, C)).astype(np.float32) * 0.1
        wpw = rng.standard_normal((1, C, C)).astype(np.float32) * 0.05

        dn = jax.lax.conv_dimension_numbers(x32.shape, (K, 1, C),
                                            ('NHC', 'HIO', 'NHC'))

        def dw(x, w=wdw, dnn=dn, k=K, c=C):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(w), window_strides=(1,),
                padding=[(k // 2, k // 2)], dimension_numbers=dnn,
                feature_group_count=c)

        def pw(x, w=wpw, dnn=dn):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(w), window_strides=(1,), padding=[(0, 0)],
                dimension_numbers=dnn)

        def gemm(x, w=wpw):
            return x @ jnp.asarray(w)[0]

        key = f'C{C}_K{K}'
        r = {}
        dt = timeit_looped(dw, x32, args.iters)
        r['depthwise_ms'] = round(dt * 1e3, 3)
        r['depthwise_gflops'] = round(2 * B * T * K * C / dt / 1e9, 1)
        dt = timeit_looped(pw, x32, args.iters)
        r['pointwise_ms'] = round(dt * 1e3, 3)
        r['pointwise_tflops'] = round(2 * B * T * C * C / dt / 1e12, 1)
        dt = timeit_looped(gemm, x32, args.iters)
        r['gemm_ms'] = round(dt * 1e3, 3)
        r['gemm_tflops'] = round(2 * B * T * C * C / dt / 1e12, 1)

        # bf16 variants
        xb = x32.astype(jnp.bfloat16)
        dt = timeit_looped(functools.partial(
            lambda x, w, dnn, k, c: jax.lax.conv_general_dilated(
                x, jnp.asarray(w, jnp.bfloat16), window_strides=(1,),
                padding=[(k // 2, k // 2)], dimension_numbers=dnn,
                feature_group_count=c),
            w=wdw, dnn=dn, k=K, c=C), xb, args.iters)
        r['depthwise_bf16_ms'] = round(dt * 1e3, 3)
        dt = timeit_looped(functools.partial(
            lambda x, w: x @ jnp.asarray(w, jnp.bfloat16)[0], w=wpw),
            xb, args.iters)
        r['gemm_bf16_ms'] = round(dt * 1e3, 3)
        r['gemm_bf16_tflops'] = round(2 * B * T * C * C / dt / 1e12, 1)

        # elementwise chain: mask + BN-apply + relu (inference-style math,
        # one pass) — pure HBM probe at this tensor size
        mask = (np.arange(T)[None, :, None] < T - 5).astype(np.float32)
        scale = rng.standard_normal((C,)).astype(np.float32)

        def ew(x, m=jnp.asarray(mask), s=jnp.asarray(scale)):
            return jax.nn.relu((x * m) * s + 0.1)

        dt = timeit_looped(ew, x32, args.iters)
        r['elementwise_ms'] = round(dt * 1e3, 3)
        r['elementwise_gbps'] = round(2 * x32.nbytes / dt / 1e9, 1)
        results[key] = r
        print(key, json.dumps(r), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'jasper_probe.json')
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
