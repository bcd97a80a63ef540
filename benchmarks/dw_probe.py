#!/usr/bin/env python
"""Focused on-chip probe: per-op cost of the jasper step's building blocks.

Methodology matters on this runtime: short chains are dominated by a
large, size-independent per-launch overhead (measured 0.3-1 ms even for
kernels inside one jit dispatch through the device tunnel), so every op
is timed as a 100-deep dependent chain inside ONE jit, best of 3 runs.
Cross-check: an elementwise pass over 400 MB reaches ~1.2 TB/s with this
harness while 26 MB reads ~100-200 GB/s — small-tensor numbers still
carry residual overhead and are LOWER BOUNDS on achievable rates.

Times: depthwise conv (XLA grouped lowering vs the Pallas kernel),
pointwise 1x1 GEMM, and a mask+scale+relu elementwise chain, at the
jasper/quartznet block geometries. Writes benchmarks/dw_probe.json.

    python benchmarks/dw_probe.py [--iters 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chain(fn, x, iters: int, repeats: int = 3) -> float:
    import jax

    @jax.jit
    def run(v):
        for _ in range(iters):
            v = fn(v)
        return v

    x = jax.device_put(x)
    out = run(x)
    float(out.ravel()[0])
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(x)
        float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--t', type=int, default=400)
    args = p.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from wav2letter_pytorch_tpu.ops.depthwise_pallas import (
        depthwise_conv1d, depthwise_conv1d_xla)

    B, T = args.batch, args.t
    results = {'iters': args.iters, 'batch': B, 't': T}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'dw_probe.json')

    def record(key, dt, gflops=None, gbps=None):
        row = {'ms': round(dt * 1e3, 3)}
        if gflops is not None:
            row['gflops'] = round(gflops, 1)
        if gbps is not None:
            row['gbps'] = round(gbps, 1)
        results[key] = row
        print(key, json.dumps(row), flush=True)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)
    for C, K in [(256, 33), (512, 51), (512, 75)]:
        x = (rng.standard_normal((B, T, C)) * 0.1).astype(np.float32)
        w = jnp.asarray((rng.standard_normal((K, C)) * 0.1).astype(np.float32))
        p_ = K // 2
        flops = 2 * B * T * K * C

        dt = timeit_chain(
            lambda v, w=w, p2=p_: depthwise_conv1d_xla(v, w, 1, 1,
                                                       p2)[:, :T, :],
            x, args.iters)
        record(f'dw_xla_C{C}_K{K}', dt, gflops=flops / dt / 1e9)

        dt = timeit_chain(
            lambda v, w=w, p2=p_: depthwise_conv1d(v, w, 1, 1,
                                                   p2)[:, :T, :],
            x, args.iters)
        record(f'dw_pallas_C{C}_K{K}', dt, gflops=flops / dt / 1e9)

        wpw = jnp.asarray(
            (rng.standard_normal((C, C)) * 0.05).astype(np.float32))
        dt = timeit_chain(lambda v, w2=wpw: v @ w2, x, args.iters)
        record(f'pw_gemm_C{C}', dt, gflops=2 * B * T * C * C / dt / 1e9)

        s = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))
        dt = timeit_chain(lambda v, s2=s: jax.nn.relu(v * s2 + 0.1), x,
                          args.iters)
        record(f'elementwise_C{C}', dt, gbps=2 * x.nbytes / dt / 1e9)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
