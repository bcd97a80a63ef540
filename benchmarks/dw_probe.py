#!/usr/bin/env python
"""Focused on-chip probe: where does the jasper step's time actually go?

Times, each as a chained in-jit loop (amortizing tunnel dispatch):
  - depthwise conv, XLA grouped-conv lowering
  - depthwise conv, Pallas kernel (ops/depthwise_pallas.py)
  - pointwise 1x1 conv as GEMM (the MXU share)
  - a mask+scale+relu elementwise chain (HBM roofline probe)
Prints one line per measurement immediately (the tunnel can be slow;
partial output must survive a timeout). Writes benchmarks/dw_probe.json.

    python benchmarks/dw_probe.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chain(fn, x, iters):
    import jax

    @jax.jit
    def run(x):
        for _ in range(iters):
            x = fn(x)
        return x

    x = jax.device_put(x)
    out = run(x)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    out = run(x)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=10)
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
    results = {}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'dw_probe.json')

    def record(key, ms, gflops=None, gbps=None):
        row = {'ms': round(ms * 1e3, 3)}
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
        w = (rng.standard_normal((K, C)) * 0.1).astype(np.float32)
        p_ = K // 2
        flops = 2 * B * T * K * C

        dt = timeit_chain(
            lambda v, w=jnp.asarray(w), p2=p_: depthwise_conv1d_xla(
                v, w, 1, 1, p2)[:, :T, :], x, args.iters)
        record(f'dw_xla_C{C}_K{K}', dt, gflops=flops / dt / 1e9)

        dt = timeit_chain(
            lambda v, w=jnp.asarray(w), p2=p_: depthwise_conv1d(
                v, w, 1, 1, p2)[:, :T, :], x, args.iters)
        record(f'dw_pallas_C{C}_K{K}', dt, gflops=flops / dt / 1e9)

        wpw = (rng.standard_normal((C, C)) * 0.05).astype(np.float32)
        dt = timeit_chain(lambda v, w2=jnp.asarray(wpw): v @ w2, x,
                          args.iters)
        record(f'pw_gemm_C{C}', dt,
               gflops=2 * B * T * C * C / dt / 1e9)

        mask = (np.arange(T)[None, :, None] < T - 5).astype(np.float32)
        scale = rng.standard_normal((C,)).astype(np.float32)
        dt = timeit_chain(
            lambda v, m=jnp.asarray(mask), s2=jnp.asarray(scale):
            jax.nn.relu((v * m) * s2 + 0.1), x, args.iters)
        record(f'elementwise_C{C}', dt, gbps=2 * x.nbytes / dt / 1e9)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
