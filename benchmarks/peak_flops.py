#!/usr/bin/env python
"""Measure the chip's practical bf16 matmul peak (chained 8k x 8k matmuls
inside one jit, so device-tunnel dispatch amortizes) and the per-dispatch
overhead of the ambient runtime. Calibrates speed-of-light targets for
bench.py (docs/ROADMAP.md)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8192
CHAIN = 16
REPS = 5


def main():
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).standard_normal((N, N)),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((N, N)) * 1e-2,
                    jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, a, None, length=CHAIN)
        return jnp.float32(c[0, 0])

    out = chain(a, b)
    float(out)  # compile + sync (block_until_ready doesn't block the tunnel)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = chain(a, b)
    float(out)
    dt = (time.perf_counter() - t0) / REPS
    flops = 2 * N * N * N * CHAIN
    tflops = flops / dt / 1e12

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(())
    x = tiny(x)
    float(x)
    t0 = time.perf_counter()
    K = 30
    for _ in range(K):
        x = tiny(x)
    float(x)
    dispatch_ms = (time.perf_counter() - t0) / K * 1e3

    print(json.dumps({
        'matmul_bf16_peak_tflops': round(tflops, 1),
        'chain_ms': round(dt * 1e3, 2),
        'dispatch_ms_per_jit_call': round(dispatch_ms, 2),
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
