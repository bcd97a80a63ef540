#!/usr/bin/env python
"""Depthwise-conv precision: Pallas kernel vs XLA lowerings vs f64 oracle.

BENCH_r04 shipped `kernel_checks: FAIL` on the four depthwise checks and
VERDICT r4 read it as "the Pallas depthwise backward is numerically wrong
when compiled by Mosaic". This study settles which side of that comparison
was wrong, by measuring BOTH against a float64 host oracle on the exact
gate geometries (scripts/run_tpu_checks.py dw_grid):

  - the Pallas kernel (ops/depthwise_pallas.py): f32 VPU accumulation;
  - XLA `conv_general_dilated(feature_group_count=C)` at default
    precision — the gate's old reference;
  - the same at precision='highest'.

Measured result (TPU v5e, see the JSON): the Pallas kernel lands within
~3e-5 of the oracle on every geometry and direction; XLA's DEFAULT
lowering is off by up to 6.4e-3 (fwd), 4.7e-3 (dx) and 2.6e-1 (dw) on a
geometry-dependent subset — it rounds through bf16 MXU passes, and which
directions do so differs per geometry (e.g. K=87/d=2: fwd bit-exact vs
f32, backward bf16). precision='highest' matches the oracle everywhere.
Conclusion: the kernel was correct; the gate's reference was the
imprecise side. The gate now compares against precision='highest'.

Writes benchmarks/dw_precision_oracle.json. Reference anchor for the op
itself: /root/reference/jasper.py:154-419 (the separable path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def oracle_fwd(x, w, s, d, p):
    """f64 host depthwise conv: y[b,t,c] = sum_k w[k,c] x_pad[b,t*s+k*d,c]."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    B, T, C = x.shape
    K = w.shape[0]
    t_out = (T + 2 * p - d * (K - 1) - 1) // s + 1
    xp = np.pad(x, ((0, 0), (p, p + d * K * s), (0, 0)))
    y = np.zeros((B, t_out, C))
    for k in range(K):
        y += w[k][None, None, :] * xp[:, k * d:k * d + t_out * s:s, :]
    return y


def oracle_grads(x, w, g, s, d, p):
    """f64 host dx, dw for cotangent g (same loss the gate uses)."""
    x64 = np.asarray(x, np.float64)
    w64 = np.asarray(w, np.float64)
    K = w64.shape[0]
    T = x64.shape[1]
    t_out = g.shape[1]
    xp = np.pad(x64, ((0, 0), (p, p + d * K * s), (0, 0)))
    dw = np.zeros_like(w64)
    dxp = np.zeros_like(xp)
    for k in range(K):
        sl = np.s_[:, k * d:k * d + t_out * s:s, :]
        dw[k] = (xp[sl] * g).sum((0, 1))
        dxp[sl] += w64[k][None, None, :] * g
    return dxp[:, p:p + T, :], dw


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'dw_precision_oracle.json'))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from wav2letter_pytorch_tpu.models.jasper import get_same_padding
    from wav2letter_pytorch_tpu.ops.depthwise_pallas import (
        depthwise_conv1d, depthwise_conv1d_xla)

    rng = np.random.default_rng(0)
    dw_grid = [  # (B, T, C, K, stride, dilation) — the gate's grid
        (4, 400, 256, 33, 1, 1),
        (4, 400, 512, 74, 1, 1),
        (4, 801, 64, 33, 2, 1),
        (2, 400, 512, 87, 1, 2),
    ]
    rows = []
    for B, T, C, K, s, d in dw_grid:
        p = get_same_padding(K, s, d)
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((K, C)) * 0.1).astype(np.float32))

        y_o = oracle_fwd(x, w, s, d, p)
        g = np.cos(y_o)  # the gate's sin-loss cotangent
        dx_o, dw_o = oracle_grads(x, w, g, s, d, p)

        def variants():
            yield 'pallas', lambda x, w: depthwise_conv1d(x, w, s, d, p)
            yield 'xla_default', lambda x, w: depthwise_conv1d_xla(
                x, w, s, d, p)
            yield 'xla_highest', lambda x, w: depthwise_conv1d_xla(
                x, w, s, d, p, precision='highest')

        def err(a, b):
            return float(np.abs(np.asarray(a, np.float64) - b).max())

        row = {'B': B, 'T': T, 'C': C, 'K': K, 'stride': s, 'dilation': d}
        for name, fn in variants():
            loss = lambda x, w: jnp.sum(jnp.sin(fn(x, w)))  # noqa: E731
            y = jax.jit(fn)(x, w)
            gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)
            row[name] = {'fwd_vs_oracle': err(y, y_o),
                         'dx_vs_oracle': err(gx, dx_o),
                         'dw_vs_oracle': err(gw, dw_o)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    worst = {v: {k: max(r[v][k] for r in rows)
                 for k in ('fwd_vs_oracle', 'dx_vs_oracle', 'dw_vs_oracle')}
             for v in ('pallas', 'xla_default', 'xla_highest')}
    result = {'backend': jax.default_backend(),
              'grid': 'scripts/run_tpu_checks.py dw_grid',
              'worst_case': worst, 'rows': rows,
              'conclusion': (
                  'pallas kernel is f32-exact vs the f64 oracle; XLA '
                  'default-precision grouped conv rounds through bf16 MXU '
                  'passes on a geometry/direction-dependent subset; '
                  "precision='highest' matches the oracle. The r4 gate "
                  'failures were the reference, not the kernel.')}
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
