#!/usr/bin/env python
"""Throughput levers around the (already MXU-saturated) conv stack.

peak_flops.py calibrates this chip at ~162.6 practical bf16 TFLOPS; the
flagship step already achieves ~140 on the model portion, so remaining
gains are at the step level: batch size (amortizing per-layer overheads),
multi-step-per-dispatch (amortizing the ~1.1 ms tunnel dispatch), and the
non-model residue (frontend/CTC/optimizer). This measures each lever as a
full jitted program. Prints one JSON line per variant.
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
STEPS = 10
MODEL_FWD_TFLOP_PER_UTT = 1.959 / 16  # from step_breakdown.py at T=800


def make_batch(batch):
    rng = np.random.default_rng(0)
    t_samples = SECONDS * SR
    targets = rng.integers(1, 29, size=(batch, 128)).astype(np.int32)
    targets[:, 100:] = 0
    return dict(
        audio=(rng.standard_normal((batch, t_samples)) * 0.1).astype(
            np.float32),
        audio_lengths=np.full((batch,), t_samples, np.int32),
        targets=targets,
        target_lengths=np.full((batch,), 100, np.int32),
        batch_mask=np.ones((batch,), np.float32),
    )


def main():
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.parallel import shard_batch
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model, build_optimizer)

    def build_trainer(batch_overrides=()):
        cfg = load_config(['data.train_manifest=u', 'data.val_manifest=u',
                           'model.mid_layers=20',
                           'trainer.string_metrics_interval=0',
                           *batch_overrides])
        labels = build_labels(cfg.model)
        model = build_model(cfg.model, num_labels=len(labels))
        frontend = build_frontend(cfg.model)
        optimizer, schedule = build_optimizer(cfg.model, 1000, 5000)
        return Trainer(cfg, model, frontend, optimizer, schedule,
                       build_decoder(cfg.model, labels),
                       run_dir='/tmp/w2l_bs_bench')

    def run(name, batch_size, n_scan=1):
        trainer = build_trainer()
        batch = make_batch(batch_size)
        trainer.init_state(batch)
        device_batch = shard_batch(batch, trainer.mesh)
        if n_scan == 1:
            step = trainer._get_jitted('train')

            def do():
                s = trainer.state
                s, loss, _, _ = step(s, device_batch)
                trainer.state = s
                return loss
        else:
            stacked = jax.tree.map(
                lambda a: jnp.stack([a] * n_scan), device_batch)

            @jax.jit
            def multi(state, batches):
                def body(s, b):
                    s, loss, _, _ = trainer._train_step(s, b)
                    return s, loss
                state, losses = jax.lax.scan(body, state, batches)
                return state, losses[-1]

            def do():
                trainer.state, loss = multi(trainer.state, stacked)
                return loss

        loss = do()
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            loss = do()
        float(loss)
        dt = (time.perf_counter() - t0) / STEPS
        utts = batch_size * n_scan
        print(json.dumps({
            'variant': name, 'ms_per_dispatch': round(dt * 1e3, 2),
            'utt_per_sec': round(utts / dt, 1),
            'model_tflops': round(
                3 * MODEL_FWD_TFLOP_PER_UTT * utts / dt, 1),
        }), flush=True)

    run('B16', 16)
    run('B32', 32)
    run('B64', 64)
    run('B16_scan4', 16, n_scan=4)
    run('B32_scan4', 32, n_scan=4)


if __name__ == '__main__':
    main()
