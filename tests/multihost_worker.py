"""Subprocess worker for the multi-host data-parallel test.

Each process runs 4 virtual CPU devices and joins a 2-process
``jax.distributed`` cluster (8 global devices); it loads its disjoint
manifest shard via ``BucketBatchLoader(shard_id, num_shards)``, assembles
the global batch through ``shard_batch``'s
``make_array_from_process_local_data`` branch (parallel/mesh.py), runs ONE
jitted sharded training step, and prints the loss. The test asserts the
loss matches a single-process 8-device run on the same corpus — multi-host
assembly must be invisible to the math (SURVEY.md §2.3 multi-host DCN
story).

Run me via tests/test_multihost.py, not directly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--coordinator', required=True)
    parser.add_argument('--num-processes', type=int, required=True)
    parser.add_argument('--process-id', type=int, required=True)
    parser.add_argument('--manifest', required=True)
    parser.add_argument('--devices-per-process', type=int, default=4)
    parser.add_argument('--batch-per-process', type=int, required=True)
    parser.add_argument('--fit-preempt', default='',
                        help='run trainer.fit with a shared run dir; '
                             'process 0 self-SIGTERMs mid-fit — the agreed '
                             'stop must checkpoint BOTH hosts at the same '
                             'step (value = shared run dir)')
    args = parser.parse_args()

    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') +
        f' --xla_force_host_platform_device_count={args.devices_per_process}'
    ).strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    n_global = args.devices_per_process * args.num_processes
    assert len(jax.devices()) == n_global, jax.devices()

    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.parallel import shard_batch
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model)

    overrides = [
        'data.train_manifest=x', 'data.val_manifest=y',
        'model.input_size=32',
        'model.layers=[{output_size: 32, kernel_size: 7, stride: 2, '
        'dilation: 1, dropout: -1.0}]',
        'trainer.string_metrics_interval=0',
        f'trainer.mesh.data={n_global}',
    ]
    if args.fit_preempt:
        overrides += [
            'trainer.max_epochs=5000',          # never finishes un-preempted
            'trainer.checkpoint.every_n_epochs=100000',
            'trainer.preempt_sync_every=1',     # agree at every dispatch
            f'trainer.default_root_dir={args.fit_preempt}',
        ]
    cfg = load_config(overrides)
    labels = build_labels(cfg.model)
    ds = ManifestDataset(args.manifest, cfg.data.audio_conf, labels)
    loader = BucketBatchLoader(ds, args.batch_per_process, num_buckets=1,
                               shuffle=False, prefetch=0,
                               shard_id=args.process_id,
                               num_shards=args.num_processes)
    batch = loader.peek_batch()

    model = build_model(cfg.model, len(labels))
    run_dir = args.fit_preempt or f'/tmp/w2l_mh_{args.process_id}'
    trainer = Trainer(cfg, model, build_frontend(cfg.model, dither=0.0),
                      optim.sgd(optim.constant_lr(1e-3), momentum=0.9),
                      optim.constant_lr(1e-3),
                      build_decoder(cfg.model, labels),
                      run_dir=run_dir)
    trainer.init_state(batch)
    if args.fit_preempt:
        # Only process 0 receives the signal; the allgather agreement must
        # stop BOTH processes at the same step boundary (a lone host
        # breaking out would hang the other's collectives forever).
        # Signals that land before fit() installs its handler would kill
        # the process (startup time varies under load), so install a
        # benign pre-handler and re-fire every few seconds until the
        # graceful stop takes.
        import signal
        import threading
        import time
        signal.signal(signal.SIGTERM, lambda *a: None)
        done = threading.Event()
        if args.process_id == 0:
            def _pummel():
                while not done.wait(5.0):
                    os.kill(os.getpid(), signal.SIGTERM)
            threading.Thread(target=_pummel, daemon=True).start()
        trainer.fit(loader)
        done.set()
        from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
        ck = Checkpointer(f'{run_dir}/checkpoints')
        step = ck.latest_step()
        extra = ck.load_extra()
        print(f'WORKER_PREEMPT_STEP {step} preempted='
              f'{extra.get("preempted")}', flush=True)
        # Exit in lockstep: process 0 hosts the coordinator, and orbax's
        # CheckpointManager close/atexit path runs collective barriers. If
        # p0 exits while p1 is still inside one (exit skew grows under host
        # load), p1 dies with a distributed error — flaky under a full-suite
        # run. A final agreement barrier makes exit ordering safe.
        if args.num_processes > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices('preempt_test_done')
        return
    device_batch = shard_batch(
        {k: v for k, v in batch.items() if not isinstance(v, list)},
        trainer.mesh)
    assert len(device_batch['audio'].sharding.device_set) == n_global
    step = trainer._get_jitted('train')
    state, loss, _, _ = step(trainer.state, device_batch)
    print(f'WORKER_LOSS {float(loss):.6f}', flush=True)


if __name__ == '__main__':
    main()
