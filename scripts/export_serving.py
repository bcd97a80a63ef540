#!/usr/bin/env python
"""Export a training run directory as a self-contained serving artifact.

    python scripts/export_serving.py --model-path <run_dir> --out <dir> \
        [--int8] [--cmvn-manifest train.csv [--cmvn-limit N]]

The artifact (serving.npz + serving.json) holds BN-folded (optionally int8)
weights, the layer geometry, labels, audio config, and — when a CMVN
manifest is given — corpus normalization stats enabling the exact-parity
streaming mode (serving/streaming.py docstring).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description='Export serving artifact')
    parser.add_argument('--model-path', required=True,
                        help='training run dir (config.yaml + checkpoints/)')
    parser.add_argument('--out', required=True, help='artifact directory')
    parser.add_argument('--int8', action='store_true',
                        help='per-channel int8 weight-only quantization')
    parser.add_argument('--cmvn-manifest', default='',
                        help='manifest to measure corpus CMVN stats on')
    parser.add_argument('--cmvn-limit', type=int, default=None,
                        help='cap utterances used for CMVN')
    args = parser.parse_args(argv)

    import yaml

    import jax
    from wav2letter_pytorch_tpu.config import ConfigNode
    from wav2letter_pytorch_tpu.serving import compute_cmvn, export_serving
    from wav2letter_pytorch_tpu.training import (build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model, build_optimizer)
    from wav2letter_pytorch_tpu.training import Trainer
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer

    with open(os.path.join(args.model_path, 'config.yaml')) as f:
        cfg = ConfigNode.wrap(yaml.safe_load(f))
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)
    optimizer, schedule = build_optimizer(cfg.model, 1, 1)
    trainer = Trainer(cfg, model, frontend, optimizer, schedule,
                      build_decoder(cfg.model, labels),
                      run_dir=args.model_path)

    sr = int(cfg.model.audio_conf.sample_rate)
    nb = len(trainer.mesh.devices.ravel())  # init batch must shard evenly
    batch = dict(
        audio=np.zeros((nb, sr), np.float32),
        audio_lengths=np.full((nb,), sr, np.int32),
        targets=np.ones((nb, 8), np.int32),
        target_lengths=np.full((nb,), 4, np.int32),
        batch_mask=np.ones((nb,), np.float32))
    trainer.init_state(batch)
    ckpt = Checkpointer(os.path.join(args.model_path, 'checkpoints'))
    if ckpt.latest_step() is None:
        raise SystemExit(f'no checkpoint under {args.model_path}')
    trainer.state = ckpt.restore(jax.device_get(trainer.state))
    print(f'exporting step {int(trainer.state.step)}', file=sys.stderr)

    norm_stats = None
    if args.cmvn_manifest:
        norm_stats = compute_cmvn(
            args.cmvn_manifest,
            lambda normalize: build_frontend(cfg.model, dither=0.0,
                                             normalize=normalize),
            labels, cfg.data.audio_conf, limit=args.cmvn_limit)
        print(f'CMVN over {args.cmvn_manifest}: mean[0]='
              f'{norm_stats[0][0]:.3f} std[0]={norm_stats[1][0]:.3f}',
              file=sys.stderr)

    layers = [dict(l) for l in cfg.model.layers][:int(cfg.model.mid_layers)]
    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}
    export_serving(args.out, layers, len(labels), variables, labels=labels,
                   audio_conf=dict(cfg.model.audio_conf),
                   weights='int8' if args.int8 else 'f32',
                   norm_stats=norm_stats)
    print(f'wrote {args.out}/serving.npz + serving.json', file=sys.stderr)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
