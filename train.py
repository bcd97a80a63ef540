#!/usr/bin/env python
"""Training entry point.

Usage parity with the reference (/root/reference/train.py, README.md:34-44):

    python train.py data.train_manifest=train.csv data.val_manifest=val.csv
    python train.py model=jasper model.mid_layers=15 optimizer=novograd ...
    python train.py --cfg          # print the composed config and exit

Overrides are dotted key=value pairs; groups (audio/optimizer/model) are
swapped with group=name.
"""

from __future__ import annotations

import sys

from wav2letter_pytorch_tpu.config import load_config
from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                 ManifestDataset)
from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                             build_frontend, build_labels,
                                             build_model, build_optimizer)


def get_data_loaders(labels, data_cfg):
    ac = data_cfg['audio_conf']
    hop = int(ac['sample_rate'] * ac['window_stride'])
    kwargs = dict(num_buckets=int(data_cfg.get('num_length_buckets', 4)),
                  max_duration=data_cfg.get('max_duration'),
                  prefetch=int(data_cfg.get('prefetch', 2)),
                  frame_hop=hop)
    cache = bool(data_cfg.get('cache_audio', False))
    wire_dtype = str(data_cfg.get('audio_dtype', 'float32'))
    train_ds = ManifestDataset(data_cfg['train_manifest'],
                               data_cfg['audio_conf'], labels,
                               cache_audio=cache, audio_dtype=wire_dtype)
    train_loader = BucketBatchLoader(train_ds, int(data_cfg['batch_size']),
                                     shuffle=bool(data_cfg.get('shuffle', True)),
                                     **kwargs)
    val_ds = ManifestDataset(data_cfg['val_manifest'],
                             data_cfg['audio_conf'], labels,
                             cache_audio=cache, audio_dtype=wire_dtype)
    val_loader = BucketBatchLoader(val_ds, int(data_cfg['batch_size']),
                                   shuffle=False, **kwargs)
    return train_loader, val_loader


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    print_cfg = '--cfg' in argv
    resume = '--resume' in argv
    if '--cpu' in argv:
        # Pin in-process BEFORE first backend use: plain env vars do not
        # reliably override an ambient accelerator plugin (test.py --cpu).
        import jax
        jax.config.update('jax_platforms', 'cpu')
    overrides = [a for a in argv if not a.startswith('--')]
    cfg = load_config(overrides)
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if print_cfg:
        print(cfg.pretty())
        return 0

    labels = build_labels(cfg.model)
    train_loader, val_loader = get_data_loaders(labels, cfg.data)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model)
    steps_per_epoch = len(train_loader)
    total = steps_per_epoch * int(cfg.trainer.get('max_epochs', 5))
    optimizer, schedule = build_optimizer(cfg.model, steps_per_epoch, total)
    decoder = build_decoder(cfg.model, labels)

    trainer = Trainer(cfg, model, frontend, optimizer, schedule, decoder)
    trainer.fit(train_loader, val_loader, resume=resume)
    if trainer.stopped_reason == 'rss_budget':
        # EX_TEMPFAIL: the host-RSS budget forced a mid-run checkpoint;
        # relaunching with --resume continues exactly where this left off.
        return 75
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
