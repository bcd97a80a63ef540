#!/usr/bin/env python
"""Convert a reference (torch / pytorch-lightning) checkpoint into a run dir.

    python scripts/import_torch_checkpoint.py --ckpt epoch=4.ckpt \
        --out imported_run model.mid_layers=20 model.labels=english_lowercase

The positional arguments are the same dotted config overrides the
checkpoint was trained with in the reference (its Lightning ``.ckpt``
stores no hyperparameters — /root/reference/base_asr_models.py:16-25 never
calls ``save_hyperparameters`` — so the model geometry must be restated).
The output directory is a normal run dir (``config.yaml`` +
``checkpoints/``): evaluate it with ``test.py --model-path``, export it
with ``scripts/export_serving.py``, or fine-tune from it with
``train.py --resume``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='import a reference torch checkpoint as a run dir')
    parser.add_argument('--ckpt', required=True,
                        help='Lightning .ckpt or raw torch state_dict file')
    parser.add_argument('--out', required=True, help='run dir to create')
    parser.add_argument('overrides', nargs='*',
                        help='config overrides the reference run used '
                             '(model=..., model.mid_layers=..., ...)')
    args = parser.parse_args(argv)

    import numpy as np

    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model)
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    from wav2letter_pytorch_tpu.training.torch_import import (
        load_torch_checkpoint, variables_from_torch_state_dict)

    cfg = load_config(['data.train_manifest=unused',
                       'data.val_manifest=unused'] + list(args.overrides))
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=0.0)
    optimizer, schedule = build_optimizer_safe(cfg)
    trainer = Trainer(cfg, model, frontend, optimizer, schedule,
                      build_decoder(cfg.model, labels), run_dir=args.out)
    sr = int(cfg.model.audio_conf.sample_rate)
    nb = len(trainer.mesh.devices.ravel())
    trainer.init_state(dict(
        audio=np.zeros((nb, sr), np.float32),
        audio_lengths=np.full((nb,), sr, np.int32),
        targets=np.ones((nb, 8), np.int32),
        target_lengths=np.full((nb,), 4, np.int32),
        batch_mask=np.ones((nb,), np.float32)))

    sd = load_torch_checkpoint(args.ckpt)
    import jax
    template = jax.device_get(trainer.state)
    tree = variables_from_torch_state_dict(
        sd, {'params': template.params, 'batch_stats': template.batch_stats})
    state = template.replace(params=tree['params'],
                             batch_stats=tree['batch_stats'])

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'config.yaml'), 'w') as f:
        f.write(cfg.pretty())
    ck = Checkpointer(os.path.join(args.out, 'checkpoints'))
    ck.save(0, state, extra={'epoch': 0})
    ck.close()
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(state.params))
    print(f'imported {args.ckpt} -> {args.out} '
          f'({type(model).__name__}, {n_params:,} parameters)')
    return 0


def build_optimizer_safe(cfg):
    """The reference optimizer config may name torch targets; fall back to
    plain SGD if the block is absent — the imported run only needs an
    optimizer state template, not the original training schedule."""
    from wav2letter_pytorch_tpu.training import build_optimizer
    try:
        return build_optimizer(cfg.model, 1, 1)
    except Exception:
        from wav2letter_pytorch_tpu import optim
        return (optim.sgd(optim.constant_lr(1e-4)), optim.constant_lr(1e-4))


if __name__ == '__main__':
    sys.exit(main())
