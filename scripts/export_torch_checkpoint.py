#!/usr/bin/env python
"""Export a run dir's weights as a reference-format torch checkpoint.

    python scripts/export_torch_checkpoint.py --model-path <run_dir> \
        --out model.ckpt [--average-last K]

The inverse of scripts/import_torch_checkpoint.py: the output file's
``state_dict`` uses the reference's exact key layout
(``conv1ds.conv1d_i.*`` / ``jasper_encoder.b.mconv.i.*`` — including the
parameter-less act/dropout index slots), so the original torch models can
``load_state_dict(strict=True)`` it. Useful for by-the-original-code
cross-validation of models trained here, or for torch-ecosystem tooling.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='export run weights as a reference torch checkpoint')
    parser.add_argument('--model-path', required=True)
    parser.add_argument('--out', required=True, help='output .ckpt path')
    parser.add_argument('--average-last', type=int, default=None,
                        help='average the newest K checkpoints first')
    args = parser.parse_args(argv)

    import torch

    import jax

    from wav2letter_pytorch_tpu.training import load_run
    from wav2letter_pytorch_tpu.training.torch_import import (
        torch_state_dict_from_variables)

    cfg, trainer, model, _, _ = load_run(args.model_path,
                                         average_last=args.average_last)
    state = jax.device_get(trainer.state)
    blocks = None
    if type(model).__name__ == 'Jasper':
        blocks = [dict(b) for b in
                  cfg.model.jasper_blocks[:int(cfg.model.mid_layers)]]
    sd = torch_state_dict_from_variables(
        {'params': state.params, 'batch_stats': state.batch_stats},
        jasper_blocks=blocks)
    torch.save({'state_dict': {k: torch.tensor(v) for k, v in sd.items()},
                'global_step': int(state.step),
                'exported_by': 'wav2letter_pytorch_tpu'}, args.out)
    print(f'wrote {args.out} ({len(sd)} tensors, step {int(state.step)})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
