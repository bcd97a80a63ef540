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
    parser.add_argument('--calibrate', action='store_true',
                        help='with --int8 + --cmvn-manifest: record static '
                             'int8 activation scales (percentile over '
                             'calibration utterances) for int8_full '
                             'inference')
    parser.add_argument('--calibrate-clips', type=int, default=8,
                        help='utterances used for activation calibration')
    parser.add_argument('--average-last', type=int, default=None,
                        help='average the newest K checkpoints\' weights '
                             'before export (checkpoint averaging)')
    parser.add_argument('--lm-path', default='',
                        help='ARPA LM to bundle into the artifact '
                             '(train one: scripts/build_arpa.py); artifact '
                             'evals then beam-decode with it automatically')
    parser.add_argument('--lm-beam-params', default='',
                        help='k=,alpha=,beta=,prune= recorded with the '
                             'bundled LM as the default decode settings')
    parser.add_argument('--cpu', action='store_true',
                        help='pin the export (weight load + calibration '
                             'forward passes) to the CPU backend in-process')
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    import jax
    from wav2letter_pytorch_tpu.serving import (compute_cmvn,
                                                export_serving,
                                                fold_batchnorm)
    from wav2letter_pytorch_tpu.serving.quantize import \
        calibrate_activation_scales
    from wav2letter_pytorch_tpu.training import build_frontend, load_run

    cfg, trainer, model, frontend, labels = load_run(
        args.model_path, average_last=args.average_last)
    family = str(cfg.model.name)
    if family not in ('wav2letter', 'jasper'):
        raise SystemExit(f'unknown model family {family!r}')
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

    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}
    if family == 'jasper':
        if args.int8 or args.calibrate:
            raise SystemExit('jasper artifacts are stored f32 — quantize '
                             'at load (StreamingJasper weights="int8"); '
                             '--int8/--calibrate apply to wav2letter only')
        from wav2letter_pytorch_tpu.serving import export_serving_jasper
        blocks = [dict(b) for b in
                  cfg.model.jasper_blocks][:int(cfg.model.mid_layers)]
        export_serving_jasper(args.out, blocks, len(labels), variables,
                              labels=labels,
                              audio_conf=dict(cfg.model.audio_conf),
                              norm_stats=norm_stats,
                              feature_type=cfg.model.get('feature_type',
                                                         'logmel'),
                              n_mels=frontend.n_mels)
        print(f'wrote {args.out}/serving.npz + serving.json',
              file=sys.stderr)
        return 0

    layers = [dict(l) for l in cfg.model.layers][:int(cfg.model.mid_layers)]

    folded = fold_batchnorm(variables, len(layers))
    act_scales = None
    if args.calibrate:
        if not (args.int8 and args.cmvn_manifest):
            raise SystemExit('--calibrate needs --int8 and --cmvn-manifest')
        from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
        ds = ManifestDataset(args.cmvn_manifest, cfg.data.audio_conf,
                             labels)
        n = min(args.calibrate_clips, len(ds))
        clips = [np.asarray(ds[i][0], np.float32) for i in range(n)]
        maxlen = max(len(c) for c in clips)
        audio = np.zeros((n, maxlen), np.float32)
        for i, c in enumerate(clips):
            audio[i, :len(c)] = c
        cal_fe = build_frontend(cfg.model, dither=0.0,
                                norm_stats=norm_stats)
        act_scales = calibrate_activation_scales(
            layers, folded, cal_fe, audio,
            np.array([len(c) for c in clips]),
            padding_mode=cfg.model.get('padding_mode', 'reflect'))
        print(f'calibrated {len(act_scales)} activation scales '
              f'(first {act_scales[0]:.4f})', file=sys.stderr)

    from wav2letter_pytorch_tpu.decoding.decoder import parse_beam_params
    export_serving(args.out, layers, len(labels), variables, labels=labels,
                   audio_conf=dict(cfg.model.audio_conf),
                   weights='int8' if args.int8 else 'f32',
                   norm_stats=norm_stats,
                   padding_mode=cfg.model.get('padding_mode', 'reflect'),
                   feature_type=cfg.model.get('feature_type', 'logmel'),
                   n_mels=frontend.n_mels, act_scales=act_scales,
                   folded=folded, lm_path=args.lm_path,
                   lm_beam_params=parse_beam_params(args.lm_beam_params))
    print(f'wrote {args.out}/serving.npz + serving.json', file=sys.stderr)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
