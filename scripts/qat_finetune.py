#!/usr/bin/env python
"""Quantization-aware finetune of a trained run for int8_full serving.

    python scripts/qat_finetune.py --model-path <run_dir> \
        --from-artifact <calibrated_artifact> --train-manifest train.csv \
        --out <new_artifact_dir> [--steps 300] [--lr 1e-4] \
        [--batch-size 16] [--eval-manifest test.csv]

Starts from the run's f32 BN-fold, finetunes it through the fake-quantized
deployment graph (serving/qat.py) against the artifact's calibrated
activation scales, and writes a new int8 artifact (same CMVN stats and
act_scales — deployment code unchanged). With --eval-manifest, reports
int8_full greedy WER before and after on that manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _eval_int8(layers, folded_q, frontend, ds, labels, act_scales,
               padding_mode, batch_size):
    import jax
    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import BucketBatchLoader
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    from wav2letter_pytorch_tpu.serving import offline_forward_q8
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator

    decoder = GreedyDecoder(labels)

    # Weights as jit ARGUMENTS, not closure constants — baked-in weights
    # exceed the remote-compile request limit (HTTP 413) on tunneled TPUs.
    @jax.jit
    def fwd(fq, audio, alens):
        feats, flens = frontend(audio, alens)
        logp, out_lens = offline_forward_q8(
            layers, fq, feats, flens, padding_mode=padding_mode,
            act_scales=act_scales)
        return logp, out_lens

    folded_q = jax.device_put([tuple(np.asarray(a) for a in wb)
                               for wb in folded_q])
    loader = BucketBatchLoader(ds, batch_size, num_buckets=4, shuffle=False,
                               frame_hop=frontend.hop)
    acc = RatioAccumulator()
    for batch in loader:
        logp, out_lens = fwd(folded_q, batch['audio'],
                             batch['audio_lengths'])
        decoded = decoder.decode(np.asarray(logp), sizes=np.asarray(out_lens))
        for j, text in enumerate(batch['texts']):
            if not batch['batch_mask'][j]:
                continue
            c, cd = decoder.cer_ratio(text, decoded[j])
            w, wd = decoder.wer_ratio(text, decoded[j])
            acc.add('cer', c, cd)
            acc.add('wer', w, wd)
    return acc.ratios()


def main(argv=None):
    parser = argparse.ArgumentParser(description='QAT finetune for int8')
    parser.add_argument('--model-path', required=True,
                        help='training run dir (config.yaml + checkpoints/)')
    parser.add_argument('--from-artifact', required=True,
                        help='calibrated artifact supplying act_scales + '
                             'CMVN (scripts/export_serving.py --calibrate)')
    parser.add_argument('--train-manifest', required=True)
    parser.add_argument('--out', required=True, help='new artifact dir')
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--opt', default='lamb', choices=['lamb', 'adam'],
                        help='lamb (trust-ratio; lr is per-step relative '
                             'drift — the safe default for folded weights '
                             'spanning orders of magnitude) or adam')
    parser.add_argument('--batch-size', type=int, default=16)
    parser.add_argument('--eval-manifest', default='',
                        help='report int8_full greedy WER before/after')
    parser.add_argument('--log-every', type=int, default=25,
                        help='loss log/history interval in steps')
    parser.add_argument('--norm', default='per-utterance',
                        choices=['per-utterance', 'cmvn'],
                        help='feature normalization to finetune (and eval) '
                             'against: per-utterance matches offline '
                             'artifact eval; cmvn (the artifact stats) '
                             'matches exact-parity streaming deployment')
    parser.add_argument('--average-last', type=int, default=None,
                        help='start from the average of the newest K '
                             'checkpoints (checkpoint averaging)')
    parser.add_argument('--f32-layers', default='',
                        help="comma list of layer indices and/or 'head' to "
                             'exempt from quantization (mixed precision)')
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.serving import (export_serving,
                                                fold_batchnorm, load_serving,
                                                qat_finetune, quantize_folded)
    from wav2letter_pytorch_tpu.training import load_run

    f32_layers = tuple(
        s if s == 'head' else int(s)
        for s in args.f32_layers.split(',') if s)

    meta, _, norm_stats = load_serving(args.from_artifact)
    act_scales = meta.get('act_scales')
    if act_scales is None:
        raise SystemExit('--from-artifact has no act_scales; re-export '
                         'with --int8 --calibrate')

    cfg, trainer, model, _, labels = load_run(
        args.model_path, average_last=args.average_last)
    if str(cfg.model.name) != 'wav2letter':
        raise SystemExit('QAT export covers the wav2letter family')
    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}
    layers = meta['layers']
    folded = fold_batchnorm(variables, len(layers))
    print(f'finetuning fold of step {int(trainer.state.step)} '
          f'({len(folded)} layers)', file=sys.stderr)

    ac = meta['audio_conf']
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    # Deployment features: dither-free; per-utterance normalization (the
    # offline-eval default, test.py run_artifact_offline_eval) or the
    # artifact CMVN stats (what exact-parity streaming consumes).
    if args.norm == 'cmvn' and norm_stats is None:
        raise SystemExit('--norm cmvn: artifact has no CMVN stats')
    frontend = SpectrogramFrontend(
        conf, n_mels=int(meta['n_mels']), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'),
        norm_stats=norm_stats if args.norm == 'cmvn' else None)
    padding_mode = meta.get('padding_mode', 'reflect')

    ds = ManifestDataset(args.train_manifest, ac, labels)
    loader = BucketBatchLoader(ds, args.batch_size, num_buckets=4,
                               shuffle=True, frame_hop=frontend.hop)

    report = {'steps': args.steps, 'lr': args.lr, 'opt': args.opt,
              'norm': args.norm,
              'batch_size': args.batch_size, 'f32_layers': list(
                  str(x) for x in f32_layers)}
    eval_ds = None
    if args.eval_manifest:
        eval_ds = ManifestDataset(args.eval_manifest, ac, labels)
        report['before'] = _eval_int8(
            layers, quantize_folded(folded), frontend, eval_ds, labels,
            act_scales, padding_mode, args.batch_size)
        print(f"before: {report['before']}", file=sys.stderr)

    ctc_impl = None
    if jax.default_backend() == 'tpu':
        from wav2letter_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas
        ctc_impl = ctc_loss_pallas
    new_folded, history = qat_finetune(
        layers, folded, frontend, loader, act_scales=act_scales,
        steps=args.steps, learning_rate=args.lr, optimizer=args.opt,
        f32_layers=f32_layers, padding_mode=padding_mode, ctc_impl=ctc_impl,
        log_every=args.log_every,
        progress=lambda m: print(m, file=sys.stderr))
    report['history'] = history

    if eval_ds is not None:
        report['after'] = _eval_int8(
            layers, quantize_folded(new_folded), frontend, eval_ds, labels,
            act_scales, padding_mode, args.batch_size)
        print(f"after: {report['after']}", file=sys.stderr)

    export_serving(
        args.out, layers, int(meta['num_labels']), None, labels=labels,
        audio_conf=ac, weights='int8', norm_stats=norm_stats,
        padding_mode=padding_mode,
        feature_type=meta.get('feature_type', 'logmel'),
        n_mels=int(meta['n_mels']), act_scales=act_scales,
        folded=new_folded)
    report['artifact'] = args.out
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())
