#!/usr/bin/env python
"""Offline evaluation CLI.

Provides the surface the reference README documents but never shipped
(/root/reference/README.md:46-56, flagged "WIP!"): evaluate a trained model
on a test manifest, optionally with kenlm-fused prefix beam search.

    python test.py --model-path <run_dir> --test-manifest test.csv
    python test.py --model-path <run_dir> --test-manifest test.csv \
        --lm-path lm.arpa --beam-search-params k=16,alpha=0.5,beta=5,prune=1e-3 \
        --print-samples

``--model-path`` is a training run directory (containing config.yaml +
checkpoints/) or a directory with those two entries. Extra dotted overrides
(key=value) adjust the loaded config. Prints per-corpus WER/CER/loss as one
JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def parse_beam_params(text: str) -> dict:
    out = {}
    if not text:
        return out
    for part in text.split(','):
        key, _, val = part.partition('=')
        key = key.strip()
        if key not in ('k', 'alpha', 'beta', 'prune'):
            raise ValueError(f'Unknown beam-search param {key!r}')
        out[key] = int(val) if key == 'k' else float(val)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description='Offline ASR evaluation')
    parser.add_argument('--model-path', required=True,
                        help='training run dir (config.yaml + checkpoints/)')
    parser.add_argument('--test-manifest', required=True)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--print-samples', action='store_true',
                        help='print a (reference, decoded) pair per batch')
    parser.add_argument('--print-all', action='store_true',
                        help='print every (reference, decoded) pair')
    parser.add_argument('--lm-path', default='',
                        help='ARPA LM for prefix beam search (kenlm if '
                             'installed, else the built-in native scorer)')
    parser.add_argument('--word-timings', action='store_true',
                        help='print (word, start_s, end_s) per utterance '
                             '(greedy decoder only)')
    parser.add_argument('--beam-search-params', default='',
                        help='e.g. k=16,alpha=0.5,beta=5,prune=1e-3 '
                             '(implies beam search even without --lm-path)')
    parser.add_argument('--beam-backend', default='host',
                        choices=['host', 'device'],
                        help="'host': serial per-utterance search (exact "
                             "in-loop LM fusion; C++/Python). 'device': "
                             "batched on-accelerator search (decoding/"
                             "beam_device.py); with --lm-path the n-best "
                             "list is LM-rescored on host")
    parser.add_argument('overrides', nargs='*', default=[])
    args = parser.parse_args(argv)

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from wav2letter_pytorch_tpu.config import ConfigNode, load_config
    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.decoding import (PrefixBeamSearchLMDecoder,
                                                 get_time_per_word)
    from wav2letter_pytorch_tpu.parallel import shard_batch
    from wav2letter_pytorch_tpu.training import (Trainer, build_decoder,
                                                 build_frontend, build_labels,
                                                 build_model, build_optimizer)
    from wav2letter_pytorch_tpu.training.checkpoint import Checkpointer
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator
    import yaml

    cfg_path = os.path.join(args.model_path, 'config.yaml')
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = ConfigNode.wrap(yaml.safe_load(f))
        from wav2letter_pytorch_tpu.config import _set_path, _parse_value
        for ov in args.overrides:
            key, _, val = ov.partition('=')
            _set_path(cfg, key.lstrip('+'), _parse_value(val),
                      allow_new=key.startswith('+'))
    else:
        cfg = load_config(args.overrides + [
            'data.train_manifest=unused',
            f'data.val_manifest={args.test_manifest}'])

    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model)
    optimizer, schedule = build_optimizer(cfg.model, 1, 1)

    beam_params = parse_beam_params(args.beam_search_params)
    if (args.lm_path or beam_params) and args.beam_backend == 'device':
        from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
        decoder = DeviceBeamDecoder(labels, lm_path=args.lm_path,
                                    **beam_params)
    elif args.lm_path or beam_params:
        decoder = PrefixBeamSearchLMDecoder(args.lm_path, labels,
                                            **beam_params)
    else:
        decoder = build_decoder(cfg.model, labels)

    trainer = Trainer(cfg, model, frontend, optimizer, schedule, decoder,
                      run_dir=args.model_path)
    ds = ManifestDataset(args.test_manifest, cfg.data.audio_conf, labels)
    ac = cfg.data.audio_conf
    loader = BucketBatchLoader(
        ds, args.batch_size or int(cfg.data.batch_size),
        num_buckets=int(cfg.data.get('num_length_buckets', 4)),
        max_duration=cfg.data.get('max_duration'), shuffle=False,
        frame_hop=int(ac['sample_rate'] * ac['window_stride']))

    first = next(iter(loader))
    trainer.init_state(first)
    ckpt = Checkpointer(os.path.join(args.model_path, 'checkpoints'))
    if ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(jax.device_get(trainer.state))
        print(f'Loaded checkpoint at step {int(trainer.state.step)}',
              file=sys.stderr)
    else:
        print('WARNING: no checkpoint found; evaluating random init',
              file=sys.stderr)

    eval_step = trainer._get_jitted('eval')
    acc = RatioAccumulator()
    losses = []
    for batch in loader:
        device_batch = shard_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
            trainer.mesh)
        loss, out, out_lens = eval_step(trainer.state, device_batch)
        losses.append(float(loss))
        out = np.asarray(out)
        from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
        is_beam = isinstance(decoder, (PrefixBeamSearchLMDecoder,
                                       DeviceBeamDecoder))
        # Beam search needs probability space; Wav2Letter eval emits log
        # probs (reference wav2letter.py:87 vs jasper.py:473).
        if is_beam and not trainer.eval_emits_probs:
            out = np.exp(out)
        sizes = np.asarray(out_lens)
        offsets = None
        if isinstance(decoder, DeviceBeamDecoder):
            # one batched on-accelerator search for the whole batch
            decoded = decoder.decode(out, sizes)
        elif isinstance(decoder, PrefixBeamSearchLMDecoder):
            decoded = [decoder.decode(out[j][:sizes[j]])
                       for j in range(out.shape[0])]
        elif out.ndim == 2:
            # greedy path: eval_step already argmaxed on device
            decoded, offsets = decoder.decode_ids(out, sizes,
                                                  return_offsets=True)
        else:
            decoded, offsets = decoder.decode(out, sizes, return_offsets=True)
        # seconds per output frame = window_stride x conv scaling factor
        frame_seconds = (float(cfg.model.audio_conf.window_stride)
                         * model.scaling_factor)
        for j, expected in enumerate(batch['texts']):
            if not batch['batch_mask'][j]:
                continue
            c, cd = decoder.cer_ratio(expected, decoded[j])
            w, wd = decoder.wer_ratio(expected, decoded[j])
            acc.add('cer', c, cd)
            acc.add('wer', w, wd)
            if args.print_all or (args.print_samples and j == 0):
                print(f'reference: {expected}')
                print(f'decoded  : {decoded[j]}')
            if args.word_timings and offsets is not None:
                times = get_time_per_word(list(decoded[j]),
                                          offsets[j].tolist(),
                                          ratio=frame_seconds)
                print(f'timings  : ' + ' '.join(
                    f'{w}[{s0:.2f}-{e0:.2f}]' for w, s0, e0 in times))

    result = {'loss': float(np.mean(losses)) if losses else None,
              'num_utterances': len(ds)}
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
