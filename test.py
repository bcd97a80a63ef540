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


from wav2letter_pytorch_tpu.decoding.decoder import parse_beam_params  # noqa: E402,F401  (canonical home; re-exported for backward compat)


class _UttDump:
    """Per-utterance JSONL writer shared by the eval paths (--dump-jsonl);
    consumed by scripts/error_analysis.py."""

    def __init__(self, path: str):
        self._f = open(path, 'w') if path else None

    def add(self, path, ref, hyp, w, wd, c, cd):
        if self._f is None:
            return
        self._f.write(json.dumps({
            'path': path, 'ref': ref, 'hyp': hyp,
            'wer_edits': int(w), 'ref_words': int(wd),
            'cer_edits': int(c), 'ref_chars': int(cd)}) + '\n')

    def close(self):
        if self._f is not None:
            self._f.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description='Offline ASR evaluation')
    parser.add_argument('--model-path', default='',
                        help='training run dir (config.yaml + checkpoints/)')
    parser.add_argument('--artifact', default='',
                        help='serving artifact dir (scripts/'
                             'export_serving.py output); evaluates through '
                             'the streaming path with the artifact\'s '
                             'weights and CMVN stats')
    parser.add_argument('--test-manifest', required=True)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--print-samples', action='store_true',
                        help='print a (reference, decoded) pair per batch')
    parser.add_argument('--print-all', action='store_true',
                        help='print every (reference, decoded) pair')
    parser.add_argument('--lm-path', default='',
                        help='ARPA LM for prefix beam search (kenlm if '
                             'installed, else the built-in native scorer)')
    parser.add_argument('--no-lm', action='store_true',
                        help='greedy decode even if the artifact bundles '
                             'an LM (export_serving.py --lm-path)')
    parser.add_argument('--word-timings', action='store_true',
                        help='print (word, start_s, end_s) per utterance '
                             '(greedy offsets, or forced-alignment offsets '
                             'under beam decoding)')
    parser.add_argument('--beam-search-params', default='',
                        help='e.g. k=16,alpha=0.5,beta=5,prune=1e-3 '
                             '(implies beam search even without --lm-path)')
    parser.add_argument('--streaming', action='store_true',
                        help='evaluate through the chunked streaming serving '
                             'path (serving/streaming.py), one session per '
                             'utterance; utterances shorter than the prime '
                             'window fall back to the offline path')
    parser.add_argument('--streaming-chunk-frames', type=int, default=64,
                        help='streaming chunk size in STFT frames (64 = '
                             '640 ms at the default 10 ms hop)')
    parser.add_argument('--lookahead-frames', type=int, default=0,
                        help='with --streaming: bounded-lookahead mode '
                             '(serving/lookahead.py) — commit outputs '
                             'after this many frames of future context '
                             'instead of the model\'s full receptive '
                             'field (96 = 0.96 s at 10 ms hop); measures '
                             'the latency/WER trade')
    parser.add_argument('--lookahead-extrap-frames', type=int, default=0,
                        help='with --lookahead-frames: extend each window '
                             'with this many SYNTHESIZED future frames '
                             '(no added latency) so committed rows sit '
                             'further from the zero pad boundary')
    parser.add_argument('--lookahead-extrap-mode', default='reflect',
                        choices=['reflect', 'repeat'])
    parser.add_argument('--lookahead-left-frames', type=int, default=None,
                        help='with --lookahead-frames: past context per '
                             'window (default: the full one-sided '
                             'receptive field)')
    parser.add_argument('--streaming-norm', default='cumulative',
                        choices=['cumulative', 'cmvn'],
                        help='feature normalization for --model-path '
                             '--streaming: cumulative (running masked '
                             'stats, no side data — but early frames see '
                             'unsettled statistics, unlike the '
                             'per-utterance norm training used: reference '
                             'data_loader.py:77-88) or precomputed corpus '
                             'CMVN over --streaming-cmvn-manifest (what a '
                             'deployed artifact ships; closes most of the '
                             'streaming-vs-offline WER gap)')
    parser.add_argument('--streaming-cmvn-manifest', default='',
                        help='manifest to compute corpus CMVN over for '
                             '--streaming-norm cmvn (use the TRAIN '
                             'manifest — stats must not come from the '
                             'eval data)')
    parser.add_argument('--streaming-cmvn-limit', type=int, default=1000,
                        help='max utterances for the CMVN pass')
    parser.add_argument('--int8', action='store_true',
                        help='weight-only int8 quantized inference '
                             '(streaming mode only)')
    parser.add_argument('--offline', action='store_true',
                        help='artifact mode: batched mesh-sharded offline '
                             'inference (serving.MeshInference) instead of '
                             'per-utterance streaming')
    parser.add_argument('--offline-norm', default='per-utterance',
                        choices=['per-utterance', 'cmvn'],
                        help='feature normalization for --artifact '
                             '--offline: per-utterance (training-exact; '
                             'offline has every frame, so this is the '
                             'accuracy-correct default) or the artifact '
                             'CMVN stats (what streaming must use)')
    parser.add_argument('--int8-full', action='store_true',
                        help='with --artifact --offline on an int8 '
                             'artifact: run int8 activations too (the MXU '
                             'int8 path)')
    parser.add_argument('--beam-backend', default='host',
                        choices=['host', 'device'],
                        help="'host': serial per-utterance search (exact "
                             "in-loop LM fusion; C++/Python). 'device': "
                             "batched on-accelerator search (decoding/"
                             "beam_device.py) with the same exact in-loop "
                             "LM/hotword fusion")
    parser.add_argument('--hotwords', default='',
                        help='comma-separated words/phrases to bias toward '
                             '(contextual biasing inside the beam search; '
                             'implies beam decoding; host or device '
                             'backend)')
    parser.add_argument('--hotword-weight', type=float, default=2.0,
                        help='per-matched-character mass multiplier for '
                             '--hotwords (decoding.HotwordTrie)')
    parser.add_argument('--dump-jsonl', default='',
                        help='write one JSON record per utterance '
                             '(path/ref/hyp/edit counts) for error '
                             'analysis (scripts/error_analysis.py)')
    parser.add_argument('--average-last', type=int, default=None,
                        help='average the weights of the newest K '
                             'checkpoints before evaluating (checkpoint '
                             'averaging; --model-path mode only)')
    parser.add_argument('--cpu', action='store_true',
                        help='pin evaluation to the CPU backend in-process '
                             '(plain env vars do not reliably override an '
                             'ambient accelerator plugin)')
    parser.add_argument('overrides', nargs='*', default=[])
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    if args.offline and not args.artifact:
        raise SystemExit('--offline is an artifact-eval mode; pass '
                         '--artifact <dir>')
    if args.int8_full and not (args.artifact and args.offline):
        raise SystemExit('--int8-full applies to --artifact --offline '
                         'evaluation only')
    if args.artifact:
        return run_artifact_eval(args)
    if not args.model_path:
        raise SystemExit('pass --model-path (run dir) or --artifact')
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
    hotwords = [w for w in args.hotwords.split(',') if w.strip()] or None
    if (args.lm_path or beam_params or hotwords) \
            and args.beam_backend == 'device':
        from wav2letter_pytorch_tpu.decoding import DeviceBeamDecoder
        decoder = DeviceBeamDecoder(labels, lm_path=args.lm_path,
                                    hotwords=hotwords,
                                    hotword_weight=args.hotword_weight,
                                    **beam_params)
    elif args.lm_path or beam_params or hotwords:
        decoder = PrefixBeamSearchLMDecoder(
            args.lm_path, labels, hotwords=hotwords,
            hotword_weight=args.hotword_weight, **beam_params)
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
        if args.average_last and args.average_last > 1:
            from wav2letter_pytorch_tpu.training.checkpoint import \
                average_checkpoints
            trainer.state = average_checkpoints(
                ckpt, jax.device_get(trainer.state), args.average_last)
            print(f'Averaged last {args.average_last} checkpoints '
                  f'(through step {int(trainer.state.step)})',
                  file=sys.stderr)
        else:
            trainer.state = ckpt.restore(jax.device_get(trainer.state))
            print(f'Loaded checkpoint at step {int(trainer.state.step)}',
                  file=sys.stderr)
    else:
        print('WARNING: no checkpoint found; evaluating random init',
              file=sys.stderr)

    if args.streaming and args.lookahead_frames:
        return run_bounded_streaming_eval(args, cfg, trainer, model,
                                          decoder, labels, ds)
    if args.streaming:
        return run_streaming_eval(args, cfg, trainer, model, frontend,
                                  decoder, labels, ds, beam_params)

    eval_step = trainer._get_jitted('eval')
    acc = RatioAccumulator()
    dump = _UttDump(args.dump_jsonl)
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
            if args.word_timings:
                decoded, offsets = decoder.decode(out, sizes,
                                                  return_offsets=True)
            else:
                decoded = decoder.decode(out, sizes)
        elif isinstance(decoder, PrefixBeamSearchLMDecoder):
            if args.word_timings:
                # offsets come from forced alignment of each hypothesis
                decoded, offsets = decoder.decode(out, sizes,
                                                  return_offsets=True)
            else:
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
            dump.add(batch['paths'][j], expected, decoded[j], w, wd, c, cd)
            if args.print_all or (args.print_samples and j == 0):
                print(f'reference: {expected}')
                print(f'decoded  : {decoded[j]}')
            if args.word_timings and offsets is not None:
                times = get_time_per_word(list(decoded[j]),
                                          offsets[j].tolist(),
                                          ratio=frame_seconds)
                print(f'timings  : ' + ' '.join(
                    f'{w}[{s0:.2f}-{e0:.2f}]' for w, s0, e0 in times))

    dump.close()
    result = {'loss': float(np.mean(losses)) if losses else None,
              'num_utterances': len(ds)}
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


def run_artifact_eval(args):
    """Evaluate a serving artifact (exported weights + CMVN) through the
    streaming path — no checkpoint, no training config needed."""
    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.decoding import (GreedyDecoder,
                                                 PrefixBeamSearchLMDecoder)
    from wav2letter_pytorch_tpu.serving import (StreamingWav2Letter,
                                                load_serving)
    from wav2letter_pytorch_tpu.serving.streaming import stream_logprobs
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator

    rejected = [(args.word_timings, '--word-timings'),
                (args.int8, '--int8'),
                (args.average_last, '--average-last'),
                (args.model_path, '--model-path')]
    if not args.offline:
        # The incremental streaming decode is greedy; LM beam decoding of
        # an artifact is supported through the --offline batch path.
        rejected += [(args.lm_path, '--lm-path'),
                     (args.beam_search_params, '--beam-search-params'),
                     (args.hotwords, '--hotwords')]
    for flag, name in rejected:
        if flag:
            raise SystemExit(f'{name} is not supported with --artifact '
                             '(the artifact fixes weights; streaming '
                             'decoding is greedy — use --offline for '
                             'beam/LM or --model-path eval)')
    meta, folded, norm_stats = load_serving(args.artifact)
    family = meta.get('family', 'wav2letter')
    labels = meta['labels']
    ac = meta['audio_conf']
    if labels is None or ac is None:
        raise SystemExit('artifact lacks labels/audio_conf metadata')
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    n_mels = meta.get('n_mels') or (folded[0][0].shape[1]
                                    if family == 'wav2letter' else None)
    if n_mels is None:
        raise SystemExit('artifact lacks n_mels metadata')
    decoder = GreedyDecoder(labels)
    beam_params = parse_beam_params(args.beam_search_params)
    lm_path = args.lm_path
    if args.offline and not lm_path and meta.get('lm') and not args.no_lm:
        # The artifact bundles its own LM + decode settings
        # (export_serving.py --lm-path): a complete deployment.
        lm_path = os.path.join(args.artifact, meta['lm']['file'])
        beam_params = dict(meta['lm'].get('beam_params') or {},
                           **beam_params)
    hotwords = [w for w in args.hotwords.split(',') if w.strip()] or None
    if lm_path or beam_params or hotwords:
        # Artifact evals decode with the LM-fused beam too (the trained
        # model and the scripts/build_arpa.py LM make a complete offline
        # deployment with no kenlm / no training checkpoint).
        decoder = PrefixBeamSearchLMDecoder(
            lm_path, labels, hotwords=hotwords,
            hotword_weight=args.hotword_weight, **beam_params)
    ds = ManifestDataset(args.test_manifest, ac, labels)
    if args.offline:
        if family != 'wav2letter':
            raise SystemExit('--offline artifact eval supports wav2letter')
        return run_artifact_offline_eval(args, meta, folded, norm_stats,
                                         conf, int(n_mels), decoder, ds)
    frontend = SpectrogramFrontend(
        conf, n_mels=int(n_mels), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'))
    kw = {}
    if norm_stats is not None:
        kw = dict(norm='precomputed', norm_stats=norm_stats)
    if family == 'jasper':
        from wav2letter_pytorch_tpu.serving import StreamingJasper
        sw = StreamingJasper(meta['jasper_blocks'], meta['num_labels'],
                             None, frontend, folded=folded,
                             chunk_frames=args.streaming_chunk_frames,
                             **kw)
    else:
        sw = StreamingWav2Letter(
            meta['layers'], meta['num_labels'], None, frontend,
            folded=folded, chunk_frames=args.streaming_chunk_frames,
            padding_mode=meta.get('padding_mode', 'reflect'), **kw)
    acc = RatioAccumulator()
    dump = _UttDump(args.dump_jsonl)
    n_skipped = 0
    for i in range(len(ds)):
        audio, _, path, text = ds[i]
        audio = np.asarray(audio, np.float32)[None, :]
        if audio.shape[1] <= sw.prime_samples:
            n_skipped += 1
            continue
        logp = stream_logprobs(sw, audio)
        decoded = decoder.decode(logp)[0]
        c, cd = decoder.cer_ratio(text, decoded)
        w, wd = decoder.wer_ratio(text, decoded)
        acc.add('cer', c, cd)
        acc.add('wer', w, wd)
        dump.add(path, text, decoded, w, wd, c, cd)
        if args.print_all or (args.print_samples and i == 0):
            print(f'reference: {text}')
            print(f'decoded  : {decoded}')
    dump.close()
    # num_utterances = utterances the WER/CER actually cover (utterances
    # shorter than the prime window are skipped, not silently included).
    result = {'loss': None, 'num_utterances': len(ds) - n_skipped,
              'num_in_manifest': len(ds), 'streaming': True,
              'artifact': args.artifact, 'weights': meta['format'],
              'skipped_below_prime': n_skipped}
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


def run_artifact_offline_eval(args, meta, folded, norm_stats, conf, n_mels,
                              decoder, ds):
    """Batched, mesh-sharded offline inference over a manifest — the
    transcription-service evaluation path (serving.MeshInference)."""
    import numpy as np

    from wav2letter_pytorch_tpu.data.dataset import BucketBatchLoader
    from wav2letter_pytorch_tpu.data.features import SpectrogramFrontend
    from wav2letter_pytorch_tpu.decoding import PrefixBeamSearchLMDecoder
    from wav2letter_pytorch_tpu.serving import MeshInference, quantize_folded
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator

    # Offline inference sees every frame, so per-utterance normalization
    # (exactly what training used) is available and is the default; CMVN
    # is the stream-compatible mode. On the full-depth corpus the
    # difference measured 6.1% vs 10.5% WER with IDENTICAL weights —
    # quantization itself cost ~0 (benchmarks/full_depth_run.json).
    use_cmvn = args.offline_norm == 'cmvn'
    if use_cmvn and norm_stats is None:
        raise SystemExit('--offline-norm cmvn: artifact has no CMVN stats')
    frontend = SpectrogramFrontend(
        conf, n_mels=n_mels, dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'),
        norm_stats=norm_stats if use_cmvn else None)
    mode = meta['format']
    if args.int8_full:
        if meta['format'] != 'int8':
            folded = quantize_folded(folded)
        mode = 'int8_full'
    mi = MeshInference(meta['layers'], folded, frontend, mode=mode,
                       padding_mode=meta.get('padding_mode', 'reflect'),
                       act_scales=meta.get('act_scales'))
    n_dev = mi.mesh.shape['data']
    bs = args.batch_size or max(8, n_dev)
    bs += (-bs) % n_dev
    loader = BucketBatchLoader(ds, bs, num_buckets=4, shuffle=False,
                               frame_hop=frontend.hop)
    acc = RatioAccumulator()
    dump = _UttDump(args.dump_jsonl)
    is_beam = isinstance(decoder, PrefixBeamSearchLMDecoder)
    for batch in loader:
        logp, out_lens = mi.logprobs(batch['audio'],
                                     batch['audio_lengths'])
        if is_beam:
            # Beam search consumes probability space (reference
            # decoder.py:164 asserts it); w2l artifacts emit log-probs.
            probs = np.exp(np.asarray(logp))
            sizes = np.asarray(out_lens)
            decoded = [decoder.decode(probs[j][:int(sizes[j])])
                       for j in range(probs.shape[0])]
        else:
            decoded = decoder.decode(logp, sizes=out_lens)
        for j, text in enumerate(batch['texts']):
            if not batch['batch_mask'][j]:
                continue
            c, cd = decoder.cer_ratio(text, decoded[j])
            w, wd = decoder.wer_ratio(text, decoded[j])
            acc.add('cer', c, cd)
            acc.add('wer', w, wd)
            dump.add(batch['paths'][j], text, decoded[j], w, wd, c, cd)
            if args.print_all or (args.print_samples and j == 0):
                print(f'reference: {text}')
                print(f'decoded  : {decoded[j]}')
    dump.close()
    result = {'loss': None, 'num_utterances': len(ds), 'offline': True,
              'artifact': args.artifact, 'weights': mode,
              'decode': 'beam_lm' if is_beam else 'greedy',
              'normalization': args.offline_norm, 'mesh_devices': n_dev}
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


def _streaming_norm_kwargs(args, cfg, labels):
    """norm/norm_stats kwargs for the streamers per --streaming-norm.

    Training normalizes per-utterance over the FULL utterance (reference
    data_loader.py:77-88); a live stream cannot. 'cumulative' needs no
    side data but early frames see unsettled statistics; 'cmvn' precomputes
    corpus stats over the train manifest — the deployment-standard choice
    (what export_serving.py --cmvn-manifest bakes into artifacts).
    """
    if args.streaming_norm != 'cmvn':
        return {}
    if not args.streaming_cmvn_manifest:
        raise SystemExit('--streaming-norm cmvn requires '
                         '--streaming-cmvn-manifest (the train manifest)')
    from wav2letter_pytorch_tpu.serving import compute_cmvn
    from wav2letter_pytorch_tpu.training import build_frontend
    stats = compute_cmvn(
        args.streaming_cmvn_manifest,
        lambda normalize: build_frontend(cfg.model, dither=0.0,
                                         normalize=normalize),
        labels, cfg.data.audio_conf, limit=args.streaming_cmvn_limit)
    print(f'streaming CMVN over {args.streaming_cmvn_manifest}: '
          f'mean[0]={stats[0][0]:.3f} std[0]={stats[1][0]:.3f}',
          file=sys.stderr)
    return dict(norm='precomputed', norm_stats=stats)


def run_streaming_eval(args, cfg, trainer, model, frontend, decoder, labels,
                       ds, beam_params):
    """Per-utterance evaluation through the streaming serving path."""
    import jax
    from wav2letter_pytorch_tpu.decoding import (DeviceBeamDecoder,
                                                 PrefixBeamSearchLMDecoder,
                                                 get_time_per_word)
    from wav2letter_pytorch_tpu.serving import StreamingWav2Letter
    from wav2letter_pytorch_tpu.training import build_frontend
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator

    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}
    emits_probs = str(cfg.model.name) == 'jasper'
    nkw = _streaming_norm_kwargs(args, cfg, labels)
    if emits_probs:
        from wav2letter_pytorch_tpu.serving import StreamingJasper
        blocks = [dict(b) for b in
                  cfg.model.jasper_blocks][:int(cfg.model.mid_layers)]
        sw = StreamingJasper(blocks, len(labels), variables,
                             build_frontend(cfg.model, dither=0.0),
                             chunk_frames=args.streaming_chunk_frames,
                             weights='int8' if args.int8 else 'f32',
                             **nkw)
    elif str(cfg.model.name) == 'wav2letter':
        layers = [dict(l) for l in
                  cfg.model.layers][:int(cfg.model.mid_layers)]
        sw = StreamingWav2Letter(
            layers, len(labels), variables,
            build_frontend(cfg.model, dither=0.0),
            chunk_frames=args.streaming_chunk_frames,
            weights='int8' if args.int8 else 'f32',
            padding_mode=cfg.model.get('padding_mode', 'reflect'),
            **nkw)
    else:
        raise SystemExit(f'--streaming does not support model '
                         f'{cfg.model.name!r}')
    sr = int(cfg.model.audio_conf.sample_rate)
    hop_ms = float(cfg.model.audio_conf.window_stride) * 1e3
    print(f'streaming: prime {sw.prime_samples / sr:.2f}s, chunk '
          f'{args.streaming_chunk_frames * hop_ms:.0f} ms, lookahead '
          f'{sw.lookahead_frames * hop_ms / 1e3:.2f}s', file=sys.stderr)

    is_beam = isinstance(decoder, (PrefixBeamSearchLMDecoder,
                                   DeviceBeamDecoder))
    # Offline fallback for sub-prime utterances: ONE jitted program over
    # 0.5 s-grid padded shapes. Raw per-utterance lengths would compile a
    # fresh XLA program per distinct duration (and un-jitted apply would
    # dispatch every conv separately) — hours over a remote device tunnel.
    _fb = jax.jit(lambda v, a, l: model.apply(v, *frontend(a, l),
                                              train=False))
    _fb_vars = jax.device_put(variables)
    _fb_grid = max(sr // 2, 1)
    acc = RatioAccumulator()
    dump = _UttDump(args.dump_jsonl)
    n_fallback = 0
    for i in range(len(ds)):
        audio, _, upath, text = ds[i]
        audio = np.asarray(audio, np.float32)[None, :]
        if audio.shape[1] <= sw.prime_samples:
            n_fallback += 1
            L = audio.shape[1]
            L_pad = ((L + _fb_grid - 1) // _fb_grid) * _fb_grid
            buf = np.zeros((1, L_pad), np.float32)
            buf[0, :L] = audio[0]
            logp, out_lens = _fb(_fb_vars, buf, np.array([L], np.int32))
            logp = np.asarray(logp)[:, :int(out_lens[0])]
        else:
            from wav2letter_pytorch_tpu.serving.streaming import \
                stream_logprobs
            logp = stream_logprobs(sw, audio)
        # Jasper streams eval-mode probabilities; Wav2Letter log-probs.
        offsets0 = None
        if isinstance(decoder, DeviceBeamDecoder):
            probs = logp if emits_probs else np.exp(logp)
            sizes1 = np.array([logp.shape[1]])
            if args.word_timings:
                decoded, offs = decoder.decode(probs, sizes1,
                                               return_offsets=True)
                decoded, offsets0 = decoded[0], offs[0]
            else:
                decoded = decoder.decode(probs, sizes1)[0]
        elif isinstance(decoder, PrefixBeamSearchLMDecoder):
            probs = logp if emits_probs else np.exp(logp)
            if args.word_timings:
                decoded, offsets0 = decoder.decode(probs[0],
                                                   return_offsets=True)
            else:
                decoded = decoder.decode(probs[0])
        else:
            decoded, offsets = decoder.decode(logp, return_offsets=True)
            decoded, offsets0 = decoded[0], offsets[0]
        if args.word_timings and offsets0 is not None:
            frame_seconds = (float(cfg.model.audio_conf.window_stride)
                             * model.scaling_factor)
            times = get_time_per_word(list(decoded), offsets0.tolist(),
                                      ratio=frame_seconds)
            print('timings  : ' + ' '.join(
                f'{w0}[{s0:.2f}-{e0:.2f}]' for w0, s0, e0 in times))
        c, cd = decoder.cer_ratio(text, decoded)
        w, wd = decoder.wer_ratio(text, decoded)
        acc.add('cer', c, cd)
        acc.add('wer', w, wd)
        dump.add(upath, text, decoded, w, wd, c, cd)
        if args.print_all or (args.print_samples and i == 0):
            print(f'reference: {text}')
            print(f'decoded  : {decoded}')

    dump.close()
    result = {'loss': None, 'num_utterances': len(ds), 'streaming': True,
              'normalization': args.streaming_norm,
              'offline_fallback': n_fallback,
              'weights': 'int8' if args.int8 else 'f32'}
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


def run_bounded_streaming_eval(args, cfg, trainer, model, decoder, labels,
                               ds):
    """Bounded-lookahead streaming eval (serving/lookahead.py): commits
    outputs after --lookahead-frames of future context — the latency/WER
    trade the exact-parity streamer cannot make (its lookahead is the
    model's full one-sided receptive field)."""
    import jax
    from wav2letter_pytorch_tpu.serving.lookahead import (
        BoundedLookaheadStreamer, bounded_stream_logprobs,
        _conv_specs_jasper, _conv_specs_w2l)
    from wav2letter_pytorch_tpu.training import build_frontend
    from wav2letter_pytorch_tpu.training.metrics import RatioAccumulator

    variables = {'params': jax.device_get(trainer.state.params),
                 'batch_stats': jax.device_get(trainer.state.batch_stats)}
    emits_probs = str(cfg.model.name) == 'jasper'
    mid = int(cfg.model.mid_layers)
    if emits_probs:
        specs = _conv_specs_jasper(
            [dict(b) for b in cfg.model.jasper_blocks][:mid])
    else:
        specs = _conv_specs_w2l([dict(l) for l in cfg.model.layers][:mid])
    scale = int(model.scaling_factor)
    la = -(-int(args.lookahead_frames) // scale) * scale
    left = args.lookahead_left_frames
    if left is not None:
        left = -(-int(left) // scale) * scale
    sw = BoundedLookaheadStreamer(
        model, variables, build_frontend(cfg.model, dither=0.0), specs,
        chunk_frames=args.streaming_chunk_frames, lookahead_frames=la,
        left_frames=left, extrap_frames=args.lookahead_extrap_frames,
        extrap_mode=args.lookahead_extrap_mode,
        **_streaming_norm_kwargs(args, cfg, labels))
    sr = int(cfg.model.audio_conf.sample_rate)
    hop_s = float(cfg.model.audio_conf.window_stride)
    print(f'bounded-lookahead streaming: lookahead {la * hop_s:.2f}s, '
          f'chunk {args.streaming_chunk_frames * hop_s:.2f}s, window '
          f'{sw.window_frames} frames '
          f'({sw.window_frames / args.streaming_chunk_frames:.1f}x offline '
          'compute)', file=sys.stderr)
    acc = RatioAccumulator()
    dump = _UttDump(args.dump_jsonl)
    for i in range(len(ds)):
        audio, _, upath, text = ds[i]
        audio = np.asarray(audio, np.float32)[None, :]
        out = bounded_stream_logprobs(sw, audio)
        logp = np.log(np.maximum(out, 1e-30)) if emits_probs else out
        decoded = decoder.decode(logp)[0]
        c, cd = decoder.cer_ratio(text, decoded)
        w, wd = decoder.wer_ratio(text, decoded)
        acc.add('cer', c, cd)
        acc.add('wer', w, wd)
        dump.add(upath, text, decoded, w, wd, c, cd)
        if args.print_all or (args.print_samples and i == 0):
            print(f'reference: {text}')
            print(f'decoded  : {decoded}')
    dump.close()
    result = {'loss': None, 'num_utterances': len(ds), 'streaming': True,
              'normalization': args.streaming_norm,
              'bounded_lookahead_frames': la,
              'bounded_lookahead_seconds': round(la * hop_s, 3),
              'left_frames': sw.left_frames,
              'window_frames': sw.window_frames}
    if args.lookahead_extrap_frames:
        result['extrap_frames'] = sw.extrap_frames
        result['extrap_mode'] = sw.extrap_mode
    result.update(acc.ratios())
    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
