#!/usr/bin/env python
"""Transcribe a long recording through exact chunked long-form inference.

    python scripts/transcribe_long.py --artifact <dir> --audio long.flac
    python scripts/transcribe_long.py --artifact <dir> \
        --concat-manifest test.csv --minutes 10 [--int8-full] [--bench]

With ``--concat-manifest`` the input is built by concatenating manifest
utterances (up to ``--minutes``) — and since their transcripts are known,
the run reports long-form WER alongside throughput. ``--verify-oneshot``
additionally runs the one-shot offline stack on the same audio and checks
the chunked output against it (memory permitting — that is the path
long-form exists to avoid).

The reference has no long-file story at all (its loader pads whole
utterances, /root/reference/data/data_loader.py); see
serving/longform.py for the exactness construction.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='exact long-form transcription from a serving artifact')
    parser.add_argument('--artifact', required=True)
    parser.add_argument('--audio', default='',
                        help='audio file (wav/flac) to transcribe')
    parser.add_argument('--concat-manifest', default='',
                        help='build the long input by concatenating this '
                             'manifest\'s utterances (reports WER too)')
    parser.add_argument('--minutes', type=float, default=10.0,
                        help='target length for --concat-manifest')
    parser.add_argument('--int8-full', action='store_true',
                        help='full-int8 MXU path (needs artifact act_scales)')
    parser.add_argument('--norm', default='per-utterance',
                        choices=['per-utterance', 'cmvn'])
    parser.add_argument('--chunk-frames', type=int, default=2000,
                        help='core output frames per window (memory knob)')
    parser.add_argument('--max-batch', type=int, default=8,
                        help='windows per dispatch')
    parser.add_argument('--mesh', action='store_true',
                        help='shard windows across all visible devices')
    parser.add_argument('--verify-oneshot', action='store_true',
                        help='cross-check against the one-shot offline run')
    parser.add_argument('--lm-path', default='',
                        help='ARPA LM: decode with LM-fused prefix beam '
                             'search instead of greedy')
    parser.add_argument('--beam-search-params', default='',
                        help='k=,alpha=,beta=,prune= for --lm-path')
    parser.add_argument('--no-lm', action='store_true',
                        help='greedy decode even if the artifact bundles '
                             'an LM')
    parser.add_argument('--hotwords', default='',
                        help='comma-separated words/phrases to bias toward '
                             'inside the beam search (implies beam '
                             'decoding; decoding.HotwordTrie)')
    parser.add_argument('--hotword-weight', type=float, default=2.0)
    parser.add_argument('--word-timings', action='store_true',
                        help='print (word, start_s, end_s) lines to stderr '
                             'and include them in --json-out (greedy '
                             'offsets; hour-scale timestamping)')
    parser.add_argument('--json-out', default='',
                        help='write the result record to this file')
    args = parser.parse_args(argv)

    import numpy as np

    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    from wav2letter_pytorch_tpu.serving import (LongFormTranscriber,
                                                load_serving)

    meta, folded, norm_stats = load_serving(args.artifact)
    if meta.get('family', 'wav2letter') != 'wav2letter':
        raise SystemExit('long-form supports the wav2letter family; use '
                         'streaming for Jasper (docs/SERVING.md §3)')
    ac = meta['audio_conf']
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    if args.norm == 'cmvn' and norm_stats is None:
        raise SystemExit('--norm cmvn: artifact has no CMVN stats')
    frontend = SpectrogramFrontend(
        conf, n_mels=int(meta['n_mels']), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'),
        norm_stats=norm_stats if args.norm == 'cmvn' else None)
    decoder = GreedyDecoder(meta['labels'])

    reference_text = None
    if args.concat_manifest:
        from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
        ds = ManifestDataset(args.concat_manifest, ac, meta['labels'])
        target = int(args.minutes * 60 * conf.sample_rate)
        pieces, texts, total = [], [], 0
        for i in range(len(ds)):
            audio_i, _, _, text = ds[i]
            pieces.append(np.asarray(audio_i, np.float32))
            texts.append(text)
            total += len(pieces[-1])
            if total >= target:
                break
        audio = np.concatenate(pieces)
        reference_text = ' '.join(texts)
    elif args.audio:
        from wav2letter_pytorch_tpu.data.audio_io import read_audio
        from wav2letter_pytorch_tpu.data.resample import resample
        audio, sr = read_audio(args.audio)
        if sr != conf.sample_rate:
            print(f'resampling {sr} Hz -> artifact rate {conf.sample_rate} Hz')
            audio = resample(audio, sr, conf.sample_rate)
        audio = np.asarray(audio, np.float32)
    else:
        raise SystemExit('need --audio or --concat-manifest')

    mode = 'int8_full' if args.int8_full else (
        'int8' if meta['format'] == 'int8' else 'f32')
    act_scales = meta.get('act_scales')
    if mode == 'int8_full' and not act_scales:
        raise SystemExit('--int8-full: artifact has no act_scales')
    mesh = None
    if args.mesh:
        from wav2letter_pytorch_tpu.parallel import make_mesh
        mesh = make_mesh()

    lf = LongFormTranscriber(
        meta['layers'], folded, frontend, decoder, mode=mode,
        padding_mode=meta.get('padding_mode', 'reflect'),
        act_scales=act_scales if mode == 'int8_full' else None,
        chunk_frames=args.chunk_frames, max_batch=args.max_batch, mesh=mesh)

    secs = len(audio) / conf.sample_rate
    print(f'input: {secs/60:.1f} min ({len(audio)} samples), mode={mode}, '
          f'chunk_frames={args.chunk_frames}', file=sys.stderr)
    # Warm-up compiles the window program; the timed run measures compute.
    logp, valid = lf.logprobs(audio)
    t0 = time.perf_counter()
    logp, valid = lf.logprobs(audio)
    dt = time.perf_counter() - t0
    lm_path = args.lm_path
    beam_params = None
    if not lm_path and meta.get('lm') and not args.no_lm:
        # artifact bundles its own LM + decode settings
        lm_path = os.path.join(args.artifact, meta['lm']['file'])
        beam_params = dict(meta['lm'].get('beam_params') or {})
    hotwords = [w for w in args.hotwords.split(',') if w.strip()] or None
    if lm_path or args.beam_search_params or hotwords:
        from wav2letter_pytorch_tpu.decoding import PrefixBeamSearchLMDecoder
        from wav2letter_pytorch_tpu.decoding.decoder import parse_beam_params
        from wav2letter_pytorch_tpu.serving.longform import decode_segmented
        beam_params = dict(beam_params or {},
                           **parse_beam_params(args.beam_search_params))
        beam = PrefixBeamSearchLMDecoder(lm_path, meta['labels'],
                                         hotwords=hotwords,
                                         hotword_weight=args.hotword_weight,
                                         **beam_params)
        t1 = time.perf_counter()
        # Hour-scale outputs beam-decode per silence-bounded segment: the
        # probability-space DP underflows past a few thousand frames.
        text = decode_segmented(logp[:valid], beam)
        dt_decode = time.perf_counter() - t1
    else:
        text = decoder.decode(logp[None, :valid, :],
                              sizes=np.array([valid]))[0]
        dt_decode = None

    word_times = None
    if args.word_timings:
        from wav2letter_pytorch_tpu.decoding import get_time_per_word
        g_text, g_offsets = decoder.decode(logp[None, :valid, :],
                                           sizes=np.array([valid]),
                                           return_offsets=True)
        # seconds per output frame = window_stride x conv scaling factor
        scale = 1
        for l in meta['layers']:
            scale *= int(l.get('stride', 1))
        ratio = float(ac['window_stride']) * scale
        word_times = [(w, round(float(a), 2), round(float(b), 2))
                      for w, a, b in get_time_per_word(
                          list(g_text[0]), list(g_offsets[0]), ratio)]
        for w, a, b in word_times[:20]:
            print(f'{a:9.2f} {b:9.2f}  {w}', file=sys.stderr)
        if len(word_times) > 20:
            print(f'... {len(word_times) - 20} more words',
                  file=sys.stderr)

    result = {
        'artifact': args.artifact, 'mode': mode, 'norm': args.norm,
        'audio_seconds': round(secs, 2),
        'chunk_frames': args.chunk_frames, 'max_batch': args.max_batch,
        'wall_seconds': round(dt, 3),
        'x_realtime': round(secs / dt, 1),
        'transcript_chars': len(text),
    }
    if dt_decode is not None:
        result['decode'] = 'beam_lm'
        result['beam_seconds'] = round(dt_decode, 3)
    if word_times is not None:
        result['num_words_timed'] = len(word_times)
    if reference_text is not None:
        w, wd = decoder.wer_ratio(reference_text, text)
        c, cd = decoder.cer_ratio(reference_text, text)
        result['wer'] = w / max(wd, 1)
        result['cer'] = c / max(cd, 1)
    if args.verify_oneshot:
        import jax

        from wav2letter_pytorch_tpu.serving import (offline_forward,
                                                    offline_forward_q8)
        feats, flens = jax.jit(frontend)(
            audio[None, :], np.array([len(audio)], np.int32))
        feats = np.asarray(feats)[:, :int(np.asarray(flens)[0])]
        if mode == 'int8_full':
            ref, _ = offline_forward_q8(
                meta['layers'], folded, feats, act_scales=act_scales,
                padding_mode=meta.get('padding_mode', 'reflect'))
        else:
            ref, _ = offline_forward(
                meta['layers'], folded, feats,
                padding_mode=meta.get('padding_mode', 'reflect'))
        diff = float(np.max(np.abs(np.asarray(ref)[0] - logp)))
        result['oneshot_max_abs_diff'] = diff
        result['oneshot_argmax_equal'] = bool(
            (np.asarray(ref)[0].argmax(-1) == logp.argmax(-1)).all())
    print(json.dumps(result))
    if args.json_out:
        if word_times is not None:   # full list only in the file record
            result['word_timings'] = word_times
        with open(args.json_out, 'w') as f:
            json.dump(result, f, indent=1)
    if reference_text is None:
        print(text)
    return 0


if __name__ == '__main__':
    sys.exit(main())
