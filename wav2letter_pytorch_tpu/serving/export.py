"""Export a trained run as a self-contained serving artifact.

A serving artifact is a directory with:

* ``serving.npz`` — BN-folded conv weights (f32, or int8 + per-channel
  scales) plus optional corpus CMVN stats;
* ``serving.json`` — the layer geometry, label list, audio config, and
  weight format.

It is everything inference needs — no orbax checkpoint, no optimizer
state, no training config resolution — and loads directly into
``StreamingWav2Letter`` / ``offline_forward`` (scripts/export_serving.py
is the CLI).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .quantize import quantize_folded
from .streaming import fold_batchnorm


def compute_cmvn(manifest_path: str, frontend_factory, labels,
                 audio_conf, limit: int | None = None):
    """Corpus-level CMVN: masked mean/std of raw log-mel over a manifest.

    ``frontend_factory(normalize=False)`` must return a frontend emitting
    unnormalized masked features. Returns (mean [M], std [M]) — the
    ``norm_stats`` for exact-mode streaming and fixed-stat offline eval.
    """
    import jax

    from ..data.dataset import ManifestDataset
    ds = ManifestDataset(manifest_path, audio_conf, labels)
    frontend = frontend_factory(normalize=False)
    n = len(ds) if limit is None else min(limit, len(ds))
    # Jit over 0.5 s-grid padded shapes: raw per-utterance lengths would
    # trace a fresh program per distinct duration and dispatch the
    # frontend op-by-op — a multi-thousand-utterance manifest takes tens
    # of minutes over a remote device tunnel that way, ~2 min this way.
    fe = jax.jit(lambda a, l: frontend(a, l))
    grid = max(int(audio_conf['sample_rate']) // 2, 1)
    count, total, total_sq = 0.0, None, None
    for i in range(n):
        audio = np.asarray(ds[i][0], np.float32)
        L = len(audio)
        buf = np.zeros((1, ((L + grid - 1) // grid) * grid), np.float32)
        buf[0, :L] = audio
        feats, flens = fe(buf, np.array([L], np.int32))
        feats = np.asarray(feats)[0, :int(flens[0])]
        count += feats.shape[0]
        s, ss = feats.sum(0), np.square(feats).sum(0)
        total = s if total is None else total + s
        total_sq = ss if total_sq is None else total_sq + ss
    mean = total / count
    var = np.maximum(total_sq / count - np.square(mean), 0.0)
    # Unbiased, matching the per-utterance frontend convention.
    var *= count / max(count - 1.0, 1.0)
    return mean.astype(np.float32), np.sqrt(var).astype(np.float32)


def export_serving(out_dir: str, layers, num_labels: int, variables,
                   labels=None, audio_conf=None, weights: str = 'f32',
                   norm_stats=None, padding_mode: str = 'reflect',
                   feature_type: str = 'logmel', n_mels: int | None = None,
                   act_scales=None, folded=None, lm_path: str | None = None,
                   lm_beam_params: dict | None = None):
    """Write the serving artifact. Returns the artifact directory.

    ``act_scales``: optional static int8 activation scales
    (quantize.calibrate_activation_scales) recorded in the metadata for
    int8_full inference. ``folded``: a pre-computed f32 fold (avoids
    re-folding when the caller already has one, e.g. for calibration).
    ``lm_path``: optional ARPA LM copied INTO the artifact (as
    ``lm.arpa``) with ``lm_beam_params`` (k/alpha/beta/prune) recorded —
    artifact consumers (test.py --artifact, transcribe_long.py) pick it
    up automatically, making the artifact a complete deployment:
    weights + normalization + language model + decode settings."""
    os.makedirs(out_dir, exist_ok=True)
    layers = [dict(l) for l in layers]
    if folded is None:
        folded = fold_batchnorm(variables, len(layers))
    arrays = {}
    if weights == 'int8':
        for i, (q, scale, b) in enumerate(quantize_folded(folded)):
            arrays[f'w{i}'] = q
            arrays[f's{i}'] = scale
            arrays[f'b{i}'] = b
    elif weights == 'f32':
        for i, (w, b) in enumerate(folded):
            arrays[f'w{i}'] = w
            arrays[f'b{i}'] = b
    else:
        raise ValueError(f'unknown weights mode: {weights!r}')
    if norm_stats is not None:
        arrays['cmvn_mean'] = np.asarray(norm_stats[0], np.float32)
        arrays['cmvn_std'] = np.asarray(norm_stats[1], np.float32)
    np.savez(os.path.join(out_dir, 'serving.npz'), **arrays)
    meta = {
        'format': weights,
        'family': 'wav2letter',   # artifact export covers the w2l family;
                                  # jasper serving folds live (fold_jasper)
        'num_layers': len(folded),
        'layers': layers,
        'num_labels': num_labels,
        'labels': list(labels) if labels is not None else None,
        'audio_conf': dict(audio_conf) if audio_conf is not None else None,
        'has_cmvn': norm_stats is not None,
        'padding_mode': padding_mode,
        'feature_type': feature_type,
        'n_mels': (n_mels if n_mels is not None
                   else int(np.asarray(folded[0][0]).shape[1])),
        'act_scales': (None if act_scales is None
                       else [float(s) for s in act_scales]),
    }
    if lm_path:
        import shutil
        shutil.copyfile(lm_path, os.path.join(out_dir, 'lm.arpa'))
        meta['lm'] = {'file': 'lm.arpa',
                      'beam_params': dict(lm_beam_params or {})}
    with open(os.path.join(out_dir, 'serving.json'), 'w') as f:
        json.dump(meta, f, indent=2)
    return out_dir


def export_serving_jasper(out_dir: str, jasper_blocks, num_labels: int,
                          variables, labels=None, audio_conf=None,
                          norm_stats=None, feature_type: str = 'logmel',
                          n_mels: int | None = None):
    """Write a Jasper serving artifact (folded f32 weights + geometry).

    Stored f32; int8 quantization is applied at LOAD time by passing
    ``weights='int8'`` to ``StreamingJasper`` (the session quantizes the
    loaded fold), so one artifact serves both formats.
    """
    from .streaming_jasper import fold_jasper
    os.makedirs(out_dir, exist_ok=True)
    cfg = [dict(b) for b in jasper_blocks]
    blocks, head = fold_jasper(variables, cfg)
    arrays, blocks_meta = {}, []

    def put(key, w, b):
        arrays[key + '_w'] = np.asarray(w, np.float32)
        if b is not None:
            arrays[key + '_b'] = np.asarray(b, np.float32)

    def put_norm(key, norm):
        """Runtime (non-batch) norm: learned scale/bias + group count.
        Returns the JSON-side descriptor (None for folded batch norm)."""
        if norm is None:
            return None
        arrays[key + '_g'] = np.asarray(norm['gamma'], np.float32)
        arrays[key + '_beta'] = np.asarray(norm['beta'], np.float32)
        return {'ng': int(norm['ng'])}

    for i, blk in enumerate(blocks):
        bm = {k: blk[k] for k in ('residual_mode', 'activation', 'dense',
                                  'mask', 'groups')}
        bm['reps'] = []
        for r, rep in enumerate(blk['reps']):
            row = []
            for j, op in enumerate(rep['ops']):
                put(f'b{i}_r{r}_o{j}', op['w'], op['b'])
                row.append({f: op[f] for f in ('k', 's', 'd', 'pad',
                                               'depthwise', 'mask', 'fgc')})
            bm['reps'].append({
                'ops': row,
                'norm': put_norm(f'b{i}_r{r}_norm', rep['norm'])})
        bm['n_res'] = -1
        if blk['res'] is not None:
            bm['n_res'] = len(blk['res'])
            bm['res'] = []
            for j, entry in enumerate(blk['res']):
                put(f'b{i}_res{j}', entry['w'], entry['b'])
                bm['res'].append({
                    'fgc': entry['fgc'],
                    'norm': put_norm(f'b{i}_res{j}_norm', entry['norm'])})
        blocks_meta.append(bm)
    put('head', head[0], head[1])
    if norm_stats is not None:
        arrays['cmvn_mean'] = np.asarray(norm_stats[0], np.float32)
        arrays['cmvn_std'] = np.asarray(norm_stats[1], np.float32)
    np.savez(os.path.join(out_dir, 'serving.npz'), **arrays)
    meta = {
        'format': 'f32',
        'family': 'jasper',
        'jasper_blocks': cfg,
        'blocks_meta': blocks_meta,
        'num_labels': num_labels,
        'labels': list(labels) if labels is not None else None,
        'audio_conf': dict(audio_conf) if audio_conf is not None else None,
        'has_cmvn': norm_stats is not None,
        'feature_type': feature_type,
        # Fallback: the first conv's input channels (dw kernel [k,1,C]
        # keeps C; plain conv [k,Cin/g,Cout] has Cin/g).
        'n_mels': (n_mels if n_mels is not None else int(
            blocks[0]['reps'][0]['ops'][0]['w'].shape[2]
            if blocks[0]['reps'][0]['ops'][0]['depthwise']
            else blocks[0]['reps'][0]['ops'][0]['w'].shape[1]
            * blocks[0].get('groups', 1))),
    }
    with open(os.path.join(out_dir, 'serving.json'), 'w') as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_serving(artifact_dir: str):
    """Load an artifact -> (meta dict, folded weights, norm_stats | None).

    For the wav2letter family ``folded`` plugs into ``offline_forward`` /
    ``StreamingWav2Letter(folded=...)``; for jasper it is the
    ``(blocks, head)`` pair for ``StreamingJasper(folded=...)``.
    """
    with open(os.path.join(artifact_dir, 'serving.json')) as f:
        meta = json.load(f)
    npz = np.load(os.path.join(artifact_dir, 'serving.npz'))
    norm_stats = None
    if meta.get('has_cmvn'):
        norm_stats = (npz['cmvn_mean'], npz['cmvn_std'])

    if meta.get('family', 'wav2letter') == 'jasper':
        files = set(npz.files)

        def get(key):
            b = npz[key + '_b'] if key + '_b' in files else None
            return npz[key + '_w'], b

        def get_norm(key, desc):
            if desc is None:
                return None
            return dict(gamma=npz[key + '_g'], beta=npz[key + '_beta'],
                        ng=int(desc['ng']))

        blocks = []
        for i, bm in enumerate(meta['blocks_meta']):
            blk = {k: bm[k] for k in ('residual_mode', 'activation',
                                      'dense', 'mask')}
            blk['groups'] = int(bm.get('groups', 1))
            blk['reps'] = []
            for r, rep in enumerate(bm['reps']):
                # Pre-norm-support artifacts stored a rep as a bare op
                # list; current ones as {'ops': [...], 'norm': ...}.
                row = rep['ops'] if isinstance(rep, dict) else rep
                norm = rep.get('norm') if isinstance(rep, dict) else None
                ops = []
                for j, geom in enumerate(row):
                    w, b = get(f'b{i}_r{r}_o{j}')
                    op = dict(geom, w=w, b=b)
                    op.setdefault('fgc', w.shape[2] if op['depthwise']
                                  else 1)
                    ops.append(op)
                blk['reps'].append(dict(
                    ops=ops, norm=get_norm(f'b{i}_r{r}_norm', norm)))
            blk['res'] = None
            if bm['n_res'] >= 0:
                res_meta = bm.get('res') or [
                    {'fgc': 1, 'norm': None}] * bm['n_res']
                blk['res'] = []
                for j, rm in enumerate(res_meta):
                    w, b = get(f'b{i}_res{j}')
                    blk['res'].append(dict(
                        w=w, b=b, fgc=int(rm.get('fgc', 1)),
                        norm=get_norm(f'b{i}_res{j}_norm',
                                      rm.get('norm'))))
            blocks.append(blk)
        return meta, (blocks, get('head')), norm_stats

    folded = []
    for i in range(meta['num_layers']):
        if meta['format'] == 'int8':
            folded.append((npz[f'w{i}'], npz[f's{i}'], npz[f'b{i}']))
        else:
            folded.append((npz[f'w{i}'], npz[f'b{i}']))
    return meta, folded, norm_stats


def streaming_from_artifact(artifact_dir: str, chunk_frames: int = 64):
    """Build a ready-to-stream model from a serving artifact.

    Returns ``(model, labels, meta)`` where ``model`` is a
    ``StreamingWav2Letter`` / ``StreamingJasper`` in the artifact's weight
    format with the artifact's CMVN stats — the construction test.py's
    ``--artifact`` streaming eval performs, packaged for servers
    (scripts/serve_tcp.py) and embedders.
    """
    from ..data.features import AudioConfig, SpectrogramFrontend

    meta, folded, norm_stats = load_serving(artifact_dir)
    family = meta.get('family', 'wav2letter')
    labels, ac = meta.get('labels'), meta.get('audio_conf')
    if labels is None or ac is None:
        raise ValueError('artifact lacks labels/audio_conf metadata')
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    n_mels = meta.get('n_mels') or (folded[0][0].shape[1]
                                    if family == 'wav2letter' else None)
    if n_mels is None:
        raise ValueError('artifact lacks n_mels metadata')
    frontend = SpectrogramFrontend(
        conf, n_mels=int(n_mels), dither=0.0,
        feature_type=meta.get('feature_type', 'logmel'))
    kw = {}
    if norm_stats is not None:
        kw = dict(norm='precomputed', norm_stats=norm_stats)
    if family == 'jasper':
        from .streaming_jasper import StreamingJasper
        model = StreamingJasper(meta['jasper_blocks'], meta['num_labels'],
                                None, frontend, folded=folded,
                                chunk_frames=chunk_frames, **kw)
    else:
        from .streaming import StreamingWav2Letter
        model = StreamingWav2Letter(
            meta['layers'], meta['num_labels'], None, frontend,
            folded=folded, chunk_frames=chunk_frames,
            padding_mode=meta.get('padding_mode', 'reflect'), **kw)
    return model, labels, meta
