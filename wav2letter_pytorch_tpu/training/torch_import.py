"""Import reference (torch / pytorch-lightning) checkpoints.

Users migrating from ``assafmu/wav2letter_pytorch`` have Lightning
``.ckpt`` files (torch ``state_dict`` inside); this module maps them onto
our flax variable trees so existing trained models evaluate/serve here
without retraining. The key layouts mapped (reference anchors):

* Wav2Letter — ``conv1ds.conv1d_{i}.conv1.{weight,bias}`` and
  ``conv1ds.conv1d_{i}.batch_norm.{weight,bias,running_mean,running_var}``
  (/root/reference/wav2letter.py:49-72: ``nn.Sequential(OrderedDict)`` of
  ``Conv1dBlock`` with children ``conv1``/``batch_norm``; the head block is
  built with ``bn=False`` so it carries conv keys only).
* Jasper — ``jasper_encoder.{b}.mconv.{i}.*`` where ``mconv`` is a flat
  ``ModuleList`` of [conv (separable: depthwise then pointwise), norm,
  parameter-less activation/dropout/GroupShuffle] per repeat
  (/root/reference/jasper.py:196-236, 300-372, ``bias=False`` convs);
  residual panes at ``jasper_encoder.{b}.res.{j}.{0,1}.*``
  (jasper.py:241-257); the 1x1 head at ``final_layer.0.{weight,bias}``
  (jasper.py:432-434).

Torch conv weights are ``[C_out, C_in/groups, K]`` (NCW); flax kernels are
``[K, C_in/groups, C_out]`` — a (2, 1, 0) transpose. BatchNorm
``weight``/``bias``/``running_mean``/``running_var`` map to flax
``scale``/``bias`` params and ``mean``/``var`` batch stats; GroupNorm
(group/instance/layer modes) maps ``weight``/``bias`` to ``scale``/``bias``.

The mapping walks OUR variable tree and consumes torch modules in
structural order, so it never re-derives the reference's ModuleList index
arithmetic; every tensor is shape-checked and leftovers are an error.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_checkpoint(path: str) -> dict:
    """Read a Lightning ``.ckpt`` (or raw ``state_dict``) into numpy."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=True)
    sd = obj.get('state_dict', obj) if isinstance(obj, dict) else obj
    if not isinstance(sd, dict) or not sd:
        raise ValueError(f'{path}: no state_dict found')
    return {k: _np(v) for k, v in sd.items()}


def _take(sd: dict, key: str, shape, what: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f'missing torch key {key!r} (wanted for {what}); '
                       f'is the config the one this checkpoint was '
                       f'trained with?')
    arr = sd.pop(key)
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(f'{key}: torch shape {tuple(arr.shape)} does not '
                         f'match model {what} {tuple(shape)}')
    return np.asarray(arr, np.float32)


def _conv_kernel(sd: dict, key: str, ours, what: str) -> np.ndarray:
    want = (ours.shape[2], ours.shape[1], ours.shape[0])  # [Cout, Cin/g, K]
    return _take(sd, key, want, what).transpose(2, 1, 0)


def _pop_modules(sd: dict, prefix: str):
    """Group ``prefix{i}.<leaf>`` keys into per-module dicts, index order."""
    mods: dict[int, dict] = {}
    for k in [k for k in sd if k.startswith(prefix)]:
        idx, _, leaf = k[len(prefix):].partition('.')
        mods.setdefault(int(idx), {})[leaf] = sd.pop(k)
    return [(i, mods[i]) for i in sorted(mods)]


def _assign_norm(mod: dict, midx, params_norm, stats_norm, what: str):
    """One torch norm module dict -> flax (scale, bias[, mean, var])."""
    mod.pop('num_batches_tracked', None)
    for leaf in ('weight', 'bias'):
        if leaf not in mod:
            raise KeyError(f'{what}: torch module #{midx} lacks {leaf!r} — '
                           f'expected a norm layer here')
    params_norm['scale'] = np.asarray(mod.pop('weight'), np.float32)
    params_norm['bias'] = np.asarray(mod.pop('bias'), np.float32)
    if stats_norm is not None:  # flax tree says batch norm -> stats required
        if 'running_mean' not in mod:
            raise KeyError(f'{what}: model uses batch norm but torch module '
                           f'#{midx} has no running_mean (GroupNorm?)')
        stats_norm['mean'] = np.asarray(mod.pop('running_mean'), np.float32)
        stats_norm['var'] = np.asarray(mod.pop('running_var'), np.float32)
    elif 'running_mean' in mod:
        raise KeyError(f'{what}: torch checkpoint has batch-norm running '
                       f'stats but the model config uses a stat-less norm')
    if mod:
        raise KeyError(f'{what}: unconsumed tensors in module #{midx}: '
                       f'{sorted(mod)}')


def _import_wav2letter(sd: dict, params: dict, stats: dict) -> None:
    for name in sorted(params, key=lambda n: int(n.rsplit('_', 1)[1])):
        t = f'conv1ds.{name}.conv1.'
        conv = params[name]['Conv_0']
        conv['kernel'] = _conv_kernel(sd, t + 'weight', conv['kernel'],
                                      f'{name} conv kernel')
        conv['bias'] = _take(sd, t + 'bias', conv['bias'].shape,
                             f'{name} conv bias')
        if 'BatchNorm_0' in params[name]:
            bn = {k: sd.pop(f'conv1ds.{name}.batch_norm.{k}', None)
                  for k in ('weight', 'bias', 'running_mean', 'running_var',
                            'num_batches_tracked')}
            _assign_norm({k: v for k, v in bn.items() if v is not None}, name,
                         params[name]['BatchNorm_0'],
                         stats.get(name, {}).get('BatchNorm_0'),
                         f'{name} batch_norm')


def _import_jasper(sd: dict, params: dict, stats: dict) -> None:
    blocks = sorted((n for n in params if n.startswith('block')),
                    key=lambda n: int(n[5:]))
    for bi, bname in enumerate(blocks):
        bparams = params[bname]
        bstats = stats.get(bname, {})
        mods = _pop_modules(sd, f'jasper_encoder.{bi}.mconv.')
        pos = 0
        r = 0
        while f'rep{r}_norm' in bparams:
            conv_names = ([f'rep{r}_dw', f'rep{r}_pw']
                          if f'rep{r}_dw' in bparams else [f'rep{r}_conv'])
            for cn in conv_names:
                if pos >= len(mods):
                    raise KeyError(f'{bname}: torch mconv exhausted at '
                                   f'{cn} — repeat/separable mismatch')
                midx, mod = mods[pos]
                pos += 1
                if 'conv.weight' not in mod:
                    raise KeyError(f'{bname}: torch mconv module #{midx} is '
                                   f'not a conv (keys {sorted(mod)}) but the '
                                   f'model expects {cn}')
                ours = bparams[cn]['Conv_0']
                ours['kernel'] = _conv_kernel(sd_mod := mod, 'conv.weight',
                                              ours['kernel'],
                                              f'{bname}.{cn} kernel')
                if sd_mod:
                    raise KeyError(f'{bname}.{cn}: unconsumed conv tensors '
                                   f'{sorted(sd_mod)} (bias convs are not a '
                                   f'reference Jasper layout)')
            if pos >= len(mods):
                raise KeyError(f'{bname}: torch mconv exhausted at '
                               f'rep{r}_norm')
            midx, mod = mods[pos]
            pos += 1
            _assign_norm(mod, midx, bparams[f'rep{r}_norm'],
                         bstats.get(f'rep{r}_norm'), f'{bname}.rep{r}_norm')
            r += 1
        if pos != len(mods):
            raise KeyError(f'{bname}: {len(mods) - pos} torch mconv modules '
                           f'left over — repeat mismatch (model has {r})')
        j = 0
        while f'res{j}_conv' in bparams:
            rmods = _pop_modules(sd, f'jasper_encoder.{bi}.res.{j}.')
            if len(rmods) != 2 or 'conv.weight' not in rmods[0][1]:
                raise KeyError(f'{bname}: torch res pane {j} does not look '
                               f'like [conv, norm] (model has res{j}_conv)')
            ours = bparams[f'res{j}_conv']['Conv_0']
            ours['kernel'] = _conv_kernel(rmods[0][1], 'conv.weight',
                                          ours['kernel'],
                                          f'{bname}.res{j}_conv kernel')
            _assign_norm(rmods[1][1], rmods[1][0],
                         bparams[f'res{j}_norm'],
                         bstats.get(f'res{j}_norm'),
                         f'{bname}.res{j}_norm')
            j += 1
    head = params['head']
    head['kernel'] = _conv_kernel(sd, 'final_layer.0.weight', head['kernel'],
                                  'head kernel')
    head['bias'] = _take(sd, 'final_layer.0.bias', head['bias'].shape,
                         'head bias')


def torch_state_dict_from_variables(variables, jasper_blocks=None) -> dict:
    """Inverse of :func:`variables_from_torch_state_dict`: emit a numpy
    ``state_dict`` in the REFERENCE's key layout, loadable by the original
    torch models with ``load_state_dict(strict=True)``.

    For Jasper, ``jasper_blocks`` (the config dicts) is required to
    reproduce the exact ``mconv`` ModuleList indices: parameter-less
    activation/dropout modules occupy an index slot after every non-last
    repeat (jasper.py:374-377, 214-216) and ``groups > 1`` inserts a
    GroupShuffle slot (jasper.py:369-370), so indices depend on config,
    not just on which tensors exist.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {}) or {}
    sd: dict[str, np.ndarray] = {}

    def put_conv(key: str, kern, bias=None):
        sd[key + '.weight'] = np.asarray(kern, np.float32).transpose(2, 1, 0)
        if bias is not None:
            sd[key + '.bias'] = np.asarray(bias, np.float32)

    def put_norm(key: str, p, st):
        sd[key + '.weight'] = np.asarray(p['scale'], np.float32)
        sd[key + '.bias'] = np.asarray(p['bias'], np.float32)
        if st is not None:
            sd[key + '.running_mean'] = np.asarray(st['mean'], np.float32)
            sd[key + '.running_var'] = np.asarray(st['var'], np.float32)
            sd[key + '.num_batches_tracked'] = np.asarray(0, np.int64)

    if any(n.startswith('conv1d_') for n in params):
        for name in params:
            blk = params[name]
            put_conv(f'conv1ds.{name}.conv1', blk['Conv_0']['kernel'],
                     blk['Conv_0']['bias'])
            if 'BatchNorm_0' in blk:
                put_norm(f'conv1ds.{name}.batch_norm', blk['BatchNorm_0'],
                         stats.get(name, {}).get('BatchNorm_0'))
        return sd

    if jasper_blocks is None:
        raise ValueError('jasper_blocks (config dicts) required to emit '
                         'reference mconv indices for a Jasper export')
    blocks = sorted((n for n in params if n.startswith('block')),
                    key=lambda n: int(n[5:]))
    for bi, bname in enumerate(blocks):
        bparams, bstats = params[bname], stats.get(bname, {})
        spec = jasper_blocks[bi]
        groups = int(spec.get('groups', 1))
        idx = 0
        r = 0
        while f'rep{r}_norm' in bparams:
            conv_names = ([f'rep{r}_dw', f'rep{r}_pw']
                          if f'rep{r}_dw' in bparams else [f'rep{r}_conv'])
            for cn in conv_names:
                put_conv(f'jasper_encoder.{bi}.mconv.{idx}.conv',
                         bparams[cn]['Conv_0']['kernel'])
                idx += 1
            put_norm(f'jasper_encoder.{bi}.mconv.{idx}',
                     bparams[f'rep{r}_norm'], bstats.get(f'rep{r}_norm'))
            idx += 1
            if groups > 1:
                idx += 1                     # GroupShuffle slot, no params
            r += 1
            if f'rep{r}_norm' in bparams:
                idx += 2                     # act + dropout slots, no params
        j = 0
        while f'res{j}_conv' in bparams:
            put_conv(f'jasper_encoder.{bi}.res.{j}.0.conv',
                     bparams[f'res{j}_conv']['Conv_0']['kernel'])
            put_norm(f'jasper_encoder.{bi}.res.{j}.1',
                     bparams[f'res{j}_norm'], bstats.get(f'res{j}_norm'))
            j += 1
    put_conv('final_layer.0', params['head']['kernel'],
             params['head']['bias'])
    return sd


def variables_from_torch_state_dict(state_dict: dict, variables) -> dict:
    """Map a reference-model torch ``state_dict`` onto ``variables``.

    ``variables`` is the flax tree from ``model.init`` (used as the
    shape/structure template); returns a new ``{'params', 'batch_stats'}``
    tree with every tensor replaced by the checkpoint's. Unknown leftover
    model keys raise — a silent partial import would be a wrong model.
    """
    import jax

    sd = {k: _np(v) for k, v in state_dict.items()}
    tree = jax.tree_util.tree_map(np.asarray, {
        'params': variables['params'],
        'batch_stats': variables.get('batch_stats', {})})
    params, stats = tree['params'], tree['batch_stats']
    if any(k.startswith('conv1ds.') for k in sd):
        _import_wav2letter(sd, params, stats)
    elif any(k.startswith('jasper_encoder.') for k in sd):
        _import_jasper(sd, params, stats)
    else:
        raise ValueError('state_dict has neither conv1ds.* (Wav2Letter) nor '
                         'jasper_encoder.* (Jasper) keys')
    model_left = [k for k in sd
                  if k.startswith(('conv1ds.', 'jasper_encoder.',
                                   'final_layer.'))]
    if model_left:
        raise KeyError(f'unconsumed torch model tensors (config mismatch?): '
                       f'{sorted(model_left)[:8]}'
                       f'{" ..." if len(model_left) > 8 else ""}')
    # non-model Lightning entries (criterion buffers etc.) are ignorable
    return tree
