"""Minimal Hydra-equivalent config system.

The reference composes Hydra config groups with CLI dotted overrides and
``_target_`` object instantiation (/root/reference/train.py:28,
base_asr_models.py:22,73-76, configuration/config.yaml). This module
reimplements that surface without Hydra:

* config groups selected by a ``defaults`` list (``audio:``, ``optimizer:``,
  ``model:``), group files optionally rebased by a ``# @package <path>``
  header;
* CLI overrides: ``key.sub=value`` (YAML-parsed values), group swaps like
  ``model=jasper``, and ``+new.key=value`` additions;
* ``${a.b}`` value interpolation and ``???`` mandatory-field enforcement;
* ``instantiate(cfg)`` resolving ``_target_`` through a registry that also
  accepts the reference's names (e.g. ``decoder.GreedyDecoder``) so
  reference-style configs keep working, plus dotted import paths.
"""

from __future__ import annotations

import importlib
import os
import re
import yaml

MISSING = '???'
_INTERP_RE = re.compile(r'^\$\{([^}]+)\}$')
_INTERP_ANY_RE = re.compile(r'\$\{([^}]+)\}')


class ConfigNode(dict):
    """dict with attribute access, Hydra-DictConfig-flavored."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def get(self, key, default=None):
        return super().get(key, default)

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj

    def to_dict(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)

    def pretty(self) -> str:
        return yaml.safe_dump(self.to_dict(), allow_unicode=True,
                              default_flow_style=False, sort_keys=False)


def default_config_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), 'configs')


def _deep_merge(base: dict, over: dict) -> dict:
    """Merge ``over`` onto ``base`` (over wins; dicts merge recursively)."""
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _read_group_file(config_dir: str, group: str, name: str) -> dict:
    path = os.path.join(config_dir, group, f'{name}.yaml')
    if not os.path.exists(path):
        avail = sorted(f[:-5] for f in os.listdir(os.path.join(config_dir, group))
                       if f.endswith('.yaml'))
        raise FileNotFoundError(
            f'No config {name!r} in group {group!r}; available: {avail}')
    with open(path) as f:
        text = f.read()
    content = yaml.safe_load(text) or {}
    # '# @package a.b' header rebases the file under that path.
    m = re.search(r'^#\s*@package\s+(\S+)', text, re.MULTILINE)
    if m and m.group(1) != '_global_':
        for part in reversed(m.group(1).split('.')):
            content = {part: content}
    return content


def _parse_value(text: str):
    return yaml.safe_load(text)


def _set_path(cfg: dict, dotted: str, value, allow_new: bool):
    parts = dotted.split('.')
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if not allow_new and p not in node:
                raise KeyError(
                    f'Override path {dotted!r}: unknown key {p!r} '
                    '(prefix with + to add new keys)')
            node[p] = {}
        node = node[p]
    if not allow_new and parts[-1] not in node:
        raise KeyError(
            f'Override {dotted!r} sets a key that does not exist '
            '(prefix with + to add new keys)')
    node[parts[-1]] = value


def _get_path(cfg: dict, dotted: str):
    node = cfg
    for p in dotted.split('.'):
        node = node[p]
    return node


def _resolve_interpolations(cfg: dict):
    """Resolve ${a.b} references: full-value references keep the target's
    type (possibly chained); embedded references ("prefix-${a.b}") are
    string-substituted, Hydra-style."""

    def lookup(path, seen):
        if path in seen:
            raise ValueError(f'Interpolation cycle at ${{{path}}}')
        try:
            target = _get_path(cfg, path)
        except KeyError:
            raise KeyError(f'Interpolation ${{{path}}} not found')
        return resolve(target, seen | {path})

    def resolve(value, seen):
        if isinstance(value, str):
            m = _INTERP_RE.match(value)
            if m:
                return lookup(m.group(1), seen)
            if '${' in value:
                return _INTERP_ANY_RE.sub(
                    lambda mm: str(lookup(mm.group(1), seen)), value)
        return value

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(resolve(v, set())) if isinstance(v, (dict, list))
                    else resolve(v, set()) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) if isinstance(v, (dict, list))
                    else resolve(v, set()) for v in node]
        return node

    return walk(cfg)


def _check_missing(cfg, prefix=''):
    missing = []
    if isinstance(cfg, dict):
        for k, v in cfg.items():
            missing += _check_missing(v, f'{prefix}{k}.')
    elif isinstance(cfg, list):
        for i, v in enumerate(cfg):
            missing += _check_missing(v, f'{prefix}{i}.')
    elif cfg == MISSING:
        missing.append(prefix[:-1])
    return missing


def load_config(overrides: list[str] | None = None,
                config_dir: str | None = None,
                config_name: str = 'config',
                require_complete: bool = True) -> ConfigNode:
    """Compose the config tree: defaults -> primary -> CLI overrides."""
    overrides = list(overrides or [])
    config_dir = config_dir or default_config_dir()

    with open(os.path.join(config_dir, f'{config_name}.yaml')) as f:
        primary = yaml.safe_load(f) or {}
    defaults = primary.pop('defaults', [])

    # Group swaps from CLI ('model=jasper') override the defaults list.
    group_overrides = {}
    value_overrides = []
    for ov in overrides:
        if '=' not in ov:
            raise ValueError(f'Malformed override (need key=value): {ov!r}')
        key, _, val = ov.partition('=')
        if '.' not in key.lstrip('+') and os.path.isdir(
                os.path.join(config_dir, key.lstrip('+'))):
            group_overrides[key.lstrip('+')] = val
        else:
            value_overrides.append((key, val))

    cfg: dict = {}
    for entry in defaults:
        if isinstance(entry, str):  # e.g. '_self_'
            continue
        (group, name), = entry.items()
        name = group_overrides.pop(group, name)
        cfg = _deep_merge(cfg, _read_group_file(config_dir, group, name))
    for group, name in group_overrides.items():
        cfg = _deep_merge(cfg, _read_group_file(config_dir, group, name))

    cfg = _deep_merge(cfg, primary)

    for key, val in value_overrides:
        allow_new = key.startswith('+')
        _set_path(cfg, key.lstrip('+'), _parse_value(val), allow_new=allow_new)

    cfg = _resolve_interpolations(cfg)

    if require_complete:
        missing = _check_missing(cfg)
        if missing:
            raise ValueError(
                'Missing mandatory config values (set them on the command '
                f'line): {missing}')
    return ConfigNode.wrap(cfg)


# --------------------------------------------------------------------------
# _target_ instantiation
# --------------------------------------------------------------------------

def _registry():
    # Local imports dodge circular imports at module load.
    from .decoding import (DeviceBeamDecoder, GreedyDecoder,
                           PrefixBeamSearchLMDecoder)
    from . import optim
    return {
        # our names
        'wav2letter_pytorch_tpu.decoding.GreedyDecoder': GreedyDecoder,
        'wav2letter_pytorch_tpu.decoding.PrefixBeamSearchLMDecoder':
            PrefixBeamSearchLMDecoder,
        'wav2letter_pytorch_tpu.decoding.DeviceBeamDecoder':
            DeviceBeamDecoder,
        'wav2letter_pytorch_tpu.optim.novograd': optim.novograd,
        'wav2letter_pytorch_tpu.optim.sgd': optim.sgd,
        # reference-style names (decoder.py / torch.optim), so configs
        # written for the reference keep working
        'decoder.GreedyDecoder': GreedyDecoder,
        'decoder.PrefixBeamSearchLMDecoder': PrefixBeamSearchLMDecoder,
        'novograd.Novograd': optim.novograd,
        'torch.optim.SGD': optim.sgd,
    }


def resolve_target(target: str):
    reg = _registry()
    if target in reg:
        return reg[target]
    module, _, attr = target.rpartition('.')
    if module:
        try:
            return getattr(importlib.import_module(module), attr)
        except (ImportError, AttributeError):
            pass
    raise ValueError(f'Cannot resolve _target_: {target!r}')


def instantiate(cfg, **kwargs):
    """Build the object described by a ``_target_`` config node."""
    if cfg is None:
        return None
    cfg = dict(cfg)
    target = cfg.pop('_target_')
    fn = resolve_target(target)
    call_args = {**cfg, **kwargs}
    return fn(**call_args)
