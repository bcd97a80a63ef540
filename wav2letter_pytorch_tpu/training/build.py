"""Config -> objects: model, frontend, optimizer, decoder.

Replaces the reference's Hydra ``instantiate`` wiring (train.py:33,
base_asr_models.py:22,73-76) with explicit factories. Optimizer/scheduler
``_target_`` names written for torch resolve onto the optax-based
equivalents with identical hyperparameter meaning.
"""

from __future__ import annotations

from .. import optim
from ..config import instantiate
from ..data.features import AudioConfig, SpectrogramFrontend
from ..data.label_sets import resolve_labels
from ..models import Jasper, Wav2Letter


def build_labels(model_cfg) -> list[str]:
    return resolve_labels(model_cfg['labels'])


def _check_layer_specs(layers, required, what):
    """Fail with a config-level message when a layer spec is malformed —
    e.g. a CLI override written `{output_size:24}` (no space after the
    colon) YAML-parses as the single scalar key 'output_size:24' and would
    otherwise surface as an opaque KeyError deep inside flax."""
    for i, layer in enumerate(layers):
        missing = [k for k in required if k not in layer]
        if missing:
            raise ValueError(
                f'{what}[{i}] is missing key(s) {missing}; got keys '
                f'{sorted(layer)}. If this came from a CLI override, note '
                'YAML flow maps need a space after each colon: '
                '{output_size: 24, kernel_size: 7, ...}')


def build_model(model_cfg, num_labels: int):
    name = model_cfg['name']
    mid_layers = int(model_cfg.get('mid_layers', 1))
    dtype = None
    if model_cfg.get('compute_dtype') in ('bf16', 'bfloat16'):
        import jax.numpy as jnp
        dtype = jnp.bfloat16
    init_mode = model_cfg.get('init_mode', 'xavier_uniform')
    if name == 'wav2letter':
        _check_layer_specs(model_cfg['layers'],
                           ('output_size', 'kernel_size', 'stride'),
                           'model.layers')
        return Wav2Letter(layers=[dict(l) for l in model_cfg['layers']],
                          num_labels=num_labels, mid_layers=mid_layers,
                          dtype=dtype, init_mode=init_mode,
                          padding_mode=model_cfg.get('padding_mode', 'reflect'))
    if name == 'jasper':
        _check_layer_specs(model_cfg['jasper_blocks'],
                           ('layer_size', 'kernel_size'),
                           'model.jasper_blocks')
        return Jasper(jasper_blocks=[dict(b) for b in model_cfg['jasper_blocks']],
                      num_labels=num_labels, mid_layers=mid_layers,
                      dtype=dtype, init_mode=init_mode,
                      remat=bool(model_cfg.get('remat', False)),
                      dropout_default=float(
                          model_cfg.get('dropout_default', 0.0)))
    raise ValueError(f'Unknown model name: {name!r} '
                     "(expected 'wav2letter' or 'jasper')")


def model_input_size(model_cfg) -> int:
    """input_size default: 1 + nfft/2 from the audio conf
    (reference wav2letter.py:53-57)."""
    if model_cfg.get('input_size'):
        return int(model_cfg['input_size'])
    ac = model_cfg['audio_conf']
    nfft = ac['sample_rate'] * ac['window_size']
    return int(1 + nfft / 2)


def load_run(run_dir: str, dither: float = 0.0,
             average_last: int | None = None):
    """Load a training run directory with its latest checkpoint restored.

    ``average_last``: restore the newest K checkpoints and average their
    weights (checkpoint.average_checkpoints) instead of taking the latest.
    Returns (cfg, trainer, model, frontend, labels) — the shared recipe of
    test.py / scripts/export_serving.py / scripts/stream_demo.py.
    """
    import os

    import numpy as np
    import yaml

    import jax

    from ..config import ConfigNode
    from .checkpoint import Checkpointer
    from .trainer import Trainer

    with open(os.path.join(run_dir, 'config.yaml')) as f:
        cfg = ConfigNode.wrap(yaml.safe_load(f))
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    frontend = build_frontend(cfg.model, dither=dither)
    optimizer, schedule = build_optimizer(cfg.model, 1, 1)
    trainer = Trainer(cfg, model, frontend, optimizer, schedule,
                      build_decoder(cfg.model, labels), run_dir=run_dir)
    sr = int(cfg.model.audio_conf.sample_rate)
    nb = len(trainer.mesh.devices.ravel())  # init batch must shard evenly
    trainer.init_state(dict(
        audio=np.zeros((nb, sr), np.float32),
        audio_lengths=np.full((nb,), sr, np.int32),
        targets=np.ones((nb, 8), np.int32),
        target_lengths=np.full((nb,), 4, np.int32),
        batch_mask=np.ones((nb,), np.float32)))
    ckpt = Checkpointer(os.path.join(run_dir, 'checkpoints'))
    if ckpt.latest_step() is None:
        raise FileNotFoundError(f'no checkpoint under {run_dir}')
    template = jax.device_get(trainer.state)
    if average_last and average_last > 1:
        from .checkpoint import average_checkpoints
        trainer.state = average_checkpoints(ckpt, template, average_last)
    else:
        trainer.state = ckpt.restore(template)
    return cfg, trainer, model, frontend, labels


def build_frontend(model_cfg, dither: float | None = None,
                   normalize: bool = True,
                   norm_stats=None) -> SpectrogramFrontend:
    ac = model_cfg['audio_conf']
    conf = AudioConfig(sample_rate=int(ac['sample_rate']),
                       window_size=float(ac['window_size']),
                       window_stride=float(ac['window_stride']),
                       window=ac.get('window', 'hamming'))
    kwargs = {} if dither is None else {'dither': dither}
    if not normalize:
        kwargs['normalize'] = False
    if norm_stats is not None:
        kwargs['norm_stats'] = norm_stats
    method = model_cfg.get('stft_method', 'auto') or 'auto'
    if method == 'auto':
        # Fused Pallas kernel on TPU (ops/stft_pallas.py, ~20% faster than
        # the strided-conv XLA path); conv elsewhere.
        import jax
        method = 'pallas' if jax.default_backend() == 'tpu' else 'conv'
    return SpectrogramFrontend(conf, n_mels=model_input_size(model_cfg),
                               stft_method=method,
                               feature_type=model_cfg.get('feature_type',
                                                          'logmel'),
                               n_mfcc=model_cfg.get('n_mfcc'),
                               **kwargs)


def build_decoder(model_cfg, labels):
    dec_cfg = dict(model_cfg['decoder'])
    dec_cfg['labels'] = list(labels)
    return instantiate(dec_cfg)


_SCHED_TARGETS = {
    'torch.optim.lr_scheduler.ExponentialLR': 'exponential',
    'wav2letter_pytorch_tpu.optim.exponential_lr': 'exponential',
    'torch.optim.lr_scheduler.OneCycleLR': 'one_cycle',
    'wav2letter_pytorch_tpu.optim.one_cycle_lr': 'one_cycle',
}

_OPT_TARGETS = {
    'torch.optim.SGD': 'sgd',
    'wav2letter_pytorch_tpu.optim.sgd': 'sgd',
    'novograd.Novograd': 'novograd',
    'wav2letter_pytorch_tpu.optim.novograd': 'novograd',
    'torch.optim.AdamW': 'adamw',
}


def build_optimizer(model_cfg, steps_per_epoch: int, total_steps: int):
    """Returns (optax transformation, lr schedule fn) from the config."""
    opt_cfg = dict(model_cfg['optimizer'])
    sched_cfg = dict(model_cfg.get('scheduler') or {})

    opt_target = opt_cfg.pop('_target_')
    kind = _OPT_TARGETS.get(opt_target)
    if kind is None:
        raise ValueError(f'Unknown optimizer _target_: {opt_target!r}')
    base_lr = float(opt_cfg.pop('lr'))

    sched_kind = None
    if sched_cfg:
        sched_target = sched_cfg.pop('_target_')
        sched_kind = _SCHED_TARGETS.get(sched_target)
        if sched_kind is None:
            raise ValueError(f'Unknown scheduler _target_: {sched_target!r}')

    if sched_kind == 'exponential':
        schedule = optim.exponential_lr(base_lr, float(sched_cfg['gamma']),
                                        steps_per_epoch=steps_per_epoch)
    elif sched_kind == 'one_cycle':
        schedule = optim.one_cycle_lr(
            float(sched_cfg.get('max_lr', base_lr)),
            total_steps=int(sched_cfg.get('total_steps') or total_steps))
    else:
        schedule = optim.constant_lr(base_lr)

    if kind == 'sgd':
        tx = optim.sgd(schedule, momentum=float(opt_cfg.get('momentum', 0.0)),
                       nesterov=bool(opt_cfg.get('nesterov', False)),
                       weight_decay=float(opt_cfg.get('weight_decay', 0.0)))
    elif kind == 'novograd':
        tx = optim.novograd(
            schedule, betas=tuple(opt_cfg.get('betas', (0.95, 0.0))),
            eps=float(opt_cfg.get('eps', 1e-8)),
            weight_decay=float(opt_cfg.get('weight_decay', 0.0)),
            grad_averaging=bool(opt_cfg.get('grad_averaging', False)),
            amsgrad=bool(opt_cfg.get('amsgrad', False)))
    else:
        tx = optim.adamw(schedule,
                         weight_decay=float(opt_cfg.get('weight_decay', 0.01)))
    return tx, schedule
