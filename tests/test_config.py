"""Config system tests: groups, overrides, interpolation, instantiation."""

import pytest

from wav2letter_pytorch_tpu.config import (instantiate, load_config,
                                           resolve_target)
from wav2letter_pytorch_tpu.decoding import GreedyDecoder


def _load(*overrides, complete=False):
    return load_config(['data.train_manifest=train.csv',
                        'data.val_manifest=val.csv', *overrides]
                       if complete else list(overrides),
                       require_complete=complete)


def test_defaults_compose():
    cfg = _load(complete=True)
    assert cfg.model.name == 'wav2letter'
    assert cfg.model.audio_conf.sample_rate == 16000
    assert cfg.model.optimizer['_target_'] == 'torch.optim.SGD'
    assert len(cfg.model.layers) == 20
    assert cfg.model.mid_layers == 1


def test_missing_mandatory_raises():
    with pytest.raises(ValueError, match='train_manifest'):
        load_config([])


def test_group_swap_and_dotted_overrides():
    cfg = _load('model=jasper', 'data.batch_size=8', 'model.mid_layers=3',
                complete=True)
    assert cfg.model.name == 'jasper'
    assert len(cfg.model.jasper_blocks) == 15
    assert cfg.data.batch_size == 8
    assert cfg.model.mid_layers == 3


def test_quartznet_group_builds():
    """model=quartznet: QuartzNet-15x5 on the Jasper block machinery
    (beyond-reference config; truncated build must forward cleanly)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from wav2letter_pytorch_tpu.training import build_labels, build_model

    cfg = _load('model=quartznet', complete=True)
    assert cfg.model.name == 'jasper'
    assert len(cfg.model.jasper_blocks) == 18
    assert cfg.model.mid_layers == 18
    assert [b.get('repeat', 1) for b in cfg.model.jasper_blocks[1:4]] == [5] * 3
    cfg = _load('model=quartznet', 'model.mid_layers=2', complete=True)
    labels = build_labels(cfg.model)
    model = build_model(cfg.model, num_labels=len(labels))
    x = jnp.asarray(np.zeros((1, 48, 64), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([48]),
                           train=False)
    probs, lens = model.apply(variables, x, jnp.array([48]), train=False)
    assert probs.shape == (1, 24, len(labels)) and int(lens[0]) == 24


def test_interpolation():
    cfg = _load('model.input_size=48', complete=True)
    assert cfg.data.mel_spec == 48
    assert cfg.data.audio_conf.sample_rate == 16000


def test_audio_group_8k():
    cfg = _load('audio=standard_8k', complete=True)
    assert cfg.model.audio_conf.sample_rate == 8000


def test_unknown_override_key_rejected_without_plus():
    with pytest.raises(KeyError):
        _load('data.nonexistent_knob=1', complete=True)
    cfg = _load('+data.nonexistent_knob=1', complete=True)
    assert cfg.data.nonexistent_knob == 1


def test_yaml_typed_values():
    cfg = _load('trainer.max_steps=100', 'data.shuffle=false', complete=True)
    assert cfg.trainer.max_steps == 100
    assert cfg.data.shuffle is False


def test_instantiate_decoder_reference_style_target():
    # Reference configs say `_target_: decoder.GreedyDecoder`; the registry
    # maps that onto our implementation.
    dec = instantiate({'_target_': 'decoder.GreedyDecoder',
                       'labels': ['_', 'a', ' ']})
    assert isinstance(dec, GreedyDecoder)
    assert dec.labels == ['_', 'a', ' ']


def test_instantiate_from_config_tree():
    cfg = _load(complete=True)
    dec = instantiate(cfg.model.decoder)
    assert isinstance(dec, GreedyDecoder)
    assert len(dec.labels) == 29  # english_lowercase + blank + space


def test_resolve_target_import_path():
    fn = resolve_target('wav2letter_pytorch_tpu.optim.exponential_lr')
    assert callable(fn)
    with pytest.raises(ValueError):
        resolve_target('no.such.module.Thing')


def test_pretty_print():
    cfg = _load(complete=True)
    text = cfg.pretty()
    assert 'train_manifest: train.csv' in text


def test_embedded_interpolation():
    """Hydra-style embedded interpolation: "prefix-${a.b}" substitutes the
    stringified target (used to silently pass through as a literal)."""
    from wav2letter_pytorch_tpu.config import load_config
    cfg = load_config(['data.train_manifest=x', 'data.val_manifest=y',
                       '+trainer.run_name=w2l-${model.input_size}-deep'])
    assert cfg.trainer.run_name == f'w2l-{cfg.model.input_size}-deep'


def test_embedded_interpolation_unknown_path_errors():
    import pytest
    from wav2letter_pytorch_tpu.config import load_config
    with pytest.raises(KeyError, match='no.such'):
        load_config(['data.train_manifest=x', 'data.val_manifest=y',
                     '+trainer.run_name=a-${no.such.key}'])


def test_malformed_layer_spec_diagnostic():
    """`{output_size:24}` (no space) must fail with a config-level message,
    not an opaque KeyError inside flax."""
    import pytest
    from wav2letter_pytorch_tpu.config import load_config
    from wav2letter_pytorch_tpu.training import build_model
    cfg = load_config(['data.train_manifest=x', 'data.val_manifest=y',
                       'model.layers=[{output_size:24, kernel_size:7}]'])
    with pytest.raises(ValueError, match='space after each colon'):
        build_model(cfg.model, num_labels=29)
