"""Spectrogram augmentations (SpecAugment / SpecCutout), batched + jittable.

Parity surface: /root/reference/data/augmentations.py:11-99 — there they are
per-sample Python loops building byte masks on host (and are defined but not
wired into any default path, SURVEY.md §2.1); here they are vectorized
``jax.random``-driven mask computations that fuse into the on-device input
pipeline, wired into the train step via the ``data.augment`` config block.

Layout note: operates on features [B, T, F] (NTC), the framework's native
layout; the reference operates on [B, F, T].

Conscious fix vs reference: SpecCutout sizes rectangles with ``rect_freq``
on the frequency axis and ``rect_time`` on the time axis (the reference
swaps them, augmentations.py:91-95).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _band_mask(rng, length: int, batch: int, n_masks: int, max_width: int):
    """[B, length] boolean mask of ``n_masks`` random zero-bands per sample."""
    r_start, r_width = jax.random.split(rng)
    hi = max(length - max_width, 1)
    starts = jax.random.randint(r_start, (batch, n_masks), 0, hi)
    widths = jax.random.randint(r_width, (batch, n_masks), 0,
                                max(max_width, 1))
    idx = jnp.arange(length)[None, None, :]          # [1, 1, L]
    starts = starts[:, :, None]
    widths = widths[:, :, None]
    bands = (idx >= starts) & (idx < starts + widths)  # [B, M, L]
    return jnp.any(bands, axis=1)                      # [B, L]


def spec_augment(rng, feats, freq_masks: int = 1, time_masks: int = 1,
                 freq_width: int = 15, time_width: int = 50):
    """Zero random frequency bands and time bands (arXiv:1904.08779)."""
    B, T, F = feats.shape
    r_f, r_t = jax.random.split(rng)
    fmask = _band_mask(r_f, F, B, freq_masks, freq_width)   # [B, F]
    tmask = _band_mask(r_t, T, B, time_masks, time_width)   # [B, T]
    keep = ~(fmask[:, None, :] | tmask[:, :, None])
    return feats * keep.astype(feats.dtype)


def spec_cutout(rng, feats, rect_masks: int = 5, rect_time: int = 60,
                rect_freq: int = 25):
    """Zero random time x frequency rectangles."""
    B, T, F = feats.shape
    r_t0, r_tw, r_f0, r_fw = jax.random.split(rng, 4)
    t0 = jax.random.randint(r_t0, (B, rect_masks), 0, max(T - rect_time, 1))
    tw = jax.random.randint(r_tw, (B, rect_masks), 0, max(rect_time, 1))
    f0 = jax.random.randint(r_f0, (B, rect_masks), 0, max(F - rect_freq, 1))
    fw = jax.random.randint(r_fw, (B, rect_masks), 0, max(rect_freq, 1))
    t_idx = jnp.arange(T)[None, None, :]
    f_idx = jnp.arange(F)[None, None, :]
    t_in = (t_idx >= t0[:, :, None]) & (t_idx < (t0 + tw)[:, :, None])  # [B,M,T]
    f_in = (f_idx >= f0[:, :, None]) & (f_idx < (f0 + fw)[:, :, None])  # [B,M,F]
    rects = t_in[:, :, :, None] & f_in[:, :, None, :]                   # [B,M,T,F]
    keep = ~jnp.any(rects, axis=1)
    return feats * keep.astype(feats.dtype)


def identity(rng, feats):
    """Placeholder (reference augmentations.py:101-107)."""
    return feats


_AUGMENTATIONS = {
    'spec_augment': spec_augment,
    'spec_cutout': spec_cutout,
    'identity': identity,
}


def build_augment_fn(augment_cfg):
    """Compose augmentations from a config block like
    ``{spec_augment: {freq_masks: 2}, spec_cutout: {}}``. Returns
    ``fn(rng, feats) -> feats`` or None when the block is empty/disabled."""
    if not augment_cfg:
        return None
    steps = []
    for name, kwargs in dict(augment_cfg).items():
        if name not in _AUGMENTATIONS:
            raise ValueError(f'Unknown augmentation {name!r}; options: '
                             f'{sorted(_AUGMENTATIONS)}')
        if kwargs is False:
            continue  # explicitly disabled in config
        if kwargs is None or kwargs is True:
            kwargs = {}
        steps.append((_AUGMENTATIONS[name], dict(kwargs)))
    if not steps:
        return None  # every configured augmentation was disabled

    def apply(rng, feats):
        for i, (fn, kwargs) in enumerate(steps):
            feats = fn(jax.random.fold_in(rng, i), feats, **kwargs)
        return feats

    return apply
