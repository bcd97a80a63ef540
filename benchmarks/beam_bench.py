#!/usr/bin/env python
"""Beam-search throughput: batched on-device search vs serial host searches.

Eval of a real corpus with beam decoding was host-bound: the C++ search
(native/beam_search.cpp) is fast per utterance but serial, and this host has
one core. The on-device search (decoding/beam_device.py) decodes the whole
batch in one jit program. Workload: B x [T, V] realistic peaky posteriors
(trained-model-like), k=16. Prints one JSON line with the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, V = 16, 400, 29
K = 16
REPS = 3


def peaky_posteriors(rng, T, V):
    """Blank-dominated rows with occasional char spikes — the shape a
    trained CTC model emits (random-uniform rows would explode the beam)."""
    logits = rng.standard_normal((T, V)) * 2.0
    logits[:, 0] += 3.0  # blank prior
    spikes = rng.integers(1, V, size=T)
    spike_mask = rng.random(T) < 0.25
    logits[np.arange(T), spikes] += np.where(spike_mask, 7.0, 0.0)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def main():
    from wav2letter_pytorch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from wav2letter_pytorch_tpu.data import label_sets
    from wav2letter_pytorch_tpu.decoding.beam_device import beam_search_device
    from wav2letter_pytorch_tpu.decoding.beam_native import (
        native_available, prefix_beam_search_native)

    labels = label_sets.resolve_labels('english_lowercase')
    rng = np.random.default_rng(0)
    probs = np.stack([peaky_posteriors(rng, T, V) for _ in range(B)])
    lengths = np.full((B,), T, np.int32)
    lp = np.log(probs)

    # --- batched device search ------------------------------------------
    beam_search_device(lp, lengths, labels, k=K)          # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        device_out = beam_search_device(lp, lengths, labels, k=K)
    device_s = (time.perf_counter() - t0) / REPS

    # --- serial C++ host search ------------------------------------------
    assert native_available(), 'native library not built'
    t0 = time.perf_counter()
    native_out = [prefix_beam_search_native(probs[b], labels, 0, None, K,
                                            0.3, 5.0, 1e-3)
                  for b in range(B)]
    native_s = time.perf_counter() - t0

    agree = sum(
        ''.join(labels[i] for i in device_out[b][0][0]) == native_out[b]
        for b in range(B))

    print(json.dumps({
        'workload': f'B={B}, T={T}, V={V}, k={K} prefix beam search',
        'device_batch_ms': round(device_s * 1e3, 1),
        'cxx_serial_ms': round(native_s * 1e3, 1),
        'speedup': round(native_s / device_s, 1),
        'strings_agree': f'{agree}/{B}',
    }))


if __name__ == '__main__':
    main()
