"""String metrics (WER/CER/length-ratio) with corpus-ratio aggregation.

Parity surface: /root/reference/base_asr_models.py:53-69
(``add_string_metrics``): greedy-decode the batch, accumulate
(distance, denominator) pairs per sample, report corpus ratios plus the
decoded/reference length ratio, and print a random (reference, decoded)
sample with probability ``print_decoded_prob``.
"""

from __future__ import annotations

import random

import numpy as np


def string_metrics(decoder, outputs, output_lengths, texts, prefix: str,
                   batch_mask=None, print_decoded_prob: float = 0.0,
                   rng: random.Random | None = None) -> dict:
    """Compute {prefix}_cer / {prefix}_wer / {prefix}_len_ratio.

    ``outputs``: [B, T, L] probabilities/log-probabilities, or [B, T]
    pre-argmaxed ids from an on-device argmax (greedy argmax is invariant
    to the monotone map). Rows where ``batch_mask`` is 0 (shape-padding
    rows) are skipped.
    """
    outputs = np.asarray(outputs)
    sizes = np.asarray(output_lengths)
    if outputs.ndim == 2:
        decoded = decoder.decode_ids(outputs, sizes)
    else:
        decoded = decoder.decode(outputs, sizes)
    rng = rng or random
    if texts and rng.random() < print_decoded_prob:
        print(f'reference: {texts[0]}')
        print(f'decoded  : {decoded[0]}')

    cer_sum = cer_denom = wer_sum = wer_denom = 0
    dec_len = ref_len = 0
    for j, expected in enumerate(texts):
        if batch_mask is not None and not batch_mask[j]:
            continue
        predicted = decoded[j]
        c, cd = decoder.cer_ratio(expected, predicted)
        w, wd = decoder.wer_ratio(expected, predicted)
        cer_sum += c
        cer_denom += cd
        wer_sum += w
        wer_denom += wd
        dec_len += len(predicted)
        ref_len += len(expected)
    return {
        f'{prefix}_cer': cer_sum / max(cer_denom, 1),
        f'{prefix}_wer': wer_sum / max(wer_denom, 1),
        f'{prefix}_len_ratio': dec_len / max(ref_len, 1),
    }


class RatioAccumulator:
    """Corpus-level (numerator, denominator) accumulation across batches."""

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.denoms: dict[str, float] = {}

    def add(self, key: str, num: float, denom: float):
        self.sums[key] = self.sums.get(key, 0.0) + num
        self.denoms[key] = self.denoms.get(key, 0.0) + denom

    def ratios(self) -> dict:
        return {k: self.sums[k] / max(self.denoms[k], 1e-12)
                for k in self.sums}
