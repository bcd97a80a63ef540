#!/usr/bin/env python
"""Roofline estimate of the reference's training throughput on an A100.

BASELINE.json's second north star is ">5x utterances/sec/chip vs A100
reference training", but no A100 is reachable from this environment and the
reference publishes no numbers (BASELINE.md). This script produces the
honest comparison point: a physics-based estimate of what the reference
computation (/root/reference/wav2letter.py + data_loader.py) could achieve
on one A100, bounded from above by the GPU's published peak and from the
side by the reference's own host-bound input pipeline.

Method
------
1. Device roofline: the flagship workload (w2l-20, 8 s utterances, T=800
   frames) costs a measured 0.1224 TFLOP/utt forward (counted from the real
   layer spec in benchmarks/step_breakdown.py), x3 for fwd+bwd. A100 dense
   bf16 peak is 312 TFLOPS (NVIDIA A100 datasheet). Real conv1d stacks in
   torch/cuDNN run well below peak; we report a band (40-70% of peak,
   bracketing published MLPerf-class conv efficiencies) plus the 100% bound.
2. Host-bound input pipeline: the reference extracts features per-sample on
   CPU inside DataLoader workers (data_loader.py:33-88) and greedy-decodes +
   Levenshteins every batch on host (base_asr_models.py:53-69,83). We
   measure the per-utterance CPU cost of the exact feature computation
   (torch.stft pipeline) on this host, single-thread, and scale by a worker
   count. Whichever of (1) and (2) is smaller caps reference throughput.

Prints one JSON line and writes benchmarks/a100_estimate.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch

SR = 16000
SECONDS = 8
N_MELS = 64

# Forward TFLOP per utterance for w2l-20 at T=800 frames, counted from the
# real layer spec (benchmarks/step_breakdown.py:88-97). Backward for a conv
# stack is ~2x forward (dgrad + wgrad), so train step ~= 3x forward.
MODEL_FWD_TFLOP_PER_UTT = 1.959 / 16
TRAIN_TFLOP_PER_UTT = 3 * MODEL_FWD_TFLOP_PER_UTT

A100_BF16_DENSE_TFLOPS = 312.0      # NVIDIA A100 80GB datasheet, dense
EFFICIENCY_BAND = (0.40, 0.70)      # torch/cuDNN conv1d stacks, dynamic
                                    # shapes -> low end; tuned static -> high
DATALOADER_WORKERS = 16             # generous for a DGX-class host


def measure_feature_cpu_seconds_per_utt() -> float:
    """Single-thread CPU cost of the reference's per-sample feature pipeline
    (dither -> preemph -> torch.stft -> |.|^2 -> mel -> log1p -> norm),
    exactly as data_loader.py:65-88 computes it."""
    from torch_reference_bench import _mel_fb
    torch.set_num_threads(1)
    fb = _mel_fb()
    window = torch.hamming_window(320, periodic=False)
    x = torch.randn(SR * SECONDS)

    def one():
        y = x + 1e-5 * torch.randn_like(x)
        y = torch.cat([y[:1], y[1:] - 0.97 * y[:-1]])
        spec = torch.stft(y, n_fft=512, hop_length=160, win_length=320,
                          window=window, center=True, return_complex=True)
        power = spec.real ** 2 + spec.imag ** 2
        mel = fb @ power
        m = torch.log1p(mel + 2 ** -24)
        m = (m - m.mean(dim=1, keepdim=True)) / (m.std(dim=1, keepdim=True)
                                                 + 1e-5)
        return m

    for _ in range(3):
        one()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        one()
    return (time.perf_counter() - t0) / reps


def main():
    feat_s = measure_feature_cpu_seconds_per_utt()
    input_cap = DATALOADER_WORKERS / feat_s  # utt/s the loader can feed

    roofline_100 = A100_BF16_DENSE_TFLOPS / TRAIN_TFLOP_PER_UTT
    band_lo = EFFICIENCY_BAND[0] * roofline_100
    band_hi = EFFICIENCY_BAND[1] * roofline_100

    est_lo = min(band_lo, input_cap)
    est_hi = min(band_hi, input_cap)

    # Our measured number, if a bench result is on disk.
    ours = None
    for name in ('BENCH_r02.json', 'BENCH_r01.json'):
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name)
        if os.path.exists(p):
            with open(p) as f:
                try:
                    d = json.load(f)
                    ours = d.get('value') or d.get('parsed', {}).get('value')
                except Exception:
                    ours = None
            if ours:
                break

    out = {
        'workload': 'w2l-20, 8s utterances @16kHz, full train step',
        'train_tflop_per_utt': round(TRAIN_TFLOP_PER_UTT, 4),
        'a100_bf16_dense_tflops': A100_BF16_DENSE_TFLOPS,
        'a100_roofline_100pct_utt_s': round(roofline_100, 1),
        'a100_estimate_utt_s': [round(est_lo, 1), round(est_hi, 1)],
        'a100_efficiency_band': list(EFFICIENCY_BAND),
        'host_feature_cpu_s_per_utt': round(feat_s, 5),
        'host_input_pipeline_cap_utt_s': round(input_cap, 1),
        'assumed_dataloader_workers': DATALOADER_WORKERS,
        'tpu_measured_utt_s_per_chip': ours,
        'tpu_vs_a100_estimate': ([round(ours / est_hi, 2),
                                  round(ours / est_lo, 2)]
                                 if ours else None),
        'note': ('>5x vs A100 per chip is unreachable by roofline for this '
                 'compute-bound workload: it would need 5*312*eff effective '
                 'TFLOPS on a chip whose practical bf16 peak is 162.6 TFLOPS '
                 '(benchmarks/peak_flops.py). The achievable and achieved '
                 'claim is hardware-efficiency superiority: ~97% of chip '
                 'peak vs the 40-70% typical of the reference stack.'),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'a100_estimate.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
