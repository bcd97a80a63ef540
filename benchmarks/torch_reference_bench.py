#!/usr/bin/env python
"""Measure the reference implementation's training-step throughput in torch.

The reference repo publishes no benchmark numbers (BASELINE.md), and its own
entry point needs pytorch_lightning + hydra (absent here), so this script
reproduces the reference's per-step computation exactly — per-sample CPU
spectrogram extraction (torch.stft pipeline, data_loader.py:33-88), the
20-layer Wav2Letter conv stack with reflect padding / BN / clamp
(wav2letter.py:12-92), CTCLoss(blank=0, mean, zero_infinity)
(base_asr_models.py:23,81) and an SGD(momentum .9, nesterov, wd 1e-5) step —
on the same synthetic 8-second workload bench.py uses, and records
utterances/sec into baseline_measured.json.

Run on the benchmark host:  python benchmarks/torch_reference_bench.py
"""

from __future__ import annotations

import json
import math
import os
import platform
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
SECONDS = 8
SR = 16000
N_MELS = 64
WARMUP = 1
STEPS = 3

W2L_SPECS = ([(256, 11, 2, 1, 0.2)] + [(256, 11, 1, 1, 0.2)] * 3
             + [(384, 13, 1, 1, 0.2)] * 3 + [(512, 17, 1, 1, 0.2)] * 3
             + [(640, 21, 1, 1, 0.3)] * 3 + [(768, 25, 1, 1, 0.3)] * 3
             + [(896, 29, 1, 2, 0.4)] * 3 + [(1024, 1, 1, 1, 0.4)])


def _mel_fb():
    from wav2letter_pytorch_tpu.data.features import mel_filterbank
    return torch.tensor(mel_filterbank(SR, 512, N_MELS))


class RefBlock(nn.Module):
    """Conv1d block with the reference's structure (wav2letter.py:12-47)."""

    def __init__(self, cin, cout, k, stride, dilation, dropout, bn=True,
                 act=True):
        super().__init__()
        pad = max(0, (math.ceil(cin / stride) - 1) * stride
                  + (k - 1) * dilation + 1 - cin)  # reference formula
        self.pad = nn.ReflectionPad1d((pad // 2, (pad + 1) // 2)) if pad \
            else nn.Identity()
        self.conv = nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation)
        self.bn = nn.BatchNorm1d(cout, momentum=0.9, eps=1e-3) if bn \
            else nn.Identity()
        self.drop = nn.Dropout(dropout) if dropout != -1 else nn.Identity()
        self.act = act

    def forward(self, x):
        x = self.drop(self.bn(self.conv(self.pad(x))))
        return torch.clamp(x, 0, 20) if self.act else x


def build_model(num_labels=29):
    layers = []
    cin = N_MELS
    for cout, k, s, d, p in W2L_SPECS:
        layers.append(RefBlock(cin, cout, k, s, d, p))
        cin = cout
    layers.append(RefBlock(cin, num_labels, 1, 1, 1, -1, bn=False, act=False))
    return nn.Sequential(*layers)


def extract_features(audio_batch, fb, window):
    """Per-sample CPU pipeline, as in the reference's DataLoader workers."""
    feats = []
    for audio in audio_batch:
        x = torch.tensor(audio) + torch.randn(audio.shape) * 1e-5
        x = torch.cat((x[:1], x[1:] - 0.97 * x[:-1]), dim=0)
        spec = torch.stft(x, n_fft=512, hop_length=160, win_length=320,
                          center=True, window=window, return_complex=True)
        power = spec.abs() ** 2
        mel = fb @ power
        m = torch.log1p(mel + 2 ** -24)
        mean, std = m.mean(dim=1, keepdim=True), m.std(dim=1, keepdim=True)
        feats.append((m - mean) / (std + 1e-5))
    return torch.stack(feats)


def main():
    torch.manual_seed(0)
    model = build_model()
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=1e-5, momentum=0.9,
                          nesterov=True, weight_decay=1e-5)
    crit = nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)
    fb = _mel_fb()
    window = torch.hamming_window(320, periodic=False)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((BATCH, SECONDS * SR)) * 0.1).astype(np.float32)
    targets = torch.tensor(rng.integers(1, 29, size=(BATCH, 100)),
                           dtype=torch.int32)
    target_lengths = torch.full((BATCH,), 100, dtype=torch.int32)

    def one_step():
        feats = extract_features(audio, fb, window)
        out = model(feats)  # [B, L, T']
        out = out.transpose(1, 2)
        log_probs = torch.nn.functional.log_softmax(out, dim=-1)
        out_lens = torch.full((BATCH,), log_probs.shape[1], dtype=torch.int32)
        loss = crit(log_probs.transpose(0, 1), targets, out_lens,
                    target_lengths)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(WARMUP):
        one_step()
    t0 = time.perf_counter()
    for _ in range(STEPS):
        one_step()
    dt = time.perf_counter() - t0
    utt_per_sec = BATCH * STEPS / dt

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'baseline_measured.json')
    record = {
        'utterances_per_sec': round(utt_per_sec, 3),
        'workload': f'w2l-20L, batch {BATCH}, {SECONDS}s audio @ {SR} Hz, '
                    'train step incl. feature extraction',
        'implementation': 'torch CPU re-creation of the reference per-step '
                          'computation (reference cannot run: lightning/hydra '
                          'absent; it publishes no numbers)',
        'host': platform.platform(),
        'torch_threads': torch.get_num_threads(),
        'measured_unix_time': time.time(),
    }
    with open(out_path, 'w') as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
