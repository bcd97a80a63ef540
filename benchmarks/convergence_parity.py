#!/usr/bin/env python
"""Controlled convergence comparison: this framework vs the reference
computation (torch), on IDENTICAL data, init, and optimizer.

The reference's de-facto end-to-end validation is a real LibriSpeech train
(/root/reference/examples/librispeech.sh:5-8) which needs network access.
This is the network-free equivalent: both frameworks train the same
Wav2Letter stack (reference wav2letter.py:12-92 semantics: reflect-SAME pad
-> conv -> BN(0.9/1e-3) -> clamp(0,20), CTC 'mean', SGD momentum/nesterov/
weight-decay) from the SAME initial parameters on the SAME synthetic-speech
batches (features precomputed once with this repo's frontend so the
comparison isolates model/loss/optimizer parity; frontend parity has its own
golden tests vs torch.stft in tests/test_features.py).

Emits benchmarks/convergence_parity.json: per-epoch loss trajectories for
both frameworks, their relative deviation, and final greedy val WER each.

    python benchmarks/convergence_parity.py [--epochs 20] [--n-train 96]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'scripts'))

# Parity model: 3 conv blocks + 1x1 head. Channels/frame-counts are kept
# even so the reference's channel-based pad formula (wav2letter.py:24-27)
# and time-based SAME padding coincide exactly ((k-2) for the stride-2
# block, k-1 elsewhere).
LAYERS = [
    {'output_size': 48, 'kernel_size': 7, 'stride': 2, 'dilation': 1,
     'dropout': -1.0},
    {'output_size': 48, 'kernel_size': 7, 'stride': 1, 'dilation': 1,
     'dropout': -1.0},
    {'output_size': 64, 'kernel_size': 7, 'stride': 1, 'dilation': 1,
     'dropout': -1.0},
]
LR = 5e-4
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-5
BATCH = 16
N_MELS = 64


def make_batches(root, n_train, n_val, epochs):
    """Synthetic corpus -> per-epoch feature batches, identical for both
    frameworks. Features come from this repo's frontend (dither off)."""
    import jax
    from train_synthetic_demo import make_corpus
    from wav2letter_pytorch_tpu.data.dataset import (BucketBatchLoader,
                                                     ManifestDataset)
    from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                      SpectrogramFrontend)

    manifests = make_corpus(root, n_train=n_train, n_val=n_val)
    audio_conf = {'sample_rate': 16000, 'window_size': 0.02,
                  'window_stride': 0.01, 'window': 'hamming'}
    frontend = SpectrogramFrontend(
        AudioConfig(16000, 0.02, 0.01, 'hamming'), n_mels=N_MELS, dither=0.0)
    fe = jax.jit(frontend)

    def featurize(loader):
        out = []
        for b in loader:
            feats, flens = fe(b['audio'], b['audio_lengths'])
            out.append(dict(feats=np.asarray(feats),
                            flens=np.asarray(flens),
                            targets=b['targets'], tlens=b['target_lengths'],
                            texts=b['texts']))
        return out

    ds = ManifestDataset(manifests['train'], audio_conf, 'english_lowercase')
    loader = BucketBatchLoader(ds, BATCH, num_buckets=1, shuffle=True, seed=0,
                               prefetch=0, drop_last=True, frame_hop=160)
    epoch_batches = [featurize(loader) for _ in range(epochs)]
    vds = ManifestDataset(manifests['val'], audio_conf, 'english_lowercase')
    vloader = BucketBatchLoader(vds, BATCH, num_buckets=1, shuffle=False,
                                prefetch=0, frame_hop=160)
    val_batches = featurize(vloader)
    return epoch_batches, val_batches, ds.labels


# --------------------------------------------------------------------- JAX
def run_jax(epoch_batches, val_batches, labels, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    from wav2letter_pytorch_tpu.models import Wav2Letter
    from wav2letter_pytorch_tpu.ops.ctc import ctc_loss
    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean

    model = Wav2Letter(layers=LAYERS, num_labels=len(labels),
                       mid_layers=len(LAYERS), precision='highest')
    b0 = epoch_batches[0][0]
    variables = jax.jit(lambda r, f: model.init(r, f, train=False))(
        jax.random.PRNGKey(seed), b0['feats'][:1])
    params, stats = variables['params'], variables['batch_stats']
    tx = optim.sgd(optim.constant_lr(LR), momentum=MOMENTUM, nesterov=True,
                   weight_decay=WEIGHT_DECAY)
    opt_state = tx.init(params)
    scaling = model.scaling_factor

    @jax.jit
    def step(params, stats, opt_state, feats, flens, targets, tlens):
        def loss_fn(p):
            (out, _), mut = model.apply(
                {'params': p, 'batch_stats': stats}, feats, train=True,
                mutable=['batch_stats'])
            out_lens = flens // scaling
            mask = jnp.ones((feats.shape[0],), jnp.float32)
            return masked_ctc_mean(out, out_lens, targets, tlens, mask,
                                   ctc_loss), mut['batch_stats']
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, \
            loss

    losses = []
    for batches in epoch_batches:
        ep = []
        for b in batches:
            params, stats, opt_state, loss = step(
                params, stats, opt_state, b['feats'], b['flens'],
                b['targets'], b['tlens'])
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))

    @jax.jit
    def infer(feats, flens):
        out, out_lens = model.apply({'params': params, 'batch_stats': stats},
                                    feats, flens, train=False)
        return out, out_lens

    decoder = GreedyDecoder(list(labels))
    w = d = 0
    for b in val_batches:
        out, out_lens = infer(b['feats'], b['flens'])
        decoded = decoder.decode(np.asarray(out), np.asarray(out_lens))
        for j, text in enumerate(b['texts']):
            dist, den = decoder.wer_ratio(text, decoded[j])
            w, d = w + dist, d + den
    return dict(losses=losses, val_wer=w / max(d, 1)), variables


# ------------------------------------------------------------------- torch
def run_torch(epoch_batches, val_batches, labels, jax_variables):
    import torch
    import torch.nn as nn
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder

    torch.manual_seed(0)

    class RefBlock(nn.Module):
        """Reference Conv1dBlock (wav2letter.py:12-47), channel-based pad."""

        def __init__(self, cin, cout, k, stride, dilation, bn=True, act=True):
            super().__init__()
            pad = max(0, (math.ceil(cin / stride) - 1) * stride
                      + (k - 1) * dilation + 1 - cin)
            self.pad = nn.ReflectionPad1d((pad // 2, pad - pad // 2)) \
                if pad else nn.Identity()
            self.conv = nn.Conv1d(cin, cout, k, stride=stride,
                                  dilation=dilation)
            self.bn = nn.BatchNorm1d(cout, momentum=0.9, eps=1e-3) if bn \
                else nn.Identity()
            self.act = act

        def forward(self, x):
            x = self.bn(self.conv(self.pad(x)))
            return torch.clamp(x, 0, 20) if self.act else x

    blocks, cin = [], N_MELS
    for spec in LAYERS:
        blocks.append(RefBlock(cin, spec['output_size'], spec['kernel_size'],
                               spec['stride'], spec['dilation']))
        cin = spec['output_size']
    blocks.append(RefBlock(cin, len(labels), 1, 1, 1, bn=False, act=False))
    model = nn.Sequential(*blocks)

    # Copy the JAX initial parameters (flax conv kernel [K, Cin, Cout] ->
    # torch [Cout, Cin, K]) so both trainings start from the same point.
    params = jax_variables['params']
    with torch.no_grad():
        for i, block in enumerate(blocks):
            p = params[f'conv1d_{i}']
            block.conv.weight.copy_(torch.tensor(
                np.asarray(p['Conv_0']['kernel']).transpose(2, 1, 0)))
            block.conv.bias.copy_(torch.tensor(np.asarray(
                p['Conv_0']['bias'])))
            if isinstance(block.bn, nn.BatchNorm1d):
                block.bn.weight.copy_(torch.tensor(np.asarray(
                    p['BatchNorm_0']['scale'])))
                block.bn.bias.copy_(torch.tensor(np.asarray(
                    p['BatchNorm_0']['bias'])))

    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MOMENTUM,
                          nesterov=True, weight_decay=WEIGHT_DECAY)
    crit = nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)
    scaling = 1
    for spec in LAYERS:
        scaling *= spec['stride']

    losses = []
    model.train()
    for batches in epoch_batches:
        ep = []
        for b in batches:
            feats = torch.tensor(b['feats']).transpose(1, 2)  # [B, C, T]
            out = model(feats).transpose(1, 2)                # [B, T', L]
            log_probs = torch.nn.functional.log_softmax(out, dim=-1)
            out_lens = torch.tensor(b['flens'] // scaling, dtype=torch.int32)
            loss = crit(log_probs.transpose(0, 1),
                        torch.tensor(b['targets']), out_lens,
                        torch.tensor(b['tlens']))
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))

    model.eval()
    decoder = GreedyDecoder(list(labels))
    w = d = 0
    with torch.no_grad():
        for b in val_batches:
            feats = torch.tensor(b['feats']).transpose(1, 2)
            out = model(feats).transpose(1, 2)
            log_probs = torch.nn.functional.log_softmax(out, dim=-1).numpy()
            out_lens = b['flens'] // scaling
            decoded = decoder.decode(log_probs, out_lens)
            for j, text in enumerate(b['texts']):
                dist, den = decoder.wer_ratio(text, decoded[j])
                w, d = w + dist, d + den
    return dict(losses=losses, val_wer=w / max(d, 1))


# ------------------------------------------------------------ Jasper parity
# Small Jasper exercising exactly the machinery the w2l parity model does
# not: masked convs (zero-fill + float length arithmetic, reference
# jasper.py:69-132), separable depthwise+pointwise, BN-on-residual-branch
# with residual add (jasper.py:241-257,409-412), and NovoGrad
# (novograd.py:91-113). Dropout 0 for determinism.
JASPER_BLOCKS = [
    {'layer_size': 48, 'kernel_size': 11, 'stride': 2, 'residual': False,
     'separable': True, 'activation': 'relu', 'conv_mask': True},
    {'layer_size': 48, 'kernel_size': 13, 'repeat': 2, 'residual': True,
     'separable': True, 'activation': 'relu', 'conv_mask': True},
]
J_LR = 2e-3
J_BETAS = (0.95, 0.0)
J_WD = 1e-5


def run_jax_jasper(epoch_batches, val_batches, labels, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from wav2letter_pytorch_tpu import optim
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder
    from wav2letter_pytorch_tpu.models import Jasper
    from wav2letter_pytorch_tpu.ops.ctc import ctc_loss
    from wav2letter_pytorch_tpu.training.trainer import masked_ctc_mean

    model = Jasper(jasper_blocks=JASPER_BLOCKS, num_labels=len(labels),
                   mid_layers=len(JASPER_BLOCKS), precision='highest')
    b0 = epoch_batches[0][0]
    variables = jax.jit(
        lambda r, f, fl: model.init(r, f, fl, train=False))(
        jax.random.PRNGKey(seed), b0['feats'][:1], b0['flens'][:1])
    params, stats = variables['params'], variables['batch_stats']
    tx = optim.novograd(optim.constant_lr(J_LR), betas=J_BETAS,
                        weight_decay=J_WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, feats, flens, targets, tlens):
        def loss_fn(p):
            (out, out_lens), mut = model.apply(
                {'params': p, 'batch_stats': stats}, feats, flens,
                train=True, mutable=['batch_stats'])
            mask = jnp.ones((feats.shape[0],), jnp.float32)
            return masked_ctc_mean(out, out_lens, targets, tlens, mask,
                                   ctc_loss), mut['batch_stats']
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, \
            loss

    losses = []
    for batches in epoch_batches:
        ep = []
        for b in batches:
            params, stats, opt_state, loss = step(
                params, stats, opt_state, b['feats'], b['flens'],
                b['targets'], b['tlens'])
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))

    @jax.jit
    def infer(feats, flens):
        # eval emits probabilities (reference jasper.py:470-473)
        out, out_lens = model.apply({'params': params, 'batch_stats': stats},
                                    feats, flens, train=False)
        return jnp.log(jnp.maximum(out, 1e-30)), out_lens

    decoder = GreedyDecoder(list(labels))
    w = d = 0
    for b in val_batches:
        out, out_lens = infer(b['feats'], b['flens'])
        decoded = decoder.decode(np.asarray(out), np.asarray(out_lens))
        for j, text in enumerate(b['texts']):
            dist, den = decoder.wer_ratio(text, decoded[j])
            w, d = w + dist, d + den
    return dict(losses=losses, val_wer=w / max(d, 1)), variables


def run_torch_jasper(epoch_batches, val_batches, labels, jax_variables):
    """Reference-semantics torch replica (jasper.py:69-419, novograd.py:
    52-113), initialized from the SAME parameters as the JAX run."""
    import torch
    import torch.nn as nn
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder

    torch.manual_seed(0)

    def same_pad(k, s, d):
        return (d * k) // 2 - 1 if d > 1 else k // 2

    class TMaskedConv(nn.Conv1d):
        """Zero-fill past each sample's length, convolve, recompute float
        lengths with conv arithmetic (reference jasper.py:69-132)."""

        def forward(self, x, lens):
            if lens is not None:
                T = x.shape[-1]
                mask = (torch.arange(T)[None, :]
                        < lens.to(torch.int32)[:, None])
                x = x * mask[:, None, :].to(x.dtype)
                lens = (lens + 2 * self.padding[0]
                        - self.dilation[0] * (self.kernel_size[0] - 1) - 1) \
                    / self.stride[0] + 1
            return super().forward(x), lens

    class TSepUnit(nn.Module):
        """separable masked conv -> BN(eps 1e-3) (one repeat unit)."""

        def __init__(self, cin, cout, k, stride):
            super().__init__()
            pad = same_pad(k, stride, 1)
            self.dw = TMaskedConv(cin, cin, k, stride=stride, groups=cin,
                                  padding=pad, bias=False)
            self.pw = TMaskedConv(cin, cout, 1, bias=False)
            self.bn = nn.BatchNorm1d(cout, eps=1e-3)

        def forward(self, x, lens):
            x, lens = self.dw(x, lens)
            x, lens = self.pw(x, lens)
            return self.bn(x), lens

    class TResUnit(nn.Module):
        """residual 1x1 masked conv -> BN (reference jasper.py:241-257)."""

        def __init__(self, cin, cout):
            super().__init__()
            self.conv = TMaskedConv(cin, cout, 1, bias=False)
            self.bn = nn.BatchNorm1d(cout, eps=1e-3)

        def forward(self, x, lens):
            x, _ = self.conv(x, lens)
            return self.bn(x)

    class TJasper(nn.Module):
        def __init__(self, num_labels):
            super().__init__()
            self.b0 = TSepUnit(N_MELS, 48, 11, 2)
            self.b1r0 = TSepUnit(48, 48, 13, 1)
            self.b1r1 = TSepUnit(48, 48, 13, 1)
            self.b1res = TResUnit(48, 48)
            self.head = nn.Conv1d(48, num_labels, 1, bias=True)

        def forward(self, x, lens):
            x, lens = self.b0(x, lens)
            x = torch.relu(x)
            h, lens2 = self.b1r0(x, lens)
            h = torch.relu(h)
            h, lens2 = self.b1r1(h, lens2)
            h = h + self.b1res(x, lens)
            x = torch.relu(h)
            out = self.head(x)
            return out, lens2.to(torch.int32)

    model = TJasper(len(labels))

    # Copy the JAX initial parameters (flax [K, Cin/groups, Cout] ->
    # torch [Cout, Cin/groups, K]).
    p = jax_variables['params']

    def cp(dst, src):
        dst.copy_(torch.tensor(np.asarray(src)))

    with torch.no_grad():
        for tunit, blk, rep in ((model.b0, 'block0', 'rep0'),
                                (model.b1r0, 'block1', 'rep0'),
                                (model.b1r1, 'block1', 'rep1')):
            cp(tunit.dw.weight,
               np.asarray(p[blk][f'{rep}_dw']['Conv_0']['kernel'])
               .transpose(2, 1, 0))
            cp(tunit.pw.weight,
               np.asarray(p[blk][f'{rep}_pw']['Conv_0']['kernel'])
               .transpose(2, 1, 0))
            cp(tunit.bn.weight, p[blk][f'{rep}_norm']['scale'])
            cp(tunit.bn.bias, p[blk][f'{rep}_norm']['bias'])
        cp(model.b1res.conv.weight,
           np.asarray(p['block1']['res0_conv']['Conv_0']['kernel'])
           .transpose(2, 1, 0))
        cp(model.b1res.bn.weight, p['block1']['res0_norm']['scale'])
        cp(model.b1res.bn.bias, p['block1']['res0_norm']['bias'])
        cp(model.head.weight,
           np.asarray(p['head']['kernel']).transpose(2, 1, 0))
        cp(model.head.bias, p['head']['bias'])

    class RefNovograd(torch.optim.Optimizer):
        """Reference NovoGrad semantics (novograd.py:52-113): scalar
        second moment from ||g||^2 (first step copies it), normalized
        grad + weight decay, momentum, SGD-style apply."""

        def __init__(self, params, lr, betas=(0.95, 0.0), eps=1e-8,
                     weight_decay=0.0):
            super().__init__(params, dict(lr=lr, betas=betas, eps=eps,
                                          weight_decay=weight_decay))

        @torch.no_grad()
        def step(self):
            for group in self.param_groups:
                b1, b2 = group['betas']
                for prm in group['params']:
                    if prm.grad is None:
                        continue
                    g = prm.grad
                    st = self.state[prm]
                    norm = torch.sum(g ** 2)
                    if not st:
                        st['exp_avg'] = torch.zeros_like(prm)
                        st['exp_avg_sq'] = norm.clone()
                    else:
                        st['exp_avg_sq'].mul_(b2).add_(norm * (1 - b2))
                    d = g / (st['exp_avg_sq'].sqrt() + group['eps'])
                    if group['weight_decay'] != 0:
                        d = d + group['weight_decay'] * prm
                    st['exp_avg'].mul_(b1).add_(d)
                    prm.add_(st['exp_avg'], alpha=-group['lr'])

    opt = RefNovograd(model.parameters(), lr=J_LR, betas=J_BETAS,
                      weight_decay=J_WD)
    crit = nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)

    losses = []
    model.train()
    for batches in epoch_batches:
        ep = []
        for b in batches:
            feats = torch.tensor(b['feats']).transpose(1, 2)
            out, out_lens = model(feats, torch.tensor(
                b['flens'], dtype=torch.float32))
            log_probs = torch.nn.functional.log_softmax(
                out.transpose(1, 2), dim=-1)
            loss = crit(log_probs.transpose(0, 1),
                        torch.tensor(b['targets']), out_lens,
                        torch.tensor(b['tlens']))
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep.append(float(loss))
        losses.append(float(np.mean(ep)))

    model.eval()
    decoder = GreedyDecoder(list(labels))
    w = d = 0
    with torch.no_grad():
        for b in val_batches:
            feats = torch.tensor(b['feats']).transpose(1, 2)
            out, out_lens = model(feats, torch.tensor(
                b['flens'], dtype=torch.float32))
            log_probs = torch.nn.functional.log_softmax(
                out.transpose(1, 2), dim=-1).numpy()
            decoded = decoder.decode(log_probs, out_lens.numpy())
            for j, text in enumerate(b['texts']):
                dist, den = decoder.wer_ratio(text, decoded[j])
                w, d = w + dist, d + den
    return dict(losses=losses, val_wer=w / max(d, 1))


def run(epochs=20, n_train=96, n_val=32, root='/tmp/w2l_parity_corpus',
        model='w2l', seed=0):
    if 'jax' not in sys.modules:
        # Run the JAX side on CPU (like the torch side) unless the caller
        # already initialised a backend; parity needs precision='highest'
        # math, not the TPU tunnel.
        import jax
        jax.config.update('jax_platforms', 'cpu')
    epoch_batches, val_batches, labels = make_batches(root, n_train, n_val,
                                                      epochs)
    if model == 'jasper':
        jax_res, variables = run_jax_jasper(epoch_batches, val_batches,
                                            labels, seed=seed)
        torch_res = run_torch_jasper(epoch_batches, val_batches, labels,
                                     variables)
        workload = (f'jasper parity model (masked separable convs, '
                    f'residual+BN, NovoGrad lr={J_LR} betas={J_BETAS} '
                    f'wd={J_WD}), {n_train} synthetic utts, {epochs} '
                    f'epochs, batch {BATCH}')
    else:
        jax_res, variables = run_jax(epoch_batches, val_batches, labels,
                                     seed=seed)
        torch_res = run_torch(epoch_batches, val_batches, labels, variables)
        workload = (f'w2l-{len(LAYERS)}L parity model, {n_train} synthetic '
                    f'utts, {epochs} epochs, batch {BATCH}, SGD lr={LR} '
                    f'momentum={MOMENTUM} nesterov wd={WEIGHT_DECAY}')
    # Relative deviation is only meaningful while the loss is materially
    # above zero; once both trainings converge (loss ~1e-2) the same-size
    # absolute wiggles read as huge percentages. Headline: max relative
    # deviation over epochs with loss >= LOSS_FLOOR, plus the max absolute
    # deviation over the converged tail.
    LOSS_FLOOR = 0.05
    pairs = list(zip(jax_res['losses'], torch_res['losses']))
    rel_dev = [abs(a - b) / abs(b) for a, b in pairs
               if abs(b) >= LOSS_FLOOR]
    tail_abs = [abs(a - b) for a, b in pairs if abs(b) < LOSS_FLOOR]
    return {
        'workload': workload,
        'jax_loss_per_epoch': [round(x, 4) for x in jax_res['losses']],
        'torch_loss_per_epoch': [round(x, 4) for x in torch_res['losses']],
        'max_rel_loss_deviation': round(max(rel_dev), 4),
        'rel_deviation_loss_floor': LOSS_FLOOR,
        'converged_tail_max_abs_deviation':
            round(max(tail_abs), 4) if tail_abs else None,
        'jax_val_wer': round(jax_res['val_wer'], 4),
        'torch_val_wer': round(torch_res['val_wer'], 4),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--n-train', type=int, default=96)
    parser.add_argument('--n-val', type=int, default=32)
    parser.add_argument('--model', choices=['w2l', 'jasper'], default='w2l')
    parser.add_argument('--out', default=os.path.join(
        REPO, 'benchmarks', 'convergence_parity.json'))
    args = parser.parse_args(argv)
    result = run(args.epochs, args.n_train, args.n_val, model=args.model)
    # one file, one entry per parity model
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    if 'jax_loss_per_epoch' in existing:  # legacy single-model layout
        existing = {'w2l': existing}
    existing[args.model] = result
    with open(args.out, 'w') as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == '__main__':
    main()
