"""Streaming (chunked, stateful) inference for Jasper.

Same architecture as serving/streaming.py (fixed-shape compiled phase
programs, per-conv carries, shared streaming frontend) specialized to the
Jasper block structure (models/jasper.py):

* symmetric ZERO padding (get_same_padding) instead of reflect — so every
  conv primes from a zeros carry and there is no minimum-reflect
  constraint, only the emit-at-least-one-frame-at-prime search;
* separable convs: a depthwise carry-conv followed by a pointwise GEMM,
  with eval BatchNorm folded into the pointwise (or the single conv);
* grouped convs (``groups > 1``) with the post-norm ``GroupShuffle``, and
  ``heads`` depthwise folding — both stream EXACTLY: heads is equivalent
  to a full depthwise conv whose per-channel filter is ``w[c % heads]``
  (models/jasper.py:97-115 folds channel blocks into batch; tiling the
  ``heads`` filters across C channels reproduces it without the reshape);
* in-block residual branches: 1x1(+norm) convs of the block input, aligned
  to the main path's emission lag by per-pane FIFO buffers (dense-residual
  pane chains supported);
* masked convs: the reference zero-fills frames beyond each sample's
  (float) length before every conv (jasper.py:69-132). Interior chunks are
  all-valid so the masks vanish; the finish program reproduces them from
  the per-sample length arithmetic, so streaming output matches offline
  ``Jasper.apply(train=False)`` exactly (the eval head emits softmax
  PROBABILITIES, preserving the reference's prob-space-beam contract,
  jasper.py:470-473).

Normalization variants (``normalization`` in group/instance/layer,
reference jasper.py:198-236): these are NOT foldable or per-frame — torch
``GroupNorm`` on [B, C, T] (and flax ``nn.GroupNorm`` on [B, T, C])
reduces over the TIME axis too, so the offline statistics depend on the
whole utterance *including batch zero-padding frames*. A causal streamer
cannot reproduce a time-global statistic exactly (future frames change
past outputs), and offline itself is padding-length-dependent, so exact
parity is ill-posed. The streaming implementation here keeps the learned
scale/bias and normalizes with CUMULATIVE statistics over the valid
frames seen so far (the same contract as the frontend's
``norm='cumulative'`` mode, streaming.py): outputs converge to the
offline values as the stream progresses, and the finish program excludes
invalid tail frames from the statistics. Batch norm remains exactly
foldable and bit-parity-tested.

Scope: a block with stride > 1 must have ``residual=False`` (the offline
model's residual add would shape-mismatch, as in the reference), and
``heads`` requires ``separable`` (the reference only reaches heads through
the depthwise path of separable blocks, jasper.py:436-453).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..models.jasper import (compute_new_kernel_size, get_same_padding,
                             group_shuffle)
from .infer import _materialize
from .streaming import (_FrontendStreaming, _LayerSpec, _plan,
                        StreamingSession)

NORM_EPS = 1e-5  # flax nn.GroupNorm epsilon (models/jasper.py:157-161)


def _act(name: str):
    import jax.numpy as jnp
    from flax import linen as nn
    if name == 'relu':
        return nn.relu
    if name == 'hardtanh':
        return lambda x: jnp.clip(x, 0.0, 20.0)
    if name == 'selu':
        return nn.selu
    raise ValueError(f'unsupported activation for streaming: {name!r}')


def _bn_fold(params_blk, stats_blk, norm_name):
    g = (np.asarray(params_blk[norm_name]['scale'], np.float32)
         / np.sqrt(np.asarray(stats_blk[norm_name]['var'], np.float32)
                   + 1e-3))
    beta = np.asarray(params_blk[norm_name]['bias'], np.float32)
    mean = np.asarray(stats_blk[norm_name]['mean'], np.float32)
    return g, beta - mean * g


def _num_groups(b: dict, C: int) -> int:
    """Effective group count of the block's norm (models/jasper.py:148-161)."""
    kind = b.get('normalization', 'batch')
    if kind == 'instance':
        return C
    if kind == 'layer':
        return 1
    ng = int(b.get('norm_groups', 1))
    return C if ng == -1 else ng


def fold_jasper(variables, blocks_cfg):
    """Extract + fold Jasper weights into streaming op descriptors.

    Returns (blocks, head). Each block dict holds the main-chain rep units
    (``reps``: each ``{'ops': [...], 'norm': None | {...}}``), residual
    branch descriptors (``res``), and block attributes. Eval BatchNorm is
    folded into the conv weights; group/instance/layer norms keep their
    learned scale/bias as runtime descriptors (see module docstring).
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    blocks = []
    for i, b in enumerate(blocks_cfg):
        blk, bst = params[f'block{i}'], stats.get(f'block{i}', {})
        norm_kind = b.get('normalization', 'batch')
        if norm_kind not in ('batch', 'group', 'instance', 'layer'):
            raise ValueError(f'unknown normalization: {norm_kind!r}')
        batch_norm = norm_kind == 'batch'
        groups = int(b.get('groups', 1))
        heads = int(b.get('heads', -1))
        repeat = int(b.get('repeat', 1))
        kernel = compute_new_kernel_size(int(b['kernel_size']),
                                         float(b.get('kernel_size_factor',
                                                     1.0)))
        stride = int(b.get('stride', 1))
        dilation = int(b.get('dilation', 1))
        separable = bool(b.get('separable', True)) and kernel > 1
        residual = bool(b.get('residual', True))
        if residual and stride > 1:
            # Genuinely impossible: the offline residual add would
            # shape-mismatch (reference jasper.py:409-412 semantics).
            raise ValueError('residual blocks must have stride 1')
        if heads != -1 and not separable:
            raise ValueError('heads streaming requires separable blocks '
                             '(the depthwise path, jasper.py:436-453)')
        mask = bool(b.get('conv_mask', True))
        pad = get_same_padding(kernel, stride, dilation)
        planes = int(b['layer_size'])

        def norm_desc(name, C):
            if batch_norm:
                return None
            return dict(gamma=np.asarray(blk[name]['scale'], np.float32),
                        beta=np.asarray(blk[name]['bias'], np.float32),
                        ng=_num_groups(b, C))

        reps = []
        for r in range(repeat):
            ops = []
            if separable:
                w_dw = np.asarray(blk[f'rep{r}_dw']['Conv_0']['kernel'],
                                  np.float32)
                w_pw = np.asarray(blk[f'rep{r}_pw']['Conv_0']['kernel'],
                                  np.float32)
                C_in = w_pw.shape[1] * groups  # pw kernel [1, C/g, out]
                if heads != -1:
                    # [k, 1, heads] -> full depthwise [k, 1, C]: channel c
                    # uses filter c % heads (see module docstring).
                    w_dw = np.tile(w_dw, (1, 1, C_in // heads))
                ops.append(dict(k=kernel, s=stride, d=dilation, pad=pad,
                                w=w_dw, b=None, depthwise=True, mask=mask,
                                fgc=C_in))
                if batch_norm:
                    g, bias = _bn_fold(blk, bst, f'rep{r}_norm')
                    w_pw, b_pw = w_pw * g[None, None, :], bias
                else:
                    b_pw = None
                ops.append(dict(k=1, s=1, d=1, pad=0, w=w_pw, b=b_pw,
                                depthwise=False, mask=mask, fgc=groups))
            else:
                w = np.asarray(blk[f'rep{r}_conv']['Conv_0']['kernel'],
                               np.float32)
                if batch_norm:
                    g, bias = _bn_fold(blk, bst, f'rep{r}_norm')
                    w, b_c = w * g[None, None, :], bias
                else:
                    b_c = None
                ops.append(dict(k=kernel, s=stride, d=dilation, pad=pad,
                                w=w, b=b_c, depthwise=False, mask=mask,
                                fgc=groups))
            reps.append(dict(ops=ops, norm=norm_desc(f'rep{r}_norm',
                                                     planes)))
        res = None
        if residual:
            # Residual 1x1 branches are PLAIN convs (groups=1, heads=-1,
            # no GroupShuffle): the reference builds them with
            # _get_conv_bn_layer defaults (jasper.py:241-257).
            res = []
            j = 0
            while f'res{j}_conv' in blk:
                w = np.asarray(blk[f'res{j}_conv']['Conv_0']['kernel'],
                               np.float32)
                if batch_norm:
                    g, bias = _bn_fold(blk, bst, f'res{j}_norm')
                    entry = dict(w=w * g[None, None, :], b=bias, norm=None,
                                 fgc=1)
                else:
                    entry = dict(w=w, b=None,
                                 norm=norm_desc(f'res{j}_norm', planes),
                                 fgc=1)
                res.append(entry)
                j += 1
        blocks.append(dict(reps=reps, res=res,
                           residual_mode=b.get('residual_mode', 'add'),
                           activation=b.get('activation', 'relu'),
                           dense=bool(b.get('residual_dense', False)),
                           mask=mask, groups=groups))
    head = (np.asarray(params['head']['kernel'], np.float32),
            np.asarray(params['head']['bias'], np.float32))
    return blocks, head


class JasperStreamState(NamedTuple):
    preemph_last: object
    fe_carry: object
    conv_carries: tuple      # per main-chain op, [B, c, C]
    fifos: tuple             # per residual branch, [B, c, C]
    norm_count: object
    norm_sum: object
    norm_sumsq: object
    gnorms: tuple = ()       # per runtime norm, (count [B,1], sum, sumsq)


def _grouped_1x1(x, w, fgc: int):
    """Grouped pointwise conv as an einsum. x [B,t,C]; w [1, C/fgc, out]
    (flax grouped-conv kernel layout: output channel o reads input group
    o // (out / fgc))."""
    import jax.numpy as jnp
    if fgc == 1:
        return jnp.einsum('btc,cl->btl', x, w[0])
    B, t, C = x.shape
    out = w.shape[2]
    xg = x.reshape(B, t, fgc, C // fgc)
    wg = w[0].reshape(C // fgc, fgc, out // fgc)
    return jnp.einsum('btgc,cgj->btgj', xg, wg).reshape(B, t, out)


class StreamingJasper(_FrontendStreaming):
    """Chunked stateful Jasper inference; API-compatible with
    ``StreamingWav2Letter`` (``start()`` returns a ``StreamingSession``).
    Emits eval-mode softmax probabilities, like offline Jasper."""

    emits_probs = True  # (Wav2Letter sessions emit log-probs)

    def __init__(self, jasper_blocks, num_labels: int, variables, frontend,
                 chunk_frames: int = 64, norm: str = 'cumulative',
                 norm_stats=None, weights: str = 'f32', folded=None,
                 int8_depthwise: bool = False):
        """``folded``: a pre-folded ``(blocks, head)`` pair (from
        ``fold_jasper`` or an exported artifact via ``load_serving``);
        when given, ``variables`` may be None. ``weights='int8'`` still
        applies — quantization happens below on whichever fold is used.

        ``int8_depthwise``: in ``int8_full`` mode, also run the DEPTHWISE
        convs with int8 activations. Off by default: depthwise convs are
        VPU work (one tap-dot per channel — no MXU contraction to
        accelerate), so quantizing them only adds quantize/dequantize
        traffic; measured at batch 16 this made int8_full ~70% SLOWER
        than f32 (benchmarks/jasper_serving.json round 2). With the
        default, depthwise stays on dequantized-f32 weights (plain
        ``int8`` semantics) and only the pointwise/full convs hit the
        int8 MXU path."""
        import jax

        self.num_labels = num_labels
        self._init_frontend(frontend, norm, norm_stats, chunk_frames)
        self._blocks_cfg = [dict(b) for b in jasper_blocks]
        if folded is not None:
            self._blocks, self._head = folded
        else:
            self._blocks, self._head = fold_jasper(variables,
                                                   self._blocks_cfg)
        if weights not in ('f32', 'int8', 'int8_full'):
            raise ValueError(f'unknown weights mode: {weights!r}')
        self._int8 = weights in ('int8', 'int8_full')
        self._act_int8 = weights == 'int8_full'
        self._int8_dw = bool(int8_depthwise)

        # Main-chain specs (the stream plan ignores 1x1 residual branches —
        # they never change frame counts; norms/shuffles are frame-local).
        specs = [self._fe_spec]
        for blk in self._blocks:
            for rep in blk['reps']:
                for op in rep['ops']:
                    specs.append(_LayerSpec(op['k'], op['s'], op['d'],
                                            op['pad'], 'zeros'))
        specs.append(_LayerSpec(1, 1, 1, 0, 'zeros'))  # head
        self._specs = specs
        self.scale = int(np.prod([sp.stride for sp in specs[1:]]))
        if chunk_frames % self.scale:
            raise ValueError(f'chunk_frames must be divisible by the total '
                             f'stride {self.scale}')

        plan = None
        fp = chunk_frames
        while plan is None:
            fp += 1
            if fp > 1 << 16:
                raise ValueError('no feasible prime window')
            plan = _plan(specs, fp * self.hop, self.chunk_samples)
        self.prime_frames = fp
        self.prime_samples = fp * self.hop
        self._carries, self._prime_outs, self._chunk_outs = plan
        self.prime_out = self._prime_outs[-1]
        self.chunk_out = self._chunk_outs[-1]
        la = 0
        for sp in reversed(specs[1:]):
            la = la * sp.stride + (sp.ctx - sp.left)
        self.lookahead_frames = la
        self._set_fin_zeros(self._carries[0])

        # Attach per-op stream bookkeeping: prime input count and the
        # float length-arithmetic coefficients len = a*flen + b of each
        # op's INPUT stream (the reference's MaskedConv length chain,
        # jasper.py:84-94; dyadic-exact in f32). Runtime norms additionally
        # record their input stream's (a, b, prime) so the finish program
        # can exclude invalid tail frames from the cumulative statistics.
        a, b = 1.0, 0.0
        idx = 1  # specs index (0 is the frontend)
        prime_in = self._prime_outs[0]
        norm_i = 0
        for blk in self._blocks:
            for rep in blk['reps']:
                for op in rep['ops']:
                    op['len_a'], op['len_b'] = a, b
                    op['prime_in'] = prime_in
                    if op['mask']:
                        c0 = 2 * op['pad'] - op['d'] * (op['k'] - 1) - 1
                        a, b = a / op['s'], (b + c0) / op['s'] + 1.0
                    prime_in = self._prime_outs[idx]
                    idx += 1
                if rep['norm'] is not None:
                    rep['norm']['len'] = (a, b, prime_in)
                    rep['norm']['idx'] = norm_i
                    norm_i += 1
            if blk['res'] is not None:
                for entry in blk['res']:
                    if entry['norm'] is not None:
                        # 1x1 masked convs preserve lengths; the FIFO
                        # aligns emission with the main path, so the valid
                        # count at the add site applies.
                        entry['norm']['len'] = (a, b, prime_in)
                        entry['norm']['idx'] = norm_i
                        norm_i += 1
        self._len_coeffs_head = (a, b)
        self._prime_out_head = self._prime_outs[-1]
        self._norm_descs = [rep['norm'] for blk in self._blocks
                            for rep in blk['reps']
                            if rep['norm'] is not None]
        self._norm_descs += [e['norm'] for blk in self._blocks
                             if blk['res'] for e in blk['res']
                             if e['norm'] is not None]
        self._norm_descs.sort(key=lambda d: d['idx'])

        # Finish flush: zero feature frames appended so every valid head
        # frame drains. rem_max at the largest possible tail.
        x_max = fp + chunk_frames + 1
        rem_max = int(a * x_max + b) - self.prime_out
        z = 0
        while True:
            q, ok = self._fin_frames + z, True
            for sp, carry in zip(specs[1:], self._carries[1:]):
                q = (carry + q - sp.ctx - 1) // sp.stride + 1
                if q < 1:
                    ok = False
                    break
            if ok and q >= rem_max:
                self._fin_flush = z
                self._fin_out = q
                break
            z += self.scale

        # Weights as jit arguments (not closure constants) — see
        # streaming.py: large baked constants blow up compile payloads.
        ops_w = [(op['w'], op['b']) for blk in self._blocks
                 for rep in blk['reps'] for op in rep['ops']]
        res_w = [(e['w'], e['b']) for blk in self._blocks if blk['res']
                 for e in blk['res']]
        norms_w = [(d['gamma'], d['beta']) for d in self._norm_descs]
        head_w = self._head
        if self._int8:
            from .quantize import quantize_folded
            ops_w = quantize_folded(ops_w)
            res_w = quantize_folded(res_w)
            head_w = quantize_folded([head_w])[0]
        self._weights_dev = jax.device_put(
            {'ops': ops_w, 'res': res_w, 'head': head_w, 'norms': norms_w})
        self._prime_fn = jax.jit(self._prime)
        self._step_fn = jax.jit(self._step)
        self._finish_fn = jax.jit(self._finish)

    # ------------------------------------------------------------------

    def _cum_norm(self, gb, desc, h, carry, x_frames):
        """Cumulative group/instance/layer norm over valid frames seen so
        far (module docstring). Returns (normalized h, new carry)."""
        import jax.numpy as jnp
        gamma, beta = gb
        ng = desc['ng']
        B, t, C = h.shape
        cpg = C // ng
        if x_frames is None:
            valid = jnp.full((B,), float(t), jnp.float32)
        else:
            a, b0, prime_in = desc['len']
            valid = jnp.clip(jnp.floor(a * x_frames + b0) - prime_in,
                             0.0, float(t))
        m = (jnp.arange(t)[None, :] < valid[:, None]).astype(h.dtype)
        hg = (h * m[:, :, None]).reshape(B, t, ng, cpg)
        cnt, s, ss = carry
        cnt = cnt + valid[:, None] * cpg
        s = s + hg.sum(axis=(1, 3))
        ss = ss + jnp.square(hg).sum(axis=(1, 3))
        c = jnp.maximum(cnt, 1.0)
        mean = s / c                                       # [B, ng]
        var = jnp.maximum(ss / c - jnp.square(mean), 0.0)  # biased, as flax
        scale = (gamma.reshape(1, 1, ng, cpg)
                 / jnp.sqrt(var + NORM_EPS)[:, None, :, None])
        y = (h.reshape(B, t, ng, cpg) - mean[:, None, :, None]) * scale \
            + beta.reshape(1, 1, ng, cpg)
        return y.reshape(B, t, C), (cnt, s, ss)

    def _convs(self, weights, feats, carries, fifos, gnorms,
               x_frames=None):
        """Run the block stack over new frames. ``x_frames`` ([B] float32,
        finish only): X = prime_frames + tail//hop + 1 (= flen minus the
        steady chunks, n-independent), driving the per-conv masked-length
        arithmetic."""
        import jax
        import jax.numpy as jnp
        x = feats
        new_carries, new_fifos = [], []
        new_gnorms = list(gnorms)
        ci = fi = 0
        panes = [x]
        for blk in self._blocks:
            act = _act(blk['activation'])
            block_panes = panes
            h = x
            for r, rep in enumerate(blk['reps']):
                for op in rep['ops']:
                    if op['mask'] and x_frames is not None and (
                            op['k'] > 1 or self._act_int8):
                        # Zero input frames beyond this sample's length
                        # (reference zero-fill, jasper.py:90-94). Carry
                        # frames are always valid; only new frames mask.
                        # k==1 convs don't mix frames, so f32 skips them —
                        # but int8_full's dynamic_act_scale is a global
                        # max-reduction over buf, and conv(garbage) values
                        # in invalid frames would stretch the quantization
                        # grid for the valid ones; mask before every op.
                        cnt = jnp.floor(op['len_a'] * x_frames
                                        + op['len_b']) - op['prime_in']
                        m = (jnp.arange(h.shape[1])[None, :]
                             < cnt[:, None]).astype(h.dtype)
                        h = h * m[:, :, None]
                    if op['k'] > 1 or op['s'] > 1:
                        buf = jnp.concatenate([carries[ci], h], axis=1)
                        ctx = op['d'] * (op['k'] - 1)
                        q = (buf.shape[1] - ctx - 1) // op['s'] + 1
                        new_carries.append(buf[:, q * op['s']:])
                    else:
                        buf = h
                        new_carries.append(carries[ci])  # zero-size
                    groups = op['fgc']
                    if self._act_int8 and (self._int8_dw
                                           or not op['depthwise']):
                        # int8 x int8 -> int32 on the MXU (grouped convs
                        # included — verified bit-exact on-chip).
                        from .infer import dynamic_act_scale, quantize_act
                        wq, w_scale, b_op = weights['ops'][ci]
                        a_scale = dynamic_act_scale(buf)
                        out = jax.lax.conv_general_dilated(
                            quantize_act(buf, a_scale), wq,
                            window_strides=(op['s'],), padding='VALID',
                            rhs_dilation=(op['d'],),
                            dimension_numbers=('NWC', 'WIO', 'NWC'),
                            feature_group_count=groups,
                            preferred_element_type=jnp.int32)
                        out = out.astype(jnp.float32) \
                            * (a_scale * w_scale[None, None, :])
                    else:
                        w_op, b_op = _materialize(weights['ops'][ci])
                        out = jax.lax.conv_general_dilated(
                            buf, w_op,
                            window_strides=(op['s'],), padding='VALID',
                            rhs_dilation=(op['d'],),
                            dimension_numbers=('NWC', 'WIO', 'NWC'),
                            feature_group_count=groups)
                    ci += 1
                    h = out + b_op if b_op is not None else out
                if rep['norm'] is not None:
                    ni = rep['norm']['idx']
                    h, new_gnorms[ni] = self._cum_norm(
                        weights['norms'][ni], rep['norm'], h,
                        gnorms[ni], x_frames)
                if blk['groups'] > 1:
                    h = group_shuffle(h, blk['groups'])
                if r < len(blk['reps']) - 1:
                    h = act(h)
            if blk['res'] is not None:
                take = h.shape[1]
                # Branch inputs mirror the offline selection: all panes for
                # dense-residual blocks, else just the block input
                # (models/jasper.py:215-216).
                branches = block_panes if blk['dense'] \
                    else [block_panes[-1]]
                for pane, entry in zip(branches, blk['res']):
                    w, bias = _materialize(weights['res'][fi])
                    fifo = jnp.concatenate([fifos[fi], pane], axis=1)
                    rin, new_fifo = fifo[:, :take], fifo[:, take:]
                    new_fifos.append(new_fifo)
                    fi += 1
                    r_out = _grouped_1x1(rin, w, entry['fgc'])
                    if bias is not None:
                        r_out = r_out + bias
                    if entry['norm'] is not None:
                        ni = entry['norm']['idx']
                        r_out, new_gnorms[ni] = self._cum_norm(
                            weights['norms'][ni], entry['norm'], r_out,
                            gnorms[ni], x_frames)
                    h = h + r_out if blk['residual_mode'] == 'add' \
                        else jnp.maximum(h, r_out)
            h = act(h)
            x = h
            panes = panes + [x] if blk['dense'] else [x]
        wh, bh = _materialize(weights['head'])
        logits = jnp.einsum('btc,cl->btl', x, wh[0]) + bh
        return (jax.nn.softmax(logits, axis=-1), tuple(new_carries),
                tuple(new_fifos), tuple(new_gnorms))

    def _zero_state(self, B: int):
        """Prime-phase carries: each conv's left zero pad; empty FIFOs;
        zeroed cumulative-norm statistics."""
        import jax.numpy as jnp
        carries, fifos = [], []
        ch = self.feat_dim
        pane_ch = [ch]
        for blk in self._blocks:
            for rep in blk['reps']:
                for op in rep['ops']:
                    left = op['pad'] if (op['k'] > 1 or op['s'] > 1) else 0
                    carries.append(jnp.zeros((B, left, ch), jnp.float32))
                    ch = op['w'].shape[-1]  # dw keeps C; conv/pw -> Cout
            if blk['res'] is not None:
                for c in (pane_ch if blk['dense'] else [pane_ch[-1]]):
                    fifos.append(jnp.zeros((B, 0, c), jnp.float32))
            pane_ch = pane_ch + [ch] if blk['dense'] else [ch]
        gnorms = tuple(
            (jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((B, d['ng']), jnp.float32),
             jnp.zeros((B, d['ng']), jnp.float32))
            for d in self._norm_descs)
        return tuple(carries), tuple(fifos), gnorms

    def _prime(self, weights, audio):
        last, fe_carry, norm_state, feats = self._fe_prime(audio)
        carries, fifos, gnorms = self._zero_state(audio.shape[0])
        probs, carries, fifos, gnorms = self._convs(weights, feats,
                                                    carries, fifos, gnorms)
        return JasperStreamState(last, fe_carry, carries, fifos,
                                 *norm_state, gnorms), probs

    def _step(self, weights, state, audio):
        last, fe_carry, norm_state, feats = self._fe_step(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq), audio)
        probs, carries, fifos, gnorms = self._convs(
            weights, feats, state.conv_carries, state.fifos, state.gnorms)
        return JasperStreamState(last, fe_carry, carries, fifos,
                                 *norm_state, gnorms), probs

    def _finish(self, weights, state, tail, tail_lengths):
        import jax.numpy as jnp
        feats, _ = self._fe_finish(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq),
            tail, tail_lengths, extra_zero_frames=self._fin_flush)
        xf = (self.prime_frames + tail_lengths // self.hop + 1) \
            .astype(jnp.float32)
        probs, _, _, _ = self._convs(weights, feats, state.conv_carries,
                                     state.fifos, state.gnorms, x_frames=xf)
        a, b = self._len_coeffs_head
        fin_valid = (jnp.floor(a * xf + b).astype(jnp.int32)
                     - self.prime_out)
        return probs, fin_valid

    def start(self, batch_size: int = 1) -> StreamingSession:
        return StreamingSession(self, batch_size)
