"""Streaming (chunked, stateful) inference for Jasper.

Same architecture as serving/streaming.py (fixed-shape compiled phase
programs, per-conv carries, shared streaming frontend) specialized to the
Jasper block structure (models/jasper.py):

* symmetric ZERO padding (get_same_padding) instead of reflect — so every
  conv primes from a zeros carry and there is no minimum-reflect
  constraint, only the emit-at-least-one-frame-at-prime search;
* separable convs: a depthwise carry-conv followed by a pointwise GEMM,
  with eval BatchNorm folded into the pointwise (or the single conv);
* in-block residual branches: 1x1(+BN) convs of the block input, aligned
  to the main path's emission lag by per-pane FIFO buffers (dense-residual
  pane chains supported);
* masked convs: the reference zero-fills frames beyond each sample's
  (float) length before every conv (jasper.py:69-132). Interior chunks are
  all-valid so the masks vanish; the finish program reproduces them from
  the per-sample length arithmetic, so streaming output matches offline
  ``Jasper.apply(train=False)`` exactly (the eval head emits softmax
  PROBABILITIES, preserving the reference's prob-space-beam contract,
  jasper.py:470-473).

Scope (matching configs/model/jasper.yaml): normalization='batch',
groups=1, heads=-1; a block with stride > 1 must have residual=False (the
reference's residual add would shape-mismatch otherwise).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..models.jasper import compute_new_kernel_size, get_same_padding
from .infer import _materialize
from .streaming import (_FrontendStreaming, _LayerSpec, _plan,
                        StreamingSession)

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


def fold_jasper(variables, blocks_cfg):
    """Extract + BN-fold Jasper weights into streaming op descriptors.

    Returns (blocks, head) where each block is a dict of main-chain conv
    ops (geometry + folded weights) and residual 1x1 branches.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    blocks = []
    for i, b in enumerate(blocks_cfg):
        blk, bst = params[f'block{i}'], stats.get(f'block{i}', {})
        if b.get('normalization', 'batch') != 'batch':
            raise ValueError('streaming Jasper supports batch norm only')
        if int(b.get('groups', 1)) != 1 or int(b.get('heads', -1)) != -1:
            raise ValueError('streaming Jasper supports groups=1, heads=-1')
        repeat = int(b.get('repeat', 1))
        kernel = compute_new_kernel_size(int(b['kernel_size']),
                                         float(b.get('kernel_size_factor',
                                                     1.0)))
        stride = int(b.get('stride', 1))
        dilation = int(b.get('dilation', 1))
        separable = bool(b.get('separable', True)) and kernel > 1
        residual = bool(b.get('residual', True))
        if residual and stride > 1:
            raise ValueError('residual blocks must have stride 1')
        mask = bool(b.get('conv_mask', True))
        pad = get_same_padding(kernel, stride, dilation)
        reps = []
        for r in range(repeat):
            g, bias = _bn_fold(blk, bst, f'rep{r}_norm')
            ops = []
            if separable:
                w_dw = np.asarray(blk[f'rep{r}_dw']['Conv_0']['kernel'],
                                  np.float32)
                w_pw = np.asarray(blk[f'rep{r}_pw']['Conv_0']['kernel'],
                                  np.float32)
                ops.append(dict(k=kernel, s=stride, d=dilation, pad=pad,
                                w=w_dw, b=None, depthwise=True, mask=mask))
                ops.append(dict(k=1, s=1, d=1, pad=0,
                                w=w_pw * g[None, None, :], b=bias,
                                depthwise=False, mask=mask))
            else:
                w = np.asarray(blk[f'rep{r}_conv']['Conv_0']['kernel'],
                               np.float32)
                ops.append(dict(k=kernel, s=stride, d=dilation, pad=pad,
                                w=w * g[None, None, :], b=bias,
                                depthwise=False, mask=mask))
            reps.append(ops)
        res = None
        if residual:
            res = []
            j = 0
            while f'res{j}_conv' in blk:
                g, bias = _bn_fold(blk, bst, f'res{j}_norm')
                w = np.asarray(blk[f'res{j}_conv']['Conv_0']['kernel'],
                               np.float32)
                res.append((w * g[None, None, :], bias))
                j += 1
        blocks.append(dict(reps=reps, res=res,
                           residual_mode=b.get('residual_mode', 'add'),
                           activation=b.get('activation', 'relu'),
                           dense=bool(b.get('residual_dense', False)),
                           mask=mask))
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


class StreamingJasper(_FrontendStreaming):
    """Chunked stateful Jasper inference; API-compatible with
    ``StreamingWav2Letter`` (``start()`` returns a ``StreamingSession``).
    Emits eval-mode softmax probabilities, like offline Jasper."""

    emits_probs = True  # (Wav2Letter sessions emit log-probs)

    def __init__(self, jasper_blocks, num_labels: int, variables, frontend,
                 chunk_frames: int = 64, norm: str = 'cumulative',
                 norm_stats=None, weights: str = 'f32', folded=None):
        """``folded``: a pre-folded ``(blocks, head)`` pair (from
        ``fold_jasper`` or an exported artifact via ``load_serving``);
        when given, ``variables`` may be None. ``weights='int8'`` still
        applies — quantization happens below on whichever fold is used."""
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

        # Main-chain specs (the stream plan ignores 1x1 residual branches —
        # they never change frame counts).
        specs = [self._fe_spec]
        for blk in self._blocks:
            for ops in blk['reps']:
                for op in ops:
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
        # jasper.py:84-94; dyadic-exact in f32).
        a, b = 1.0, 0.0
        idx = 1  # specs index (0 is the frontend)
        prime_in = self._prime_outs[0]
        for blk in self._blocks:
            for ops in blk['reps']:
                for op in ops:
                    op['len_a'], op['len_b'] = a, b
                    op['prime_in'] = prime_in
                    if op['mask']:
                        c0 = 2 * op['pad'] - op['d'] * (op['k'] - 1) - 1
                        a, b = a / op['s'], (b + c0) / op['s'] + 1.0
                    prime_in = self._prime_outs[idx]
                    idx += 1
        self._len_coeffs_head = (a, b)
        self._prime_out_head = self._prime_outs[-1]

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
                 for ops in blk['reps'] for op in ops]
        res_w = [wb for blk in self._blocks if blk['res']
                 for wb in blk['res']]
        head_w = self._head
        if self._int8:
            from .quantize import quantize_folded
            ops_w = quantize_folded(ops_w)
            res_w = quantize_folded(res_w)
            head_w = quantize_folded([head_w])[0]
        self._weights_dev = jax.device_put(
            {'ops': ops_w, 'res': res_w, 'head': head_w})
        self._prime_fn = jax.jit(self._prime)
        self._step_fn = jax.jit(self._step)
        self._finish_fn = jax.jit(self._finish)

    # ------------------------------------------------------------------

    def _convs(self, weights, feats, carries, fifos, x_frames=None):
        """Run the block stack over new frames. ``x_frames`` ([B] float32,
        finish only): X = prime_frames + tail//hop + 1 (= flen minus the
        steady chunks, n-independent), driving the per-conv masked-length
        arithmetic."""
        import jax
        import jax.numpy as jnp
        x = feats
        new_carries, new_fifos = [], []
        ci = fi = 0
        panes = [x]
        for blk in self._blocks:
            act = _act(blk['activation'])
            block_panes = panes
            h = x
            for r, ops in enumerate(blk['reps']):
                for op in ops:
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
                    groups = buf.shape[2] if op['depthwise'] else 1
                    if self._act_int8:
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
                if r < len(blk['reps']) - 1:
                    h = act(h)
            if blk['res'] is not None:
                take = h.shape[1]
                # Branch inputs mirror the offline selection: all panes for
                # dense-residual blocks, else just the block input
                # (models/jasper.py:215-216).
                branches = block_panes if blk['dense'] \
                    else [block_panes[-1]]
                for pane in branches:
                    w, bias = _materialize(weights['res'][fi])
                    fifo = jnp.concatenate([fifos[fi], pane], axis=1)
                    rin, new_fifo = fifo[:, :take], fifo[:, take:]
                    new_fifos.append(new_fifo)
                    fi += 1
                    r_out = jnp.einsum('btc,cl->btl', rin, w[0]) + bias
                    h = h + r_out if blk['residual_mode'] == 'add' \
                        else jnp.maximum(h, r_out)
            h = act(h)
            x = h
            panes = panes + [x] if blk['dense'] else [x]
        wh, bh = _materialize(weights['head'])
        logits = jnp.einsum('btc,cl->btl', x, wh[0]) + bh
        return (jax.nn.softmax(logits, axis=-1), tuple(new_carries),
                tuple(new_fifos))

    def _zero_state(self, B: int):
        """Prime-phase carries: each conv's left zero pad; empty FIFOs."""
        import jax.numpy as jnp
        carries, fifos = [], []
        ch = self.feat_dim
        pane_ch = [ch]
        for blk in self._blocks:
            for ops in blk['reps']:
                for op in ops:
                    left = op['pad'] if (op['k'] > 1 or op['s'] > 1) else 0
                    carries.append(jnp.zeros((B, left, ch), jnp.float32))
                    ch = op['w'].shape[-1]  # dw keeps C; conv/pw -> Cout
            if blk['res'] is not None:
                for c in (pane_ch if blk['dense'] else [pane_ch[-1]]):
                    fifos.append(jnp.zeros((B, 0, c), jnp.float32))
            pane_ch = pane_ch + [ch] if blk['dense'] else [ch]
        return tuple(carries), tuple(fifos)

    def _prime(self, weights, audio):
        last, fe_carry, norm_state, feats = self._fe_prime(audio)
        carries, fifos = self._zero_state(audio.shape[0])
        probs, carries, fifos = self._convs(weights, feats, carries, fifos)
        return JasperStreamState(last, fe_carry, carries, fifos,
                                 *norm_state), probs

    def _step(self, weights, state, audio):
        last, fe_carry, norm_state, feats = self._fe_step(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq), audio)
        probs, carries, fifos = self._convs(weights, feats,
                                            state.conv_carries, state.fifos)
        return JasperStreamState(last, fe_carry, carries, fifos,
                                 *norm_state), probs

    def _finish(self, weights, state, tail, tail_lengths):
        import jax.numpy as jnp
        feats, _ = self._fe_finish(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq),
            tail, tail_lengths, extra_zero_frames=self._fin_flush)
        xf = (self.prime_frames + tail_lengths // self.hop + 1) \
            .astype(jnp.float32)
        probs, _, _ = self._convs(weights, feats, state.conv_carries,
                                  state.fifos, x_frames=xf)
        a, b = self._len_coeffs_head
        fin_valid = (jnp.floor(a * xf + b).astype(jnp.int32)
                     - self.prime_out)
        return probs, fin_valid

    def start(self, batch_size: int = 1) -> StreamingSession:
        return StreamingSession(self, batch_size)
