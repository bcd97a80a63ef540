"""Streaming (chunked, stateful) inference for Wav2Letter — the serving path.

The reference has no serving/streaming surface at all (its only entry point
is offline training, /root/reference/train.py; eval is the README-promised
test.py). This module adds low-latency incremental inference as a TPU-first
design: fixed-size audio chunks flow through ONE compiled XLA program per
phase (prime / step / finish), every cross-chunk dependency is carried in
static-shape state tensors, and nothing is recompiled after session start.

Semantics — exact offline equivalence
-------------------------------------
A ``StreamingWav2Letter`` reproduces the offline pipeline
(``SpectrogramFrontend`` -> ``Wav2Letter.apply(train=False)``) exactly
(up to float reassociation) under the contract:

* normalization uses fixed stats (``norm='precomputed'``; corpus-level CMVN
  — the standard serving choice). ``norm='cumulative'`` instead normalizes
  with running statistics over the frames seen so far, which converges to
  but does not equal the offline per-utterance stats;
* the emitted log-probs ``[:, :out_len]`` equal the offline model applied
  to the same audio zero-padded to any even frame length >= flen + the
  network lookahead — i.e. offline inference with a bucket edge far enough
  beyond the utterance (the regime every bucketed eval batch is in).

Mechanics
---------
Each conv layer (and the STFT framing itself, which is just a stride-``hop``
width-``n_fft`` conv — features.py) maintains a carry of the last
``(kernel-1)*dilation`` inputs at its own frame rate. Carry lengths, the
prime window, and the finish flush are all solved statically at session
build (``_plan``), so ``prime``/``step``/``finish`` are three fixed-shape
jitted programs. The stream start replicates the offline left reflect-pad
from the first chunk; the finish replicates the frontend's right
reflect-pad at each sample's true boundary (features.py:236-251) and
flushes the conv lookahead over zero features.

The SAME-padded, wide-kernel architecture has an inherent algorithmic
lookahead (sum of per-layer right contexts; ~4.2 s for the full 20-layer
stack), so the first emission happens after ``prime_frames`` of audio and
thereafter every ``chunk_frames``; that latency is a property of the model,
not the runtime. BatchNorm (running stats) is folded into the conv weights
at build — serving does one fused conv+bias+clamp per layer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from ..data.features import LOG_ZERO_GUARD, NORM_EPS, PREEMPH


@dataclass(frozen=True)
class _LayerSpec:
    """Static streaming geometry of one conv layer (or the STFT framing)."""
    kernel: int
    stride: int
    dilation: int
    left: int               # offline left SAME-pad (even-total convention)
    pad_mode: str = 'reflect'   # 'reflect' (w2l) | 'zeros' (jasper)

    @property
    def ctx(self) -> int:
        return (self.kernel - 1) * self.dilation


def _plan(specs, prime_in: int, chunk_in: int):
    """Solve static carry lengths and per-phase output counts.

    Returns (carries, prime_outs, chunk_outs) — all python ints — or None
    if ``prime_in`` is too small (some layer cannot form its left reflect
    pad or emits nothing at prime). Zero-padded layers prime their left pad
    from a zeros carry, so only the emit-at-least-one constraint applies.
    """
    carries, prime_outs, chunk_outs = [], [], []
    p, f = prime_in, chunk_in
    for sp in specs:
        if (sp.pad_mode == 'reflect' and p < sp.left + 1) or f % sp.stride:
            return None
        q0 = (sp.left + p - sp.ctx - 1) // sp.stride + 1
        if q0 < 1:
            return None
        carry = sp.left + p - q0 * sp.stride
        # Steady-state invariant: with carry in [ctx+1-stride, ctx] and a
        # stride-divisible chunk, every step emits exactly f/stride frames
        # and the carry length is constant.
        assert (carry + f - sp.ctx - 1) // sp.stride + 1 == f // sp.stride
        carries.append(carry)
        prime_outs.append(q0)
        p, f = q0, f // sp.stride
        chunk_outs.append(f)
    return carries, prime_outs, chunk_outs


def fold_batchnorm(variables, num_blocks: int):
    """Fold eval-mode BatchNorm into each block's conv kernel/bias.

    Eval BN is the affine map (x - mean)/sqrt(var+eps)*scale + bias
    (models/wav2letter.py:59-63, eps 1e-3), so it composes into the
    preceding conv: w' = w*g, b' = (b-mean)*g + beta with
    g = scale/sqrt(var+eps). Returns [(w [k,Cin,Cout], b [Cout])] for the
    blocks plus the (unfolded) 1x1 head.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    folded = []
    for i in range(num_blocks):
        blk = params[f'conv1d_{i}']
        w = np.asarray(blk['Conv_0']['kernel'], np.float32)
        b = np.asarray(blk['Conv_0']['bias'], np.float32)
        if 'BatchNorm_0' in blk:
            st = stats[f'conv1d_{i}']['BatchNorm_0']
            g = (np.asarray(blk['BatchNorm_0']['scale'], np.float32)
                 / np.sqrt(np.asarray(st['var'], np.float32) + 1e-3))
            b = (b - np.asarray(st['mean'], np.float32)) * g \
                + np.asarray(blk['BatchNorm_0']['bias'], np.float32)
            w = w * g[None, None, :]
        folded.append((w, b))
    head = params[f'conv1d_{num_blocks}']
    folded.append((np.asarray(head['Conv_0']['kernel'], np.float32),
                   np.asarray(head['Conv_0']['bias'], np.float32)))
    return folded


class StreamState(NamedTuple):
    """Device-side carries between chunks (a pytree of static shapes)."""
    preemph_last: object            # [B, 1] last raw sample
    fe_carry: object                # [B, fe_carry_len] preemphasized samples
    conv_carries: tuple             # per layer [B, carry_i, C_i]
    norm_count: object              # [B] valid frames seen
    norm_sum: object                # [B, M]
    norm_sumsq: object              # [B, M]


class _FrontendStreaming:
    """Shared streaming frontend phases (preemphasis -> framing -> DFT ->
    mel -> log -> normalization) used by both model families. Subclasses
    call ``_init_frontend`` during construction and the ``_fe_*`` phase
    helpers inside their jitted programs."""

    def _init_frontend(self, frontend, norm, norm_stats, chunk_frames):
        self.hop = frontend.hop
        self.n_fft = frontend.n_fft
        self.n_mels = frontend.n_mels
        self.sample_rate = getattr(frontend, 'sample_rate', 16000)
        # MFCC frontends apply an orthonormal DCT after the log-mel stage
        # (features.py:313-315); replicate so MFCC-trained models stream
        # the feature space they trained on.
        self._dct = None
        if getattr(frontend, 'feature_type', 'logmel') == 'mfcc':
            self._dct = np.asarray(frontend.dct)
        self.feat_dim = self.n_mels if self._dct is None \
            else self._dct.shape[1]
        self.norm = norm
        if norm == 'precomputed':
            if norm_stats is None:
                raise ValueError("norm='precomputed' requires norm_stats")
            self._norm_mean = np.asarray(norm_stats[0], np.float32)
            self._norm_std = np.asarray(norm_stats[1], np.float32)
        elif norm != 'cumulative':
            raise ValueError(f'unknown norm mode: {norm!r}')
        # DFT basis + mel from the offline frontend (identical numerics).
        # Frontends built with stft_method='fft' carry no basis — rebuild
        # it from the same window exactly as features.py:192-205 does.
        if hasattr(frontend, 'dft_kernel'):
            self._dft_kernel = np.asarray(frontend.dft_kernel)
        elif hasattr(frontend, 'dft_re'):
            self._dft_kernel = np.concatenate(
                [frontend.dft_re, frontend.dft_im], axis=1)[:, None, :]
        else:
            k = np.arange(self.n_fft)[:, None]
            f = np.arange(1 + self.n_fft // 2)[None, :]
            ang = 2.0 * np.pi * k * f / self.n_fft
            win = np.asarray(frontend.window)[:, None]
            self._dft_kernel = np.concatenate(
                [(np.cos(ang) * win).astype(np.float32),
                 (-np.sin(ang) * win).astype(np.float32)],
                axis=1)[:, None, :]
        self._fb_t = np.asarray(frontend.fb_t)
        self.chunk_frames = chunk_frames
        self.chunk_samples = chunk_frames * self.hop
        # The STFT framing as a stream layer: width-n_fft stride-hop conv
        # with reflect left pad n_fft//2 (features.py:236-251).
        self._fe_spec = _LayerSpec(self.n_fft, self.hop, 1, self.n_fft // 2)
        # Frontend frames lag the audio end by ceil((n_fft/2)/hop) (the
        # reflect-right region still owed when the stream ends); a tail of
        # <= chunk_samples therefore yields at most chunk_frames + lag
        # more frames.
        self._fe_lag = -(-(self.n_fft // 2) // self.hop)
        self._fin_frames = chunk_frames + self._fe_lag

    def _set_fin_zeros(self, fe_carry_len: int):
        need = self.n_fft + self.hop * (self._fin_frames - 1)
        self._fin_zeros = max(self.n_fft // 2,
                              need - fe_carry_len - self.chunk_samples)

    def _preemph(self, x, prev):
        """x[t] - 0.97*x[t-1] with ``prev`` as x[-1] (features.py:221-226;
        prime passes prev=x[0] so the first sample is unchanged)."""
        import jax.numpy as jnp
        shifted = jnp.concatenate([prev, x[:, :-1]], axis=1)
        return x - PREEMPH * shifted

    def _frames_to_mel(self, buf, n_frames: int):
        """VALID strided DFT-conv -> power -> mel -> log1p, exactly the
        offline 'conv' path (features.py:266-283)."""
        import jax
        import jax.numpy as jnp
        n_bins = 1 + self.n_fft // 2
        usable = (n_frames - 1) * self.hop + self.n_fft
        spec = jax.lax.conv_general_dilated(
            buf[:, :usable, None], jnp.asarray(self._dft_kernel),
            window_strides=(self.hop,), padding='VALID',
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            precision=jax.lax.Precision.HIGH)
        re, im = spec[..., :n_bins], spec[..., n_bins:]
        power = re * re + im * im
        mel = jnp.einsum('bfn,nm->bfm', power, jnp.asarray(self._fb_t),
                         precision='highest',
                         preferred_element_type=jnp.float32)
        feats = jnp.log1p(mel + LOG_ZERO_GUARD)
        if self._dct is not None:  # MFCC: DCT before normalization, as
            feats = jnp.einsum('bfm,mc->bfc', feats,   # features.py:313-315
                               jnp.asarray(self._dct), precision='highest')
        return feats

    def _normalize(self, feats, mask, count, nsum, nsumsq):
        """Masked normalization; cumulative mode updates running stats
        (unbiased variance, matching the offline frontend)."""
        import jax.numpy as jnp
        if self.norm == 'precomputed':
            out = (feats - self._norm_mean[None, None, :]) \
                / (self._norm_std[None, None, :] + NORM_EPS)
            return out * mask, count, nsum, nsumsq
        maskf = mask
        count = count + jnp.sum(maskf[:, :, 0], axis=1)
        nsum = nsum + jnp.sum(feats * maskf, axis=1)
        nsumsq = nsumsq + jnp.sum(jnp.square(feats) * maskf, axis=1)
        c = jnp.maximum(count, 1.0)[:, None]
        mean = nsum / c
        var = jnp.maximum(
            (nsumsq - c * jnp.square(mean)) / jnp.maximum(c - 1.0, 1.0), 0.0)
        out = (feats - mean[:, None, :]) / (jnp.sqrt(var)[:, None, :]
                                            + NORM_EPS)
        return out * maskf, count, nsum, nsumsq

    def _fe_prime(self, audio):
        """First window: reflect-left prime. Returns
        (preemph_last, fe_carry, norm_state, feats [B, n, M])."""
        import jax.numpy as jnp
        # prev=0 so x[0] stays unchanged, matching the offline frontend's
        # first-sample-unchanged convention (features.py:235-240).
        x = self._preemph(audio, jnp.zeros_like(audio[:, :1]))
        left = x[:, 1:self.n_fft // 2 + 1][:, ::-1]
        buf = jnp.concatenate([left, x], axis=1)
        n = (buf.shape[1] - self.n_fft) // self.hop + 1
        fe_carry = buf[:, n * self.hop:]
        feats = self._frames_to_mel(buf, n)
        B = audio.shape[0]
        mask = jnp.ones((B, n, 1), jnp.float32)
        count = jnp.zeros((B,), jnp.float32)
        nsum = jnp.zeros((B, self.feat_dim), jnp.float32)
        nsumsq = jnp.zeros((B, self.feat_dim), jnp.float32)
        feats, count, nsum, nsumsq = self._normalize(feats, mask, count,
                                                     nsum, nsumsq)
        return audio[:, -1:], fe_carry, (count, nsum, nsumsq), feats

    def _fe_step(self, preemph_last, fe_carry, norm_state, audio):
        import jax.numpy as jnp
        x = self._preemph(audio, preemph_last)
        buf = jnp.concatenate([fe_carry, x], axis=1)
        n = self.chunk_frames
        fe_carry = buf[:, n * self.hop:]
        feats = self._frames_to_mel(buf, n)
        mask = jnp.ones((audio.shape[0], n, 1), jnp.float32)
        feats, count, nsum, nsumsq = self._normalize(feats, mask,
                                                     *norm_state)
        return audio[:, -1:], fe_carry, (count, nsum, nsumsq), feats

    def _fe_finish(self, preemph_last, fe_carry, norm_state, tail,
                   tail_lengths, extra_zero_frames: int = 0):
        """Final window: per-sample reflect-right at the true boundary
        (features.py:240-251), frames beyond flen zeroed. Returns
        (feats [B, fin_frames + extra_zero_frames, M], valid_frames [B])."""
        import jax
        import jax.numpy as jnp
        B = tail.shape[0]
        x = self._preemph(tail, preemph_last)
        zeros = jnp.zeros((B, self._fin_zeros), jnp.float32)
        buf = jnp.concatenate([fe_carry, x, zeros], axis=1)
        fe_off = fe_carry.shape[1]
        pad = self.n_fft // 2
        # Offline puts audio[L-2-i] at padded position L+i (features.py:
        # 243-247, long-stream case of the mod formula); here audio[L-2-i]
        # lives at buf[fe_off + tail_len - 2 - i].
        pos = fe_off + tail_lengths[:, None]                  # [B, 1]
        idx = jnp.clip(pos - 2 - jnp.arange(pad)[None, :], 0,
                       buf.shape[1] - 1)
        right = jnp.take_along_axis(buf, idx, axis=1)
        padded = jax.vmap(
            lambda row, upd, off: jax.lax.dynamic_update_slice(
                row, upd, (off,)))(buf, right, fe_off + tail_lengths)
        n = self._fin_frames
        feats = self._frames_to_mel(padded, n)
        valid = tail_lengths // self.hop + self._fe_lag       # [B] frames
        mask = (jnp.arange(n)[None, :] < valid[:, None])[:, :, None] \
            .astype(jnp.float32)
        feats, _, _, _ = self._normalize(feats, mask, *norm_state)
        if extra_zero_frames:
            flush = jnp.zeros((B, extra_zero_frames, feats.shape[2]),
                              jnp.float32)
            feats = jnp.concatenate([feats, flush], axis=1)
        return feats, valid


class StreamingWav2Letter(_FrontendStreaming):
    """Chunked stateful inference over a trained Wav2Letter.

    Parameters
    ----------
    layers : the model's layer spec list, already truncated to mid_layers
        (``list(cfg.model.layers)[:cfg.model.mid_layers]``).
    variables : trained flax variables ({'params', 'batch_stats'}).
    frontend : the offline ``SpectrogramFrontend`` (geometry + DFT/mel
        constants are taken from it, so streaming numerics match).
    chunk_frames : steady-state chunk size in STFT frames (must be divisible
        by the model's total stride). 64 frames = 640 ms at 10 ms hop.
    norm : 'precomputed' (fixed stats; exact offline equivalence) or
        'cumulative' (running stats over frames seen so far).
    norm_stats : (mean [M], std [M]) — required for 'precomputed'.
    folded : pre-folded weights (from ``fold_batchnorm``,
        ``quantize_folded``, or an exported artifact via
        ``export.load_serving``); when given, ``variables`` may be None
        and ``weights`` is ignored.
    padding_mode : must match the trained model's ``model.padding_mode``
        ('reflect' default, or 'zeros' — models/wav2letter.py:40).
    """

    def __init__(self, layers, num_labels: int, variables, frontend,
                 chunk_frames: int = 64, norm: str = 'cumulative',
                 norm_stats=None, weights: str = 'f32', folded=None,
                 padding_mode: str = 'reflect', act_scales=None):
        import jax  # deferred so module import never initializes a backend

        self.num_labels = num_labels
        self._act_scales = act_scales  # static int8 scales (int8_full)
        self._init_frontend(frontend, norm, norm_stats, chunk_frames)
        if padding_mode not in ('reflect', 'zeros'):
            raise ValueError(f'unknown padding_mode: {padding_mode!r}')

        # Layer geometry. The frontend's framing is spec[0]; conv left pads
        # use the even-total-frames convention (bucketed offline shapes are
        # even at the stride-2 layer; see module docstring).
        self._layer_cfg = [dict(l) for l in layers]
        specs = [self._fe_spec]
        for l in self._layer_cfg:
            k, s, d = (int(l['kernel_size']), int(l.get('stride', 1)),
                       int(l.get('dilation', 1)))
            # SAME pad for a stride-divisible input length at this layer
            # (models/base.py:27-38 with s | t_in): out = t/s, so
            # pad = (t/s-1)s + (k-1)d + 1 - t = (k-1)d + 1 - s, length-free.
            pad = max(0, (k - 1) * d + 1 - s)
            specs.append(_LayerSpec(k, s, d, pad // 2, padding_mode))
        specs.append(_LayerSpec(1, 1, 1, 0, padding_mode))  # 1x1 head
        self._specs = specs
        self.scale = int(np.prod([sp.stride for sp in specs[1:]]))
        if chunk_frames % self.scale:
            raise ValueError(f'chunk_frames must be divisible by the total '
                             f'stride {self.scale}')

        # Smallest prime window all layers can reflect-prime from.
        plan = None
        fp = chunk_frames
        while plan is None:
            fp += 1
            if fp > 1 << 16:
                raise ValueError('no feasible prime window; model lookahead '
                                 'too large for streaming')
            plan = _plan(specs, fp * self.hop, self.chunk_samples)
        self.prime_frames = fp
        self.prime_samples = fp * self.hop
        self._carries, self._prime_outs, self._chunk_outs = plan
        self.prime_out = self._prime_outs[-1]       # head frames at prime
        self.chunk_out = self._chunk_outs[-1]       # head frames per step
        # Algorithmic lookahead: input frames that must arrive beyond an
        # output's position before it can be emitted.
        la = 0
        for sp in reversed(specs[1:]):
            la = la * sp.stride + (sp.ctx - sp.left)
        self.lookahead_frames = la

        # ---- finish-phase static geometry ----
        self._set_fin_zeros(self._carries[0])
        # Max head frames still owed after the last steady chunk.
        rem_max = (fp + chunk_frames + 1) // self.scale - self.prime_out
        z = 0
        while True:
            # Simulate the conv stack over (finish frames + z zero frames).
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

        self._act_int8 = weights == 'int8_full'
        if folded is not None:
            self._folded = list(folded)
        else:
            self._folded = fold_batchnorm(variables, len(self._layer_cfg))
            if weights in ('int8', 'int8_full'):
                from .quantize import quantize_folded
                self._folded = quantize_folded(self._folded)
            elif weights != 'f32':
                raise ValueError(f'unknown weights mode: {weights!r}')
        if self._act_int8 and len(self._folded[0]) != 3:
            raise ValueError("weights='int8_full' needs quantized weights")
        # Weights are jit ARGUMENTS, not closure constants: 600 MB of f32
        # baked into the HLO blows up compile payloads (and the axon
        # tunnel's request limit); as device-resident args they are hashed
        # by shape only.
        self._weights_dev = jax.device_put(
            [tuple(a for a in wb) for wb in self._folded])
        self._prime_fn = jax.jit(self._prime)
        self._step_fn = jax.jit(self._step)
        self._finish_fn = jax.jit(self._finish)

    # ------------------------------------------------------------------
    # jitted phase programs
    # ------------------------------------------------------------------

    def _conv_layers(self, folded, feats, carries, primed: bool):
        """Run the folded conv stack over new frames. When priming,
        ``carries`` is None and each layer reflect-pads from its first
        frames (offline jnp.pad mode='reflect', models/wav2letter.py:50).
        Returns (log_probs, new_carries)."""
        import jax
        import jax.numpy as jnp

        from .infer import _materialize
        new_carries = []
        x = feats
        for i, (sp, wb) in enumerate(zip(self._specs[1:-1], folded[:-1])):
            if primed:
                if sp.pad_mode == 'reflect':
                    left = x[:, 1:sp.left + 1][:, ::-1]
                else:  # zeros: Conv1dBlock padding_mode='zeros'
                    left = jnp.zeros((x.shape[0], sp.left, x.shape[2]),
                                     x.dtype)
                buf = jnp.concatenate([left, x], axis=1)
            else:
                buf = jnp.concatenate([carries[i], x], axis=1)
            q = (buf.shape[1] - sp.ctx - 1) // sp.stride + 1
            new_carries.append(buf[:, q * sp.stride:])
            if self._act_int8:
                # int8 x int8 -> int32 on the MXU (~1.7x bf16 conv
                # throughput). Dynamic per-row scales are exact on interior
                # chunks (no padding frames); in the finish phase the flush
                # frames are clamp(0,20)-bounded like real activations, so
                # any grid stretch is bounded — pass static calibrated
                # ``act_scales`` to remove it entirely.
                from .infer import dynamic_act_scale, quantize_act
                wq, w_scale, b = wb
                a_scale = (jnp.float32(self._act_scales[i])
                           if self._act_scales is not None
                           else dynamic_act_scale(buf))
                out = jax.lax.conv_general_dilated(
                    quantize_act(buf, a_scale), wq,
                    window_strides=(sp.stride,), padding='VALID',
                    rhs_dilation=(sp.dilation,),
                    dimension_numbers=('NWC', 'WIO', 'NWC'),
                    preferred_element_type=jnp.int32)
                out = out.astype(jnp.float32) \
                    * (a_scale * w_scale[None, None, :])
            else:
                w, b = _materialize(wb)
                out = jax.lax.conv_general_dilated(
                    buf, w, window_strides=(sp.stride,),
                    padding='VALID', rhs_dilation=(sp.dilation,),
                    dimension_numbers=('NWC', 'WIO', 'NWC'))
            x = jnp.clip(out + b, 0.0, 20.0)
        if self._act_int8:
            from .infer import dynamic_act_scale, quantize_act
            wq, w_scale, bh = folded[-1]
            a_scale = (jnp.float32(self._act_scales[-1])
                       if self._act_scales is not None
                       else dynamic_act_scale(x))
            logits = jax.lax.dot_general(
                quantize_act(x, a_scale), wq[0], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) \
                * (a_scale * w_scale[None, None, :]) + bh
        else:
            wh, bh = _materialize(folded[-1])
            logits = jnp.einsum('btc,cl->btl', x, wh[0]) + bh
        return jax.nn.log_softmax(logits, axis=-1), tuple(new_carries)

    def _prime(self, folded, audio):
        last, fe_carry, norm_state, feats = self._fe_prime(audio)
        logp, conv_carries = self._conv_layers(folded, feats, None,
                                               primed=True)
        state = StreamState(last, fe_carry, conv_carries, *norm_state)
        return state, logp

    def _step(self, folded, state, audio):
        last, fe_carry, norm_state, feats = self._fe_step(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq), audio)
        logp, conv_carries = self._conv_layers(folded, feats,
                                               state.conv_carries,
                                               primed=False)
        return StreamState(last, fe_carry, conv_carries, *norm_state), logp

    def _finish(self, folded, state, tail, tail_lengths):
        """tail: [B, chunk_samples] zero-padded; tail_lengths: [B] valid
        samples within it. Replicates the offline right boundary: reflect
        pad at each sample's true end, zero features beyond flen, flush
        the conv lookahead over those zeros."""
        feats, _ = self._fe_finish(
            state.preemph_last, state.fe_carry,
            (state.norm_count, state.norm_sum, state.norm_sumsq),
            tail, tail_lengths, extra_zero_frames=self._fin_flush)
        logp, _ = self._conv_layers(folded, feats, state.conv_carries,
                                    primed=False)
        # Head frames still valid in this finish emission.
        fin_valid = (self.prime_frames + tail_lengths // self.hop + 1) \
            // self.scale - self.prime_out
        return logp, fin_valid

    # ------------------------------------------------------------------
    # session API
    # ------------------------------------------------------------------

    def start(self, batch_size: int = 1) -> 'StreamingSession':
        return StreamingSession(self, batch_size)


class StreamingSession:
    """Accumulates audio, dispatches the compiled phase programs, and
    tracks emitted/valid frame bookkeeping host-side."""

    def __init__(self, model: StreamingWav2Letter, batch_size: int):
        self.m = model
        self.B = batch_size
        self._buf = np.zeros((batch_size, 0), np.float32)
        self._state = None
        self._consumed = 0          # samples dispatched through prime/step
        self._head_emitted = 0
        self._finished = False

    def feed(self, audio) -> np.ndarray:
        """Append raw audio [B, n]; returns newly emitted log-probs
        [B, m, L] (m may be 0 while the prime window fills)."""
        if self._finished:
            raise RuntimeError('session already finished')
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        if audio.shape[0] != self.B:
            raise ValueError(f'expected batch {self.B}, got {audio.shape[0]}')
        self._buf = np.concatenate([self._buf, audio], axis=1)
        outs = []
        while True:
            if self._state is None:
                if self._buf.shape[1] < self.m.prime_samples:
                    break
                chunk = self._buf[:, :self.m.prime_samples]
                self._buf = self._buf[:, self.m.prime_samples:]
                self._state, logp = self.m._prime_fn(self.m._weights_dev,
                                                     chunk)
                self._consumed += self.m.prime_samples
                self._head_emitted += self.m.prime_out
                outs.append(np.asarray(logp))
            elif self._buf.shape[1] >= self.m.chunk_samples:
                chunk = self._buf[:, :self.m.chunk_samples]
                self._buf = self._buf[:, self.m.chunk_samples:]
                self._state, logp = self.m._step_fn(self.m._weights_dev,
                                                    self._state, chunk)
                self._consumed += self.m.chunk_samples
                self._head_emitted += self.m.chunk_out
                outs.append(np.asarray(logp))
            else:
                break
        if not outs:
            return np.zeros((self.B, 0, self.m.num_labels), np.float32)
        return np.concatenate(outs, axis=1)

    def finish(self, lengths=None):
        """Flush the stream. ``lengths``: per-sample TOTAL sample counts
        (default: everything fed). Each sample's end must fall after the
        last dispatched chunk (within the final partial window). Returns
        (log_probs [B, m, L], valid [B]) — ``valid`` counts frames of this
        finish emission; earlier feed() emissions are all valid."""
        if self._finished:
            raise RuntimeError('session already finished')
        if self._state is None:
            raise ValueError(
                f'stream shorter than the prime window '
                f'({self.m.prime_samples} samples); use the offline path')
        total_fed = self._consumed + self._buf.shape[1]
        if lengths is None:
            lengths = np.full((self.B,), total_fed, np.int64)
        lengths = np.asarray(lengths, np.int64)
        tail_len = lengths - self._consumed
        if np.any(tail_len < 0) or np.any(tail_len > self.m.chunk_samples):
            raise ValueError('every sample must end within the final '
                             'partial chunk; pad shorter streams offline '
                             'or run them in their own session')
        tail = np.zeros((self.B, self.m.chunk_samples), np.float32)
        avail = self._buf.shape[1]
        if avail:
            tail[:, :avail] = self._buf
        self._finished = True
        logp, valid = self.m._finish_fn(self.m._weights_dev, self._state,
                                        tail, tail_len.astype(np.int32))
        return np.asarray(logp), np.asarray(valid)

    @property
    def head_frames_emitted(self) -> int:
        return self._head_emitted

    @property
    def consumed_samples(self) -> int:
        """Samples already dispatched; every stream's true end must lie in
        [consumed_samples, consumed_samples + chunk_samples] at finish()."""
        return self._consumed


def greedy_collapse(ids, last: int):
    """One incremental greedy-CTC collapse step: collapse repeats, drop
    blanks (id 0), carrying the previous frame's id across chunk
    boundaries (reference decoder.py:104-119). Returns
    (emitted label ids, their frame positions, new carry)."""
    out, pos = [], []
    for t, i in enumerate(ids):
        i = int(i)
        if i != 0 and i != last:
            out.append(i)
            pos.append(t)
        last = i
    return out, pos, last


class StreamingBeamTranscriber:
    """Incremental beam-search transcription over a streaming session.

    The CTC prefix-beam DP reads only the previous time step, so it
    advances chunk by chunk (``decoding.IncrementalPrefixBeam``) with
    optional LM fusion at word boundaries; the live current-best hypothesis
    is available after every feed, and the final result equals offline
    ``prefix_beam_search`` on the whole utterance (reference
    decoder.py:147-233 semantics)."""

    def __init__(self, session: StreamingSession, labels, lm_path: str = '',
                 k: int = None, alpha: float = None, beta: float = None,
                 prune: float = None, hotwords=None,
                 hotword_weight: float = 2.0):
        """``hotwords``: contextual-biasing words/phrases applied inside
        the incremental DP (decoding.HotwordTrie partial-credit fusion) —
        per-stream vocabularies bias live transcription without
        retraining. k/alpha/beta/prune default (None) to the corpus-sweep
        winners (decoding.decoder.DEFAULT_BEAM_*)."""
        from ..decoding.decoder import (DEFAULT_BEAM_ALPHA, DEFAULT_BEAM_BETA,
                                        DEFAULT_BEAM_K, DEFAULT_BEAM_PRUNE,
                                        IncrementalPrefixBeam)
        k = DEFAULT_BEAM_K if k is None else k
        alpha = DEFAULT_BEAM_ALPHA if alpha is None else alpha
        beta = DEFAULT_BEAM_BETA if beta is None else beta
        prune = DEFAULT_BEAM_PRUNE if prune is None else prune
        lm = None
        if lm_path:
            from ..decoding.arpa_lm import load_lm
            model = load_lm(lm_path)
            lm = lambda s: 10 ** model.score(s)
        self.session = session
        # Jasper sessions emit probabilities; Wav2Letter log-probs.
        self._emits_probs = getattr(session.m, 'emits_probs', False)
        self._beams = [IncrementalPrefixBeam(list(labels), lm=lm, k=k,
                                             alpha=alpha, beta=beta,
                                             prune=prune, hotwords=hotwords,
                                             hotword_weight=hotword_weight)
                       for _ in range(session.B)]

    def _advance(self, out, valid=None):
        probs = out if self._emits_probs else np.exp(out)
        bests = []
        for b, beam in enumerate(self._beams):
            n = probs.shape[1] if valid is None else int(valid[b])
            bests.append(beam.step(probs[b, :n]) if n else beam.result())
        return bests

    def feed(self, audio):
        """Returns the current-best hypothesis per stream."""
        return self._advance(self.session.feed(audio))

    def finish(self, lengths=None):
        out, valid = self.session.finish(lengths)
        return self._advance(out, valid)

    @property
    def text(self):
        return [beam.result() for beam in self._beams]


def stream_logprobs(model, audio, length: int | None = None) -> np.ndarray:
    """Run ONE utterance through a fresh streaming session; returns the
    concatenated valid outputs ``[1, T', L]``. Shared by the eval CLIs."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    sess = model.start(1)
    outs = []
    for s in range(0, audio.shape[1], model.chunk_samples):
        outs.append(sess.feed(audio[:, s:s + model.chunk_samples]))
    fin, valid = sess.finish(
        None if length is None else np.array([length]))
    return np.concatenate(
        [o for o in outs if o.shape[1]] + [fin[:, :int(valid[0])]], axis=1)


class StreamingTranscriber:
    """Incremental greedy CTC transcription over a streaming session:
    collapse repeats then drop blanks (reference decoder.py:104-119), with
    the repeat state carried across chunk boundaries. Per-character frame
    offsets are tracked globally, so ``word_timings`` matches the offline
    ``get_time_per_word`` surface (reference decoder.py:270-302)."""

    def __init__(self, session: StreamingSession, labels):
        self.session = session
        self.labels = list(labels)
        self._last = [0] * session.B   # previous frame's argmax id
        self._text = [''] * session.B
        self._offsets = [[] for _ in range(session.B)]
        self._frame = [0] * session.B  # global output frames consumed

    def _consume(self, logp, valid=None):
        if logp.shape[1] == 0:
            return ['' for _ in range(self.session.B)]
        ids = np.argmax(logp, axis=-1)      # [B, T]
        fresh = []
        for b in range(self.session.B):
            n = logp.shape[1] if valid is None else int(valid[b])
            out, pos, self._last[b] = greedy_collapse(ids[b, :n],
                                                      self._last[b])
            self._offsets[b].extend(self._frame[b] + t for t in pos)
            self._frame[b] += n
            fresh.append(''.join(self.labels[i] for i in out))
            self._text[b] += fresh[-1]
        return fresh

    def feed(self, audio):
        """Returns the newly decoded text per stream."""
        return self._consume(self.session.feed(audio))

    def finish(self, lengths=None):
        """Flush; returns the final complete transcripts."""
        logp, valid = self.session.finish(lengths)
        self._consume(logp, valid)
        return list(self._text)

    @property
    def text(self):
        return list(self._text)

    def word_timings(self, frame_seconds: float):
        """[(word, start_s, end_s)] per stream — the streaming counterpart
        of the offline ``get_time_per_word`` path (test.py --word-timings).
        ``frame_seconds`` = window_stride x the model's scaling factor."""
        from ..decoding import get_time_per_word
        return [get_time_per_word(list(self._text[b]), self._offsets[b],
                                  ratio=frame_seconds)
                for b in range(self.session.B)]
