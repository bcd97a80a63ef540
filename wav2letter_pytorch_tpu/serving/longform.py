"""Exact long-form inference: overlap-chunked sequence parallelism.

Transcribing hour-scale audio through ``offline_forward`` directly is
memory-bound: interior conv activations are ``T x C`` with C up to 1024, so
a 10-hour file cannot hold all layer activations in HBM at once. The
streaming sessions (streaming.py) already solve unbounded length with
bounded memory — but sequentially, one small dispatch per block, and under
fixed CMVN normalization. This module is the *throughput* answer for
offline long-file jobs: split the utterance into overlapping windows whose
overlap covers the conv stack's receptive field, run them as ONE batch
through the existing offline stack (optionally sharded across the device
mesh — sequence parallelism via the batch axis), then crop each window to
its core frames and concatenate. The result is exactly the global
computation, including per-utterance normalization (the frontend runs once
over the whole utterance — features are tiny relative to activations).

Exactness is by construction, and the construction has two non-obvious
alignment requirements (both rooted in models/base.py::same_pad_amount,
whose left/right pad split depends on ``t_in mod stride``):

* every window must start on the cumulative-stride grid (``a ≡ 0 mod S``),
  so local output index ``j`` maps to global index ``j + a/S`` at every
  layer; and
* every window must have length ``W ≡ T0 (mod S)``, so each layer's local
  SAME-pad split equals the global one — centered SAME padding makes
  interior outputs depend on total-length *parity*, and a window of
  mismatched parity reproduces a shifted grid, not the global one.

Windows are uniform length (first/last included — starts clamp to
``[0, T0-W]``, which stays on the grid because ``T0-W ≡ 0 mod S``), so the
whole job is a single compiled shape. Kept outputs depend only on real
frames for interior windows; boundary windows start/end exactly at the
utterance edge, where local reflect/zero SAME padding IS the global one.

Restrictions: BN-folded stacks only (Wav2Letter family; Jasper's
group/instance/layer norms reduce over time, which breaks chunk locality —
use the streaming path for those). int8_full requires static
``act_scales`` for exactness (dynamic scales reduce per window, not per
utterance; allowed, but then parity with a one-shot dynamic-scale run is
approximate by nature).

Reference: no long-form story exists upstream (its eval pads whole
utterances, /root/reference/data/data_loader.py); this is TPU-native
surplus.
"""

from __future__ import annotations

import numpy as np

from .infer import _layer_geometry, offline_forward, offline_forward_q8


def stack_geometry(layers):
    """(S, P, Q): cumulative stride and conservative left/right receptive
    field of the conv stack, in input-frame units.

    ``P``/``Q`` bound how far any kept output's dependency window can reach
    left/right of its grid point, using the worst-case pad split (the whole
    ``(k-1)*d`` on one side) so they are valid for every length parity.
    """
    S, P, Q = 1, 0, 0
    for k, s, d in _layer_geometry(layers):
        reach = (k - 1) * d
        P += S * reach
        Q += S * reach
        S *= s
    return S, P, Q


def plan_windows(t_frames: int, layers, chunk_frames: int):
    """Chunking plan over a ``t_frames``-long feature sequence.

    Returns ``(W, out_w, starts, keeps)`` where windows are
    ``feats[a : a+W]`` for ``a`` in ``starts`` (all equal length ``W``),
    ``out_w`` is each window's output-frame count, and ``keeps[i] =
    (j0_local, j1_local, j0_global)`` crops window ``i``'s exact core.
    ``W`` is None when one shot covers everything (no chunking needed).
    """
    S, P, Q = stack_geometry(layers)
    h_l = -(-P // S) + 1          # halo in output frames, +1 slack
    h_r = -(-Q // S) + 1
    core = int(chunk_frames)
    if core < 1:
        raise ValueError('chunk_frames must be >= 1')
    w_base = S * (core + h_l + h_r)
    # W ≡ t_frames (mod S): equal per-layer pad splits local vs global.
    w = w_base + (t_frames - w_base) % S
    t_out = _out_frames(t_frames, layers)
    if w >= t_frames:
        return None, t_out, [0], [(0, t_out, 0)]
    out_w = _out_frames(w, layers)
    starts, keeps = [], []
    n_chunks = -(-t_out // core)
    for i in range(n_chunks):
        a = min(max(0, S * (i * core - h_l)), t_frames - w)
        j0, j1 = i * core, min((i + 1) * core, t_out)
        starts.append(a)
        keeps.append((j0 - a // S, j1 - a // S, j0))
    return w, out_w, starts, keeps


def _out_frames(t: int, layers) -> int:
    for _, s, _ in _layer_geometry(layers):
        t = -(-t // s)
    return t


def make_window_forward(layers, folded, mode: str = 'f32',
                        padding_mode: str = 'reflect', act_scales=None,
                        f32_layers=()):
    """Jitted ``(weights, feats[B,T,F]) -> log_probs[B,T',L]`` for the
    window batches, built ONCE per transcriber/job. ``jax.jit`` caches by
    function identity, so rebuilding this closure per call would recompile
    the whole stack every time (~40 s through the device tunnel)."""
    import jax

    if mode == 'int8_full':
        if len(folded[0]) != 3:
            raise ValueError("mode='int8_full' needs quantized weights")

        def fwd(w, f):
            return offline_forward_q8(layers, w, f, None,
                                      padding_mode=padding_mode,
                                      act_scales=act_scales,
                                      f32_layers=f32_layers)[0]
    elif mode in ('f32', 'int8'):
        def fwd(w, f):
            return offline_forward(layers, w, f, None,
                                   padding_mode=padding_mode)[0]
    else:
        raise ValueError(f'unknown mode: {mode!r}')
    return jax.jit(fwd)


def longform_logprobs(layers, folded, frontend, audio,
                      mode: str = 'f32', padding_mode: str = 'reflect',
                      act_scales=None, f32_layers=(),
                      chunk_frames: int = 2000, max_batch: int = 8,
                      mesh=None, jfwd=None, jfrontend=None, weights=None):
    """Log-probs for ONE long utterance, exact vs the one-shot offline run.

    ``audio``: 1-D float samples. ``chunk_frames``: core output frames per
    window (memory knob; dependency halos are added automatically from the
    stack's receptive field). ``max_batch``: windows per dispatch.
    ``mesh``: optional device mesh — windows shard across its ``data``
    axis, turning the time axis into mesh parallelism.

    ``jfwd``/``jfrontend``/``weights``: prebuilt jitted programs and
    device-resident weights (see ``LongFormTranscriber``); pass them when
    calling repeatedly so compiled programs are reused across calls.

    Returns ``(log_probs [T_out, L], valid_frames)`` as numpy; ``L`` log-
    softmax over labels, ``valid_frames = len(audio_frames) // S`` (the
    stack's floor-convention valid length, matching ``offline_forward``).
    """
    import jax

    audio = np.asarray(audio, np.float32).reshape(-1)
    # Frontend once over the whole utterance: per-utterance normalization
    # (and every other global statistic) is computed exactly.
    if jfrontend is None:
        jfrontend = jax.jit(frontend)
    feats, flens = jfrontend(audio[None, :],
                             np.array([audio.shape[0]], np.int32))
    feats = np.asarray(feats[0])
    t_frames = int(np.asarray(flens)[0])
    feats = feats[:t_frames]

    S, _, _ = stack_geometry(layers)
    w_len, out_w, starts, keeps = plan_windows(t_frames, layers,
                                               chunk_frames)
    if jfwd is None:
        jfwd = make_window_forward(layers, folded, mode=mode,
                                   padding_mode=padding_mode,
                                   act_scales=act_scales,
                                   f32_layers=f32_layers)
    if weights is None:
        weights = jax.device_put([tuple(a for a in wb) for wb in folded])
    if w_len is None:                      # short utterance: one shot
        logp = np.asarray(jfwd(weights, feats[None, :, :])[0])
        return logp, t_frames // S

    windows = np.stack([feats[a:a + w_len] for a in starts])
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding
        n = int(np.prod([mesh.shape[ax] for ax in mesh.axis_names
                         if ax == 'data']) or 1)
        max_batch = max(max_batch // n, 1) * n
        weights = jax.device_put(weights, replicated_sharding(mesh))
        put = lambda x: jax.device_put(x, batch_sharding(mesh))  # noqa: E731
    else:
        put = lambda x: x                                        # noqa: E731

    # Dispatch every group before fetching any result: XLA executions are
    # async, so the host->device transfer and compute of group i+1 overlap
    # fetching group i instead of serializing on each np.asarray.
    dispatched = []
    for lo in range(0, len(windows), max_batch):
        group = windows[lo:lo + max_batch]
        if len(group) < max_batch:        # pad to the compiled batch shape
            pad = np.repeat(group[-1:], max_batch - len(group), axis=0)
            group = np.concatenate([group, pad])
        dispatched.append(jfwd(weights, put(group)))

    t_out = _out_frames(t_frames, layers)
    num_labels = None
    out = None
    for lo, dev in zip(range(0, len(windows), max_batch), dispatched):
        logp = np.asarray(dev)
        if out is None:
            num_labels = logp.shape[-1]
            out = np.empty((t_out, num_labels), logp.dtype)
        for gi, (j0, j1, g0) in enumerate(keeps[lo:lo + max_batch]):
            out[g0:g0 + (j1 - j0)] = logp[gi, j0:j1]
    return out, t_frames // S


def blank_segments(log_probs, blank_index: int = 0,
                   min_blank_run: int = 20, max_frames: int = 1200):
    """Split a long utterance's output frames at confident silences.

    Beam-search DPs in probability space (reference decoder.py:147-233
    parity) underflow float64 after a few thousand frames — a product of
    ~23k frame probabilities is exactly 0.0 — so hour-scale outputs must
    be decoded in utterance-scale pieces. Cuts are placed at the centers
    of argmax-blank runs of at least ``min_blank_run`` frames (~the
    model asserting silence); segments still longer than ``max_frames``
    (continuous speech with no long silence) are split recursively at
    their longest interior blank run — a blank argmax is where prefix
    hypotheses agree no label is being emitted, the least damaging place
    to cut.

    Returns a list of (start, end) frame ranges covering [0, T).
    """
    am = np.asarray(log_probs).argmax(-1)
    T = len(am)
    # All maximal blank runs as (start, length).
    runs = []
    run = 0
    for t in range(T + 1):
        if t < T and am[t] == blank_index:
            run += 1
        else:
            if run:
                runs.append((t - run, run))
            run = 0

    cuts = [s + ln // 2 for s, ln in runs if ln >= min_blank_run]
    segs = []
    prev = 0
    for c in cuts:
        if c > prev:
            segs.append((prev, c))
            prev = c
    if prev < T:
        segs.append((prev, T))

    def split(a, b):
        if b - a <= max_frames:
            return [(a, b)]
        # Longest blank run strictly inside (a, b).
        best = None
        for s, ln in runs:
            c = s + ln // 2
            if a < c < b and (best is None or ln > best[1]):
                best = (c, ln)
        c = best[0] if best is not None else (a + b) // 2
        if c <= a or c >= b:
            return [(a, b)]
        return split(a, c) + split(c, b)

    return [piece for a, b in (segs or [(0, T)]) for piece in split(a, b)]


def decode_segmented(log_probs, decoder, blank_index: int = 0,
                     min_blank_run: int = 20, is_log: bool = True):
    """Beam-decode a long output by independent silence-bounded segments
    and join with spaces (greedy decoders can consume the full sequence
    directly and don't need this)."""
    texts = []
    for a, b in blank_segments(log_probs, blank_index, min_blank_run):
        seg = log_probs[a:b]
        out = decoder.decode(np.exp(seg) if is_log else seg)
        out = out.strip()
        if out:
            texts.append(out)
    return ' '.join(texts)


class LongFormTranscriber:
    """Convenience wrapper: artifact/folded weights + frontend + decoder ->
    ``transcribe(audio) -> str`` for arbitrarily long recordings."""

    def __init__(self, layers, folded, frontend, decoder, mode='f32',
                 padding_mode='reflect', act_scales=None, f32_layers=(),
                 chunk_frames: int = 2000, max_batch: int = 8, mesh=None):
        import jax

        self._kw = dict(mode=mode, padding_mode=padding_mode,
                        act_scales=act_scales, f32_layers=f32_layers,
                        chunk_frames=chunk_frames, max_batch=max_batch,
                        mesh=mesh)
        self.layers, self.folded, self.frontend = layers, folded, frontend
        self.decoder = decoder
        # Built once: repeated transcribe()/logprobs() calls reuse the
        # compiled window program and the device-resident weights (the
        # window batch shape is fixed by chunk_frames, so only the tiny
        # frontend recompiles when the audio length changes).
        self._jfwd = make_window_forward(layers, folded, mode=mode,
                                         padding_mode=padding_mode,
                                         act_scales=act_scales,
                                         f32_layers=f32_layers)
        self._jfe = jax.jit(frontend)
        self._weights = jax.device_put(
            [tuple(a for a in wb) for wb in folded])

    def logprobs(self, audio):
        return longform_logprobs(self.layers, self.folded, self.frontend,
                                 audio, jfwd=self._jfwd,
                                 jfrontend=self._jfe,
                                 weights=self._weights, **self._kw)

    def transcribe(self, audio) -> str:
        logp, valid = self.logprobs(audio)
        return self.decoder.decode(logp[None, :valid, :],
                                   sizes=np.array([valid]))[0]
