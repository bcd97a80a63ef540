"""Data-parallel batched inference over a device mesh — the transcription
service regime.

Training shards batches over the ``data`` mesh axis (parallel/mesh.py);
this is the serving counterpart with no trainer attached: folded (or
quantized) weights are replicated once, every dispatch shards the raw
audio batch across chips, and the whole pipeline — on-device frontend +
fused conv stack — runs as one SPMD program. Pure data parallelism: the
forward path needs no collectives, so throughput scales linearly over ICI.
"""

from __future__ import annotations

import numpy as np

from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding


class MeshInference:
    """Batched offline inference sharded across a device mesh.

    Parameters mirror ``StreamingWav2Letter``: the layer spec (truncated),
    folded weights (``fold_batchnorm`` / ``quantize_folded`` / an exported
    artifact), and the offline frontend. ``mode``: 'f32'/'int8' (weight
    dequant, f32 math) or 'int8_full' (int8 MXU convs — requires quantized
    weights). Batch size must divide by the mesh size.
    """

    def __init__(self, layers, folded, frontend, mesh=None,
                 mode: str = 'f32', padding_mode: str = 'reflect',
                 act_scales=None):
        import jax

        from .infer import offline_forward, offline_forward_q8

        self.mesh = mesh if mesh is not None else make_mesh()
        self.frontend = frontend
        self._batch_sharding = batch_sharding(self.mesh)
        self._repl = replicated_sharding(self.mesh)
        layers = [dict(l) for l in layers]
        if mode == 'int8_full':
            if len(folded[0]) != 3:
                raise ValueError("mode='int8_full' needs quantized weights")

            def fwd(ls, w, f, fl, padding_mode):
                return offline_forward_q8(ls, w, f, fl,
                                          padding_mode=padding_mode,
                                          act_scales=act_scales)
        elif mode in ('f32', 'int8'):
            fwd = offline_forward
        else:
            raise ValueError(f'unknown mode: {mode!r}')
        self._weights = jax.device_put(
            [tuple(a for a in wb) for wb in folded], self._repl)

        def pipeline(weights, audio, lengths):
            feats, flens = frontend(audio, lengths)
            return fwd(layers, weights, feats, flens,
                       padding_mode=padding_mode)

        self._fn = jax.jit(pipeline)

    def logprobs(self, audio, lengths):
        """audio [B, T_samples] (B divisible by the mesh size), lengths [B]
        -> (log_probs/probs [B, T', L], out_lengths [B]) as numpy."""
        import jax
        n = self.mesh.shape['data']
        audio = np.asarray(audio, np.float32)
        if audio.shape[0] % n:
            raise ValueError(f'batch {audio.shape[0]} must be divisible by '
                             f'the mesh size {n}')
        d_audio = jax.device_put(audio, self._batch_sharding)
        d_lens = jax.device_put(np.asarray(lengths, np.int32),
                                self._batch_sharding)
        logp, out_lens = self._fn(self._weights, d_audio, d_lens)
        return np.asarray(logp), np.asarray(out_lens)

    def transcribe(self, audio, lengths, decoder):
        """Greedy-decode a batch; returns the list of strings."""
        logp, out_lens = self.logprobs(audio, lengths)
        return decoder.decode(logp, sizes=out_lens)
