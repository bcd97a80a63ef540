"""Stream multiplexer: batch many live audio streams into one session.

One chip serves thousands of concurrent real-time streams only if their
chunks are batched (benchmarks/serving_latency.json: a 16-stream step
costs barely more than a 1-stream step). ``StreamMultiplexer`` owns a
single batched streaming state with a fixed number of SLOTS; streams
attach to a free slot, feed audio, and detach with a final transcript —
all slot rows advance in one compiled step per tick.

The trick making dynamic attach/detach cheap is that every piece of
streaming state carries the batch as its leading axis and rows never
interact: a newly attached stream runs the single-row prime program and
its state rows are scattered into the batched state; a detaching stream's
rows are sliced out and flushed through the single-row finish program.
Idle slots keep stepping over silence — harmless, their output is
discarded, and the next attach overwrites their state rows.

Contract: this is the transport layer for REAL-TIME streams — by each
``tick()`` every attached-and-primed stream must have one chunk of audio
buffered (live microphones produce exactly chunk rate). Greedy incremental
transcription is built in; for beam/custom decoding drive a dedicated
``StreamingSession`` instead.
"""

from __future__ import annotations

import numpy as np


class StreamMultiplexer:
    """Multiplex up to ``slots`` live streams through one batched session.

    ``model``: a ``StreamingWav2Letter`` / ``StreamingJasper`` instance.

    ``mesh``: optional ``jax.sharding.Mesh`` — shards the slot axis of the
    batched state (and each tick's chunk batch) across the mesh's devices.
    Slot rows never interact, so the partitioned step contains ZERO
    collectives: N chips serve N× the concurrent streams of one chip at
    the same per-tick latency (weights are replicated once at
    construction). Transcripts are bit-identical to the unsharded
    multiplexer (tested on the CPU mesh).
    """

    def __init__(self, model, slots: int = 16, labels=None, mesh=None):
        import jax
        import jax.numpy as jnp
        if labels is None:
            raise ValueError('labels are required (greedy transcription is '
                             'the multiplexer output; for custom decoding '
                             'use StreamingSession directly)')
        self.m = model
        self.slots = slots
        self.labels = list(labels)
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            n = int(np.prod(list(mesh.devices.shape)))
            if slots % n:
                raise ValueError(f'slots ({slots}) must be divisible by '
                                 f'the mesh size ({n})')
            # Leading (slot) dim sharded jointly over every mesh axis;
            # all other dims replicated.
            self._row_shard = NamedSharding(
                mesh, PartitionSpec(tuple(mesh.axis_names)))
            rep = NamedSharding(mesh, PartitionSpec())
            # Replicate the weights across the mesh once — the model
            # committed them to its default device, and mixed placements
            # would force a copy every tick.
            self._weights = jax.device_put(model._weights_dev, rep)
        else:
            self._row_shard = None
            self._weights = model._weights_dev
        # Bootstrap a valid batched state: tile a single-row silence prime
        # (feed() compiles/needs the batch-1 prime anyway — no extra
        # batch=slots prime compilation).
        silence = np.zeros((1, model.prime_samples), np.float32)
        row, _ = model._prime_fn(self._weights, silence)
        self._state = jax.tree_util.tree_map(
            lambda s: jnp.repeat(s, slots, axis=0), row)
        if self._row_shard is not None:
            self._state = jax.device_put(self._state, self._row_shard)
        self._buf = [np.zeros(0, np.float32)] * slots
        self._active = [False] * slots
        self._primed = [False] * slots
        self._consumed = [0] * slots
        self._last = [0] * slots
        self._text = [''] * slots

    # ------------------------------------------------------------------

    def attach(self) -> int:
        """Claim a free slot for a new stream. Raises when full."""
        for s in range(self.slots):
            if not self._active[s]:
                self._active[s] = True
                self._primed[s] = False
                self._buf[s] = np.zeros(0, np.float32)
                self._consumed[s] = 0
                self._last[s] = 0
                self._text[s] = ''
                return s
        raise RuntimeError(f'all {self.slots} slots busy')

    def feed(self, slot: int, audio) -> None:
        """Buffer audio for ``slot``; primes the slot once enough has
        arrived (scattering fresh state rows into the batch)."""
        if not self._active[slot]:
            raise ValueError(f'slot {slot} is not attached')
        self._buf[slot] = np.concatenate(
            [self._buf[slot], np.asarray(audio, np.float32).ravel()])
        if (not self._primed[slot]
                and len(self._buf[slot]) >= self.m.prime_samples):
            chunk = self._buf[slot][:self.m.prime_samples][None]
            self._buf[slot] = self._buf[slot][self.m.prime_samples:]
            row_state, logp = self.m._prime_fn(self._weights, chunk)
            self._state = self._scatter_fn(self._state, row_state,
                                           np.int32(slot))
            self._consumed[slot] = self.m.prime_samples
            self._primed[slot] = True
            self._decode(slot, np.asarray(logp)[0])

    def tick(self):
        """Advance every primed stream by one chunk in a single batched
        step. Returns {slot: new_text} for primed streams."""
        cs = self.m.chunk_samples
        stepped = [s for s in range(self.slots)
                   if self._active[s] and self._primed[s]]
        if not stepped:
            return {}
        for s in stepped:
            if len(self._buf[s]) < cs:
                raise RuntimeError(
                    f'slot {s} starved: {len(self._buf[s])} < {cs} '
                    'samples buffered at tick (real-time contract)')
        return self._step(stepped)

    def tick_ready(self):
        """Advance only the primed streams holding a full buffered chunk.

        The jitter-tolerant variant of :meth:`tick` for network transports
        (serving/net.py): a lagging client simply doesn't advance this
        round instead of poisoning the whole batch. Costs one extra fused
        select over the state (rows of skipped slots keep their old
        values); rows never interact, so skipped slots are bit-identical
        to not having stepped at all.
        """
        cs = self.m.chunk_samples
        stepped = [s for s in range(self.slots)
                   if self._active[s] and self._primed[s]
                   and len(self._buf[s]) >= cs]
        if not stepped:
            return {}
        return self._step(stepped)

    def _step(self, stepped):
        import jax
        cs = self.m.chunk_samples
        chunks = np.zeros((self.slots, cs), np.float32)
        for s in stepped:
            chunks[s] = self._buf[s][:cs]
            self._buf[s] = self._buf[s][cs:]
            self._consumed[s] += cs
        if self._row_shard is not None:
            chunks = jax.device_put(chunks, self._row_shard)
        new_state, logp = self.m._step_fn(self._weights,
                                          self._state, chunks)
        if len(stepped) < self.slots:
            mask = np.zeros(self.slots, bool)
            mask[stepped] = True
            self._state = self._select_fn(mask, new_state, self._state)
        else:
            self._state = new_state
        logp = np.asarray(logp)
        return {s: self._decode(s, logp[s]) for s in stepped}

    @property
    def _select_fn(self):
        """Jitted per-row select: keep old state rows where mask is False."""
        import jax
        import jax.numpy as jnp
        if not hasattr(self, '_select_fn_cached'):
            def sel(mask, new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    new, old)
            self._select_fn_cached = jax.jit(
                sel, out_shardings=self._row_shard)
        return self._select_fn_cached

    @property
    def _scatter_fn(self):
        """Jitted prime-row scatter into the batched state (slot index is
        a traced arg — one compile covers every slot; ``out_shardings``
        keeps the state slot-sharded in mesh mode)."""
        import jax

        if not hasattr(self, '_scatter_fn_cached'):
            def scatter(S, row, slot):
                return jax.tree_util.tree_map(
                    lambda s, r: jax.lax.dynamic_update_index_in_dim(
                        s, r[0].astype(s.dtype), slot, 0), S, row)
            self._scatter_fn_cached = jax.jit(
                scatter, out_shardings=self._row_shard)
        return self._scatter_fn_cached

    def detach(self, slot: int, total_samples: int | None = None) -> str:
        """Flush ``slot`` through the single-row finish program and free
        it; returns the final transcript."""
        import jax
        if not self._active[slot]:
            raise ValueError(f'slot {slot} is not attached')
        if not self._primed[slot]:
            raise ValueError('detach before prime: stream shorter than the '
                             'prime window; use the offline path')
        tail = self._buf[slot]
        if len(tail) > self.m.chunk_samples:
            raise ValueError(f'slot {slot} has {len(tail)} samples pending '
                             '(> one chunk); tick() until pending() < '
                             'chunk_samples before detaching')
        if total_samples is None:
            total_samples = self._consumed[slot] + len(tail)
        tail_len = total_samples - self._consumed[slot]
        if not 0 <= tail_len <= self.m.chunk_samples:
            raise ValueError('stream end must fall within the final '
                             'partial chunk')
        padded = np.zeros((1, self.m.chunk_samples), np.float32)
        padded[0, :len(tail)] = tail
        row_state = jax.tree_util.tree_map(lambda S: S[slot:slot + 1],
                                           self._state)
        logp, valid = self.m._finish_fn(
            self._weights, row_state, padded,
            np.array([tail_len], np.int32))
        self._decode(slot, np.asarray(logp)[0, :int(np.asarray(valid)[0])])
        text = self._text[slot]
        self._active[slot] = False
        return text

    def abort(self, slot: int) -> None:
        """Free ``slot`` without flushing (client vanished / stream too
        short to prime). Safe in every slot state: the next attach resets
        all host bookkeeping and prime overwrites the state rows."""
        self._active[slot] = False

    def text(self, slot: int) -> str:
        return self._text[slot]

    def pending(self, slot: int) -> int:
        """Samples buffered but not yet dispatched for ``slot`` (detach
        requires this to be below one chunk)."""
        return len(self._buf[slot])

    # ------------------------------------------------------------------

    def _decode(self, slot: int, logp) -> str:
        """Incremental greedy collapse (repeat state carried per slot)."""
        from .streaming import greedy_collapse
        if logp.shape[0] == 0:
            return ''
        ids = np.argmax(logp, axis=-1)
        out, _, self._last[slot] = greedy_collapse(ids, self._last[slot])
        fresh = ''.join(self.labels[i] for i in out)
        self._text[slot] += fresh
        return fresh
