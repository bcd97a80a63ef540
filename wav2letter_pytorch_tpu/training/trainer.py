"""Explicit TPU training loop: jitted SPMD train step over a device mesh.

Replaces PyTorch Lightning's ``Trainer.fit`` (/root/reference/train.py:34-37)
and the LightningModule train/val steps (/root/reference/
base_asr_models.py:78-94) with a small explicit loop designed for XLA:

* one jitted ``train_step`` fuses the on-device feature frontend, the conv
  stack, CTC loss, and the optimizer update; inputs are batch-sharded over a
  1-D ``data`` mesh and parameters replicated, so the SPMD partitioner
  inserts the gradient all-reduce over ICI (no NCCL, no DDP wrapper);
* training state (params / batch_stats / opt state / rng / step) is donated
  each step — no host round-trip on the hot path;
* string metrics (WER/CER) need host decoding, so logits are pulled off
  device only every ``string_metrics_interval`` steps (the reference
  greedy-decodes every batch on host, stalling the accelerator —
  base_asr_models.py:83);
* per-sample CTC losses are masked so shape-padding rows of the static
  batch contribute nothing (reference semantics: 'mean' = loss/target_len
  averaged over real samples);
* checkpoints (full state) every N epochs with keep-last-k retention +
  resume — parity with Lightning's default checkpointing (SURVEY.md §5).

Conscious fixes vs the reference, documented here:
* validation CTC loss is always computed from log-probabilities; the
  reference feeds Jasper's eval-mode *softmax* outputs straight into
  CTCLoss, silently corrupting val_loss (jasper.py:470-473 +
  base_asr_models.py:90);
* feature dithering is disabled during validation for determinism (the
  reference dithers unconditionally, data_loader.py:65-68).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..decoding import GreedyDecoder
from ..models import Jasper
from ..ops.ctc import ctc_loss
from ..utils.runtime import host_rss_mb
from ..parallel import (make_mesh, replicated_sharding, shard_batch,
                        state_shardings)
from .logging import MetricLogger
from .metrics import RatioAccumulator, string_metrics


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def masked_ctc_mean(log_probs, out_lens, targets, target_lengths, batch_mask,
                    ctc_impl=ctc_loss):
    """torch 'mean' reduction restricted to real (unmasked) rows."""
    per = ctc_impl(log_probs, out_lens, targets, target_lengths,
                   reduction='none')
    tl = jnp.maximum(target_lengths, 1).astype(jnp.float32)
    weighted = per / tl * batch_mask
    return jnp.sum(weighted) / jnp.maximum(jnp.sum(batch_mask), 1.0)


class Trainer:
    def __init__(self, cfg, model, frontend, optimizer, schedule, decoder,
                 run_dir: str | None = None):
        self.cfg = cfg
        self.model = model
        self.frontend = frontend
        self.schedule = schedule
        self.decoder = decoder
        tcfg = cfg['trainer']
        # Lightning-Trainer-parity knobs the reference reaches through
        # Trainer(**cfg.trainer): gradient clipping and accumulation.
        clip = tcfg.get('gradient_clip_val')
        if clip:
            optimizer = optax.chain(optax.clip_by_global_norm(float(clip)),
                                    optimizer)
        accum = int(tcfg.get('accumulate_grad_batches', 1) or 1)
        if accum > 1:
            optimizer = optax.MultiSteps(optimizer, every_k_schedule=accum)
        self.optimizer = optimizer
        self.max_epochs = int(tcfg.get('max_epochs', 5))
        self.max_steps = tcfg.get('max_steps')
        self.seed = int(tcfg.get('seed', 0))
        self.log_every = int(tcfg.get('log_every_n_steps', 10))
        self.metrics_interval = int(tcfg.get('string_metrics_interval', 1))
        self.val_every = int(tcfg.get('val_every_n_epochs', 1) or 1)
        # N training steps per compiled dispatch (device-side lax.scan over
        # a step-stacked batch group): amortizes runtime dispatch overhead.
        self.steps_per_dispatch = int(tcfg.get('steps_per_dispatch', 1) or 1)
        self.profile_dir = tcfg.get('profile_dir')
        self.print_decoded_prob = float(
            cfg['model'].get('print_decoded_prob', 0) or 0)
        self.run_dir = run_dir or tcfg.get('default_root_dir', '.')
        mesh_cfg = tcfg.get('mesh', {}) or {}
        # mesh.model > 1 adds a tensor-parallel axis: conv weights (and the
        # optimizer state mirroring them) shard their channel dim across it
        # (parallel/tp.py); the train step itself is topology-agnostic.
        # mesh.seq > 1 adds a sequence-parallel axis: activation TIME dims
        # shard across it (with_sharding_constraint below) and the GSPMD
        # partitioner turns every conv into shard-local compute + halo
        # collective-permutes — per-chip activation memory scales 1/seq for
        # long utterances. Logits reshard to data-only before CTC (whose
        # alpha/beta recursion is time-sequential).
        self.mesh = make_mesh(int(mesh_cfg.get('data', -1)),
                              model=int(mesh_cfg.get('model', 1) or 1),
                              seq=int(mesh_cfg.get('seq', 1) or 1))
        self._seq_shard = 'seq' in self.mesh.axis_names
        self.logger = MetricLogger(self.run_dir)
        self._ckpt = None
        ck = tcfg.get('checkpoint', {}) or {}
        self.ckpt_every = int(ck.get('every_n_epochs', 1))
        self.ckpt_keep = int(ck.get('keep_last', 3))
        self.state: TrainState | None = None
        self._jitted = {}
        # CTC implementation: 'auto' picks the Pallas kernels on TPU (16x
        # faster than the scan at B=16/T=400) and the lax.scan reference
        # elsewhere; 'scan'/'pallas' force one.
        impl = tcfg.get('ctc_impl', 'auto') or 'auto'
        if impl == 'auto':
            impl = 'pallas' if jax.default_backend() == 'tpu' else 'scan'
        if impl == 'pallas':
            from ..ops.ctc_pallas import ctc_loss_pallas
            self.ctc_impl = ctc_loss_pallas
        else:
            self.ctc_impl = ctc_loss
        from ..data.augmentations import build_augment_fn
        self.augment_fn = build_augment_fn(
            (cfg.get('data') or {}).get('augment'))
        # Jasper emits probabilities in eval mode (reference jasper.py:473).
        self.eval_emits_probs = isinstance(model, Jasper)
        # Greedy decoding only needs the argmax — run it on device so the
        # per-step metrics transfer is [B, T] ints, not [B, T, L] floats.
        self.greedy_metrics = type(decoder) is GreedyDecoder

    # ----------------------------------------------------------------- init
    def init_state(self, example_batch) -> TrainState:
        # 'rbg' halves RNG cost on TPU vs threefry (dither + every dropout
        # layer draws random bits each step). Raw keys carry no impl tag, so
        # the global default must match at resume time (it is config-pinned).
        impl = self.cfg['trainer'].get('prng_impl', 'rbg') or 'rbg'
        jax.config.update('jax_default_prng_impl', impl)
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        feats, flens = self.frontend(example_batch['audio'][:1],
                                     example_batch['audio_lengths'][:1])
        variables = jax.jit(partial(self.model.init, train=False))(
            init_rng, feats, flens)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.optimizer.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state,
                           rng=rng)
        # Channel-sharded over the 'model' axis when present; all-replicated
        # (the old behavior, bit-for-bit) on a pure data mesh.
        self._state_sh = state_shardings(state, self.mesh)
        self.state = jax.device_put(state, self._state_sh)
        from ..utils import model_summary
        print(f'{type(self.model).__name__} parameters:')
        print(model_summary(params))
        return self.state

    # ---------------------------------------------------------------- steps
    def _train_step(self, state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        rng_dither, rng_aug, rng_dropout = jax.random.split(rng, 3)
        feats, flens = self.frontend(batch['audio'], batch['audio_lengths'],
                                     rng=rng_dither)
        if self.augment_fn is not None:
            feats = self.augment_fn(rng_aug, feats)
        feats = self._seq_constraint(feats, sharded=True)

        def loss_fn(params):
            (out, out_lens), mutated = self.model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                feats, flens, train=True, rngs={'dropout': rng_dropout},
                mutable=['batch_stats'])
            out = self._seq_constraint(out, sharded=False)
            loss = masked_ctc_mean(out, out_lens, batch['targets'],
                                   batch['target_lengths'],
                                   batch['batch_mask'], self.ctc_impl)
            return loss, (mutated.get('batch_stats', {}), out, out_lens)

        (loss, (new_stats, out, out_lens)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               rng=state.rng)
        if self.greedy_metrics:
            out = jnp.argmax(out, axis=-1).astype(jnp.int32)
        return new_state, loss, out, out_lens

    def _seq_constraint(self, x, sharded: bool):
        """Sequence-parallel sharding constraint on an activation's time
        dim (``sharded=True``: [B, T, ...] shards T over 'seq';
        ``sharded=False``: reshard to data-only, e.g. before the
        time-sequential CTC recursion). No-op on meshes without a seq
        axis — the annotation-free graph is byte-identical to before."""
        if not self._seq_shard:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P('data', 'seq') if sharded else P('data')
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _eval_step(self, state: TrainState, batch):
        feats, flens = self.frontend(batch['audio'], batch['audio_lengths'])
        feats = self._seq_constraint(feats, sharded=True)
        out, out_lens = self.model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            feats, flens, train=False)
        out = self._seq_constraint(out, sharded=False)
        log_probs = jnp.log(jnp.clip(out, 1e-30)) if self.eval_emits_probs \
            else out
        loss = masked_ctc_mean(log_probs, out_lens, batch['targets'],
                               batch['target_lengths'], batch['batch_mask'],
                               self.ctc_impl)
        if self.greedy_metrics:
            # On-device argmax: [B, T] int transfer instead of [B, T, L]
            # floats per validation batch.
            out = jnp.argmax(out, axis=-1).astype(jnp.int32)
        return loss, out, out_lens

    def _multi_step(self, state: TrainState, batches):
        """N training steps in ONE compiled program (lax.scan over a
        step-stacked batch group [N, B, ...]) — amortizes the per-dispatch
        runtime overhead (~1.1 ms through the device tunnel) and lets XLA
        overlap host dispatch with device compute. Same math as N calls to
        ``_train_step`` (the per-step RNG folds in ``state.step``)."""
        def body(s, b):
            s, loss, out, out_lens = self._train_step(s, b)
            return s, (loss, out, out_lens)
        state, (losses, outs, out_lens) = jax.lax.scan(body, state, batches)
        return state, losses, outs, out_lens

    def _get_jitted(self, name):
        if name not in self._jitted:
            repl = replicated_sharding(self.mesh)
            # New state keeps the (possibly model-sharded) layout of the
            # donated input state; loss/logits/lengths are replicated.
            state_sh = getattr(self, '_state_sh', repl)
            if name == 'train':
                self._jitted[name] = jax.jit(
                    self._train_step, donate_argnums=(0,),
                    out_shardings=(state_sh, repl, repl, repl))
            elif name == 'train_multi':
                self._jitted[name] = jax.jit(
                    self._multi_step, donate_argnums=(0,),
                    out_shardings=(state_sh, repl, repl, repl))
            else:
                self._jitted[name] = jax.jit(self._eval_step)
        return self._jitted[name]

    # ------------------------------------------------------------------ fit
    def fit(self, train_loader, val_loader=None, resume: bool = False):
        import os
        from .checkpoint import Checkpointer
        ck_cfg = self.cfg['trainer'].get('checkpoint', {}) or {}
        self._ckpt = Checkpointer(f'{self.run_dir}/checkpoints',
                                  keep_last=self.ckpt_keep,
                                  monitor=ck_cfg.get('monitor'),
                                  mode=ck_cfg.get('mode', 'min'))
        # Persist the composed config so offline evaluation (test.py) can
        # rebuild the exact model from --model-path alone.
        if hasattr(self.cfg, 'pretty'):
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, 'config.yaml'), 'w') as f:
                f.write(self.cfg.pretty())
        if self.state is None:
            # peek_batch builds the init example from loader metadata
            # without bumping the epoch counter or leaking a prefetch
            # thread (a bare `for batch in loader: break` does both).
            peek = getattr(train_loader, 'peek_batch', None)
            first = peek() if peek is not None else next(
                iter(train_loader), None)
            if first is None:
                raise ValueError('empty training loader')
            self.init_state(first)
        start_epoch = 0
        resume_skip = 0
        if resume and self._ckpt.latest_step() is not None:
            self.state = self._ckpt.restore(self.state)
            print(f'Resumed from step {int(self.state.step)}')
            # Resume into the epoch persisted WITH the checkpoint, so a
            # resumed run finishes the ORIGINAL max_epochs budget and
            # replays the correct per-epoch shuffle orders even if the
            # manifest (and hence len(train_loader)) changed between runs.
            extra = self._ckpt.load_extra()
            if 'epoch' in extra:
                start_epoch = int(extra['epoch'])
                if extra.get('preempted'):
                    # Mid-epoch checkpoint: replay the interrupted epoch's
                    # shuffle but fast-forward past the batches whose
                    # updates are already in the restored optimizer state,
                    # so every batch is applied exactly once across the
                    # preemption.
                    resume_skip = int(extra.get('epoch_step', 0))
            else:
                # Pre-metadata checkpoint: fall back to deriving the epoch
                # from the restored step and the CURRENT loader length.
                try:
                    steps_per_epoch = len(train_loader)
                except TypeError:
                    steps_per_epoch = 0
                if steps_per_epoch:
                    start_epoch = int(self.state.step) // steps_per_epoch
            if hasattr(train_loader, 'epoch'):
                train_loader.epoch = start_epoch

        step = int(self.state.step)
        # Preemption safety: TPU pools reclaim VMs with a SIGTERM + grace
        # window. Install a handler that requests a graceful stop; the
        # dispatch loop below saves a resumable checkpoint and returns
        # instead of dying mid-epoch. (The reference relies on Lightning's
        # per-epoch checkpoint only — a preempted epoch loses its work.)
        import signal
        self._preempt_requested = False
        self.stopped_reason = None
        # Host-RSS budget: when this process's resident set crosses the
        # budget, request the SAME graceful stop as a preemption signal
        # (mid-epoch checkpoint, exact --resume replay, multi-host agreed
        # stop). Needed because some device transports retain a host copy
        # of every uploaded buffer for the life of the process (utils/
        # runtime.py::host_rss_mb) — a fresh --resume process reclaims it.
        rss_budget_gb = self.cfg['trainer'].get('host_rss_budget_gb')
        self._rss_budget_mb = float(rss_budget_gb or 0) * 1024.0
        sig_name = self.cfg['trainer'].get('preempt_signal', 'SIGTERM')
        prev_handler = None
        sig = getattr(signal, str(sig_name), None) if sig_name else None
        if sig is not None:
            def _on_preempt(signum, frame):
                self._preempt_requested = True
                print(f'{sig_name} received: checkpointing at the next '
                      'step boundary', flush=True)
            try:
                prev_handler = signal.signal(sig, _on_preempt)
            except ValueError:       # not the main thread (e.g. tests)
                sig = None
        # Multi-host: the stop decision must be AGREED across hosts — a
        # lone host breaking its dispatch loop leaves the others blocked
        # in collectives (the hang preemption handling exists to avoid).
        # Hosts allgather their local flag at identical dispatch indices
        # (loaders are lockstep by construction) every
        # `preempt_sync_every` dispatches, so everyone stops at the same
        # step boundary and saves the same checkpoint.
        n_proc = jax.process_count()
        if n_proc > 1 and sig is not None:
            preempt_sync = max(int(self.cfg['trainer'].get(
                'preempt_sync_every', 25) or 25), 1)
            from jax.experimental import multihost_utils

            def _preempt_agreed(i):
                if i % preempt_sync:
                    return False
                return bool(multihost_utils.process_allgather(
                    np.asarray(self._preempt_requested)).any())
        else:
            def _preempt_agreed(i):
                return self._preempt_requested
        # Throughput bookkeeping starts after the first executed step so
        # `utterances_per_sec` reflects steady state, not XLA compile time
        # (bench.py methodology).
        t0 = None
        utts = 0
        from ..utils.runtime import profiler_trace
        profile_scope = profiler_trace(self.profile_dir)
        profile_scope.__enter__()
        n_sd = max(self.steps_per_dispatch, 1)

        def _with_device_batches(loader):
            # Yields ([host batches], device batch group, is_multi) with a
            # one-group lookahead so the next group's host->device transfer
            # overlaps the current dispatch's execution. Groups of n_sd
            # batches are step-stacked to [N, B, ...] for the scan-based
            # multi-step program. Bucketed loaders interleave batches of
            # different static shapes, and a step-stacked group must be
            # homogeneous — so grouping is per shape-signature (slightly
            # reordering an already-shuffled epoch); remainders fall back
            # to single steps (one extra compile per shape, same math).
            pending = None
            groups: dict = {}

            def sig(b):
                return tuple((k, v.shape) for k, v in sorted(b.items())
                             if isinstance(v, np.ndarray))

            def emit(group):
                if n_sd == 1 or len(group) == 1:
                    return (group, shard_batch(
                        {k: v for k, v in group[0].items()
                         if isinstance(v, np.ndarray)}, self.mesh), False)
                stacked = {k: np.stack([g[k] for g in group])
                           for k, v in group[0].items()
                           if isinstance(v, np.ndarray)}
                return (group, shard_batch(stacked, self.mesh,
                                           batch_dim=1), True)

            for batch in loader:
                group = groups.setdefault(sig(batch), [])
                group.append(batch)
                if len(group) < n_sd:
                    continue
                item = emit(groups.pop(sig(batch)))
                if pending is not None:
                    yield pending
                pending = item
            for _, group in sorted(groups.items()):  # per-shape remainders
                for batch in group:
                    db = shard_batch({k: v for k, v in batch.items()
                                      if isinstance(v, np.ndarray)},
                                     self.mesh)
                    if pending is not None:
                        yield pending
                    pending = ([batch], db, False)
            if pending is not None:
                yield pending

        # Device-resident dataset cache (trainer.device_cache): upload the
        # whole bucketed/padded corpus to HBM ONCE, then train every epoch
        # from the cached device batches — the host input pipeline (FLAC
        # decode, bucketing, padding, host->device transfer) leaves the
        # steady-state loop entirely. Sized for corpora that fit HBM next
        # to the training state (3k utts at int16 ≈ 0.4 GiB). Two
        # semantic trades: (a) batch COMPOSITION freezes at the loader's
        # epoch-0 shuffle — only batch ORDER reshuffles per epoch
        # (SpecAugment/dither/dropout stay fresh: they run inside the
        # jitted step keyed on the step counter); (b) on transports that
        # retain a host copy of every uploaded buffer (the reason
        # trainer.host_rss_budget_gb exists), RSS stays flat after the
        # build pass instead of growing every epoch. Resume stays exact:
        # the build pass pins the loader to its deterministic epoch-0
        # order and per-epoch batch order is a seeded permutation — both
        # reproducible in a fresh --resume process, so the mid-epoch
        # replay skip realigns exactly as in the uncached path.
        device_cache_on = bool(self.cfg['trainer'].get('device_cache',
                                                       False))
        device_cache: list = []
        if device_cache_on:
            if hasattr(train_loader, 'epoch'):
                train_loader.epoch = 0
            for g_batches, g_db, g_im in _with_device_batches(train_loader):
                light = [{'texts': b.get('texts', ()),
                          'batch_mask': b['batch_mask']}
                         for b in g_batches]
                device_cache.append((light, g_db, g_im))
        cache_seed = int(getattr(train_loader, 'seed', 0) or 0)

        def _epoch_batches(epoch):
            if not device_cache_on:
                return _with_device_batches(train_loader)
            order = np.random.default_rng(
                np.random.SeedSequence([cache_seed, epoch])).permutation(
                    len(device_cache))
            return (device_cache[i] for i in order)

        # String metrics: per-step argmax ids stay ON DEVICE and are
        # fetched in one batched sync every `metrics_flush` steps — exact
        # per-batch WER/CER (the reference decodes every batch,
        # base_asr_models.py:83) at a fraction of the host-sync cost
        # (each sync through the device tunnel costs ~30 ms).
        pending_metrics = []
        metrics_flush = max(int(
            self.cfg['trainer'].get('string_metrics_flush', 8) or 8), 1)
        dispatch_i = 0
        preempt_stop = False

        def _flush_metrics():
            if not pending_metrics:
                return
            items = list(pending_metrics)
            pending_metrics.clear()
            fetched = jax.device_get([(it[1], it[2]) for it in items])
            for (sel, _, _), (m_out, m_lens) in zip(items, fetched):
                for m_step, i, m_texts, m_mask in sel:
                    self.logger.log(m_step, string_metrics(
                        self.decoder,
                        m_out if i is None else m_out[i],
                        m_lens if i is None else m_lens[i],
                        m_texts, 'train', batch_mask=m_mask,
                        print_decoded_prob=self.print_decoded_prob))

        for epoch in range(start_epoch, self.max_epochs):
            epoch_start_step = step - (resume_skip if epoch == start_epoch
                                       else 0)
            skip = resume_skip if epoch == start_epoch else 0
            for batches, device_batch, is_multi in _epoch_batches(epoch):
                if skip > 0:
                    # Replaying a preempted epoch: the dispatch grouping is
                    # deterministic for a given (seeded) shuffle order, so
                    # discarding whole groups up to the checkpointed
                    # epoch_step realigns exactly with the original run.
                    skip -= len(batches)
                    continue
                if self.max_steps is not None and step >= int(self.max_steps):
                    # (a multi-step dispatch may overshoot max_steps by up
                    # to steps_per_dispatch - 1; the check is per dispatch)
                    break
                kind = 'train_multi' if is_multi else 'train'
                self.state, losses, out, out_lens = self._get_jitted(kind)(
                    self.state, device_batch)
                if t0 is None:
                    # First dispatch just compiled; start the clock after a
                    # scalar fetch (block_until_ready does not block through
                    # the device tunnel) so the logged rate is steady-state.
                    float(losses[-1] if is_multi else losses)
                    t0 = time.time()
                else:
                    utts += sum(int(b['batch_mask'].sum()) for b in batches)
                _flush_metrics()
                sel = []
                for i, batch in enumerate(batches):
                    sub_step = step + i + 1
                    if self.metrics_interval and \
                            sub_step % self.metrics_interval == 0:
                        sel.append((sub_step, i if is_multi else None,
                                    batch['texts'], batch['batch_mask']))
                    if sub_step % self.log_every == 0 or sub_step == 1:
                        loss_value = float(losses[i] if is_multi else losses)
                        if not np.isfinite(loss_value):
                            # Reference parity: Jasper asserts on NaN outputs
                            # (jasper.py:474); we fail fast at the loss level.
                            raise FloatingPointError(
                                f'non-finite training loss at step '
                                f'{sub_step}: {loss_value}')
                        logs = {'train_loss': loss_value,
                                'learning_rate':
                                    float(self.schedule(sub_step - 1))}
                        if utts:
                            logs['utterances_per_sec'] = (
                                utts / max(time.time() - t0, 1e-9))
                        self.logger.log(sub_step, logs)
                step += len(batches)
                if sel:
                    pending_metrics.append((sel, out, out_lens))
                    if len(pending_metrics) >= metrics_flush:
                        _flush_metrics()
                dispatch_i += 1
                if (self._rss_budget_mb and not self._preempt_requested
                        and host_rss_mb() > self._rss_budget_mb):
                    self._preempt_requested = True
                    self.stopped_reason = 'rss_budget'
                    print(f'host RSS over budget '
                          f'({self._rss_budget_mb / 1024:.1f} GiB): '
                          'checkpointing at the next agreed step boundary',
                          flush=True)
                if _preempt_agreed(dispatch_i):
                    preempt_stop = True
                    self.stopped_reason = self.stopped_reason or 'signal'
                    break
            _flush_metrics()
            if preempt_stop:
                # Mid-epoch save: resume re-enters this epoch's shuffle
                # (extra['epoch'] = epoch) and skips the epoch_step batches
                # already applied, preserving exact epoch-schedule
                # semantics with no double-applied updates. (Skip if this
                # exact step was already checkpointed.)
                if step not in self._ckpt.all_steps():
                    self._ckpt.save(step, jax.device_get(self.state),
                                    extra={'epoch': epoch,
                                           'epoch_step':
                                               step - epoch_start_step,
                                           'preempted': True})
                print(f'preempted: checkpoint saved at step {step}; '
                      f'epoch {epoch} replays on --resume', flush=True)
                break
            val = None
            if val_loader is not None and (epoch + 1) % self.val_every == 0:
                val = self.validate(val_loader)
                self.logger.log(step, val)
                print(f'epoch {epoch}: ' + ' '.join(
                    f'{k}={v:.4f}' for k, v in val.items()))
            if (epoch + 1) % self.ckpt_every == 0:
                self._ckpt.save(step, jax.device_get(self.state),
                                metrics=val, extra={'epoch': epoch + 1})
            if self.max_steps is not None and step >= int(self.max_steps):
                break
        if sig is not None and prev_handler is not None:
            signal.signal(sig, prev_handler)
        profile_scope.__exit__(None, None, None)
        return self.state

    # ------------------------------------------------------------- validate
    def validate(self, val_loader) -> dict:
        eval_step = self._get_jitted('eval')
        acc = RatioAccumulator()
        losses = []
        for batch in val_loader:
            device_batch = shard_batch(
                {k: v for k, v in batch.items()
                 if isinstance(v, np.ndarray)}, self.mesh)
            loss, out, out_lens = eval_step(self.state, device_batch)
            losses.append(float(loss))
            out = np.asarray(out)
            sizes = np.asarray(out_lens)
            decoded = (self.decoder.decode_ids(out, sizes) if out.ndim == 2
                       else self.decoder.decode(out, sizes))
            for j, expected in enumerate(batch['texts']):
                if not batch['batch_mask'][j]:
                    continue
                c, cd = self.decoder.cer_ratio(expected, decoded[j])
                w, wd = self.decoder.wer_ratio(expected, decoded[j])
                acc.add('val_cer', c, cd)
                acc.add('val_wer', w, wd)
                acc.add('val_len_ratio', len(decoded[j]), len(expected))
        out = {'val_loss': float(np.mean(losses)) if losses else 0.0}
        out.update(acc.ratios())
        return out
