"""Checkpoint save/restore with retention (orbax-backed).

The reference delegates checkpointing entirely to Lightning defaults
(SURVEY.md §5: ``lightning_logs/version_*/checkpoints/*.ckpt`` per epoch,
no explicit code). Here checkpoints hold the full training state —
params, batch_stats, optimizer state, step — with keep-last-k retention
and resume.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


class Checkpointer:
    # Retention: keep the last `keep_last` checkpoints, or, when `monitor`
    # is set (e.g. 'val_loss'), the best `keep_last` by that metric
    # (Lightning-style best-k).
    def __init__(self, directory: str, keep_last: int = 3,
                 monitor: str | None = None, mode: str = 'min'):
        # A save that lacks the monitored metric must never rank: the worst
        # possible score (not 0.0, which under mode='min' would beat every
        # real val_loss and evict the genuinely-best checkpoints) — and
        # save() additionally registers no metrics at all for such saves, so
        # orbax treats them as metric-less (kept outside best-k ranking).
        sentinel = float('inf') if mode == 'min' else float('-inf')
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_last, create=True,
            best_fn=(lambda m: m.get(monitor, sentinel)) if monitor else None,
            best_mode=mode if monitor else 'max')
        self._monitor = monitor
        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state, metrics: dict | None = None,
             extra: dict | None = None) -> None:
        """``extra``: small JSON metadata persisted alongside the step
        (e.g. the epoch counter, so resume never has to infer it from
        ``step // len(train_loader)`` — a manifest edit between runs would
        silently shift the epoch/shuffle replay otherwise)."""
        kwargs = {}
        if self._monitor and metrics and self._monitor in metrics:
            kwargs['metrics'] = {k: float(v) for k, v in metrics.items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state), **kwargs)
        self._mgr.wait_until_finished()
        if extra is not None:
            import json
            tmp = os.path.join(self._dir, f'meta_{step}.json.tmp')
            with open(tmp, 'w') as f:
                json.dump(extra, f)
            os.replace(tmp, os.path.join(self._dir, f'meta_{step}.json'))
        # Retention deletes checkpoint dirs but knows nothing about the
        # meta sidecars; prune them too or load_extra() can serve
        # metadata for a checkpoint that no longer exists.
        kept = set(self._mgr.all_steps())
        for name in os.listdir(self._dir):
            if name.startswith('meta_') and name.endswith('.json'):
                try:
                    s = int(name[len('meta_'):-len('.json')])
                except ValueError:
                    continue
                if s not in kept:
                    os.remove(os.path.join(self._dir, name))

    def load_extra(self, step: int | None = None) -> dict:
        """The ``extra`` metadata saved with ``step`` (default: latest);
        ``{}`` for checkpoints written before this existed."""
        import json
        step = self._mgr.latest_step() if step is None else step
        path = os.path.join(self._dir, f'meta_{step}.json')
        if step is None or not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def latest_step(self):
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, template, step: int | None = None):
        """Restore into the structure of ``template`` (a concrete pytree)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


def average_checkpoints(ckpt: Checkpointer, template, last_k: int):
    """Uniform average of the last ``last_k`` checkpoints' weights.

    Classic ASR finishing move (absent from the reference, which keeps
    only Lightning's per-epoch files): averaging the final few epochs'
    weights smooths SGD noise and typically buys a few tenths of a WER
    point for free at inference. Float-array leaves of ``params`` AND
    ``batch_stats`` are averaged (running BN means/vars are affine
    statistics — their uniform average is the natural combined estimate);
    ``step``/``opt_state``/``rng`` are taken from the newest checkpoint.
    Returns a state shaped like ``template``.
    """
    import jax
    import numpy as np

    steps = ckpt.all_steps()[-int(last_k):]
    if not steps:
        return None
    states = [ckpt.restore(template, step=s) for s in steps]
    newest = states[-1]

    def mean(*leaves):
        a = np.asarray(leaves[0])
        if not np.issubdtype(a.dtype, np.floating):
            return leaves[-1]
        return np.mean(np.stack([np.asarray(x, np.float64) for x in leaves],
                                0), 0).astype(a.dtype)

    avg_params = jax.tree_util.tree_map(mean, *[s.params for s in states])
    avg_stats = jax.tree_util.tree_map(mean,
                                       *[s.batch_stats for s in states])
    return newest.replace(params=avg_params, batch_stats=avg_stats)


def save_params(path: str, pytree) -> None:
    """One-shot parameter dump (used by test.py-style offline evaluation)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pytree)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
