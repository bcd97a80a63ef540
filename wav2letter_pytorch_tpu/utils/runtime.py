"""Runtime helpers: persistent XLA compilation cache, profiling hooks."""

from __future__ import annotations

import contextlib
import os


def _cache_namespace() -> str:
    """Platform + host-CPU fingerprint for the persistent cache directory.

    XLA's persistent-cache key does NOT cover the machine features a
    CPU executable was AOT-compiled for: an entry produced on one machine
    (e.g. by a device tunnel's remote-compile service during a TPU
    session) loads on another with only a cpu_aot_loader warning and runs
    deoptimized — measured 5x slower train steps (10.5 s/step vs 2.1
    s/step recompiled natively) on the same host. Namespacing the cache
    dir by (requested platform, /proc/cpuinfo flags hash) keeps each
    machine profile's CPU executables separate while TPU entries still
    hit across runs.
    """
    import hashlib

    import jax
    platform = (jax.config.jax_platforms or
                os.environ.get('JAX_PLATFORMS') or 'ambient').split(',')[0]
    flags = ''
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    flags = line
                    break
    except OSError:
        import platform as plat
        flags = plat.processor() or plat.machine()
    return f'{platform}-{hashlib.sha1(flags.encode()).hexdigest()[:10]}'


def enable_compilation_cache(path: str | None = None):
    """Persist compiled XLA programs across processes.

    First TPU compiles are slow (tens of seconds through the device tunnel);
    caching makes reruns of train/bench/eval start in seconds.
    """
    import jax
    path = path or os.path.join(os.path.expanduser('~'), '.cache',
                                'w2l_tpu_xla', _cache_namespace())
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """jax.profiler trace scope (TensorBoard-viewable), no-op when disabled.

    The reference exposes profiling only via Lightning's ``profiler`` flag
    (SURVEY.md §5); here tracing wraps any training region.
    """
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def model_summary(params) -> str:
    """Parameter-count table (Lightning's example_input_array summary
    equivalent, reference base_asr_models.py:25-31)."""
    import jax
    import numpy as np
    lines = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    per_module = {}
    for path, leaf in flat:
        module = str(path[0].key) if path else '?'
        n = int(np.prod(leaf.shape)) if hasattr(leaf, 'shape') else 1
        per_module[module] = per_module.get(module, 0) + n
        total += n
    width = max((len(m) for m in per_module), default=6)
    for module, n in per_module.items():
        lines.append(f'  {module:<{width}}  {n:>12,}')
    lines.append(f'  {"TOTAL":<{width}}  {total:>12,}')
    return '\n'.join(lines)


def host_rss_mb() -> float:
    """This process's resident set size in MiB (0.0 if unreadable).

    Used by the trainer's ``host_rss_budget_gb`` guard: some device
    transports (observed: tunnel-attached PJRT clients) retain a host copy
    of every uploaded buffer for the life of the process, so long training
    runs grow RSS at the wire rate regardless of syncs or GC. The guard
    turns that into a graceful mid-run checkpoint + exit instead of an OOM.
    """
    try:
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS'):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0
