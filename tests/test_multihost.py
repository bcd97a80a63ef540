"""Multi-host data parallelism: 2-process jax.distributed CPU test.

Drives the branch unit tests can't reach in-process: per-host
``BucketBatchLoader`` shards + ``jax.make_array_from_process_local_data``
global-batch assembly (parallel/mesh.py multi_host path), asserting a
2-process x 4-device run computes the SAME loss as a single-process
8-device run over the same corpus. Reference anchor: SURVEY.md §2.3 (the
reference's multi-node story is Lightning DDP; ours is SPMD over DCN+ICI).
"""

import json
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / 'tests' / 'multihost_worker.py'


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('mh')
    sys.path.insert(0, str(REPO))
    from wav2letter_pytorch_tpu.data.audio_io import write_wav
    rows = []
    rng = np.random.default_rng(7)
    texts = ['hello world', 'abc def', 'lazy dog', 'jumps over',
             'tpu mesh', 'eight utts', 'for two', 'host shards']
    for i, text in enumerate(texts):
        path = tmp_path / f'u{i}.wav'
        t = np.arange(9600) / 16000.0
        write_wav(str(path),
                  (0.3 * np.sin(2 * np.pi * (250 + 60 * i) * t)
                   + 0.01 * rng.standard_normal(t.shape)).astype(np.float32),
                  16000)
        rows.append({'audio_filepath': str(path), 'text': text})
    manifest = tmp_path / 'man.jsonl'
    manifest.write_text('\n'.join(json.dumps(r) for r in rows))
    return str(manifest)


def _spawn(manifest, num_processes, process_id, port, batch_per_process,
           devices_per_process, extra_args=()):
    import os
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env['XLA_FLAGS'] = env.get('XLA_FLAGS', '').replace(
        '--xla_force_host_platform_device_count=8', '').strip()
    return subprocess.Popen(
        [sys.executable, str(WORKER),
         '--coordinator', f'localhost:{port}',
         '--num-processes', str(num_processes),
         '--process-id', str(process_id),
         '--manifest', manifest,
         '--batch-per-process', str(batch_per_process),
         '--devices-per-process', str(devices_per_process),
         *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def _loss_of(proc, timeout=540):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f'stdout:\n{out}\nstderr:\n{err[-3000:]}'
    m = re.search(r'WORKER_LOSS ([\d.]+)', out)
    assert m, out
    return float(m.group(1))


def test_two_process_matches_single_process(corpus):
    # Single process, 8 local devices, full batch of 8.
    single = _spawn(corpus, 1, 0, _free_port(), 8, 8)
    loss_single = _loss_of(single)

    # Two processes x 4 devices, disjoint loader shards of 4 utts each,
    # assembled into the same global batch of 8.
    port = _free_port()
    p0 = _spawn(corpus, 2, 0, port, 4, 4)
    p1 = _spawn(corpus, 2, 1, port, 4, 4)
    loss0 = _loss_of(p0)
    loss1 = _loss_of(p1)

    assert loss0 == pytest.approx(loss1, abs=1e-6)
    # Global-batch SPMD: host count must be invisible to the math (the row
    # order differs between the two assemblies, but CTC-mean and batch-wide
    # BN stats are permutation-invariant).
    assert loss0 == pytest.approx(loss_single, rel=1e-5)


def test_preemption_agreed_across_hosts(corpus, tmp_path):
    """SIGTERM delivered to ONE host of a 2-process run: the allgathered
    stop decision must halt both processes at the same step boundary with
    one shared checkpoint — a lone host breaking its dispatch loop would
    deadlock the other's collectives."""
    import os
    run_dir = str(tmp_path / 'mh_preempt')
    os.makedirs(run_dir, exist_ok=True)
    port = _free_port()
    extra = ['--fit-preempt', run_dir]
    p0 = _spawn(corpus, 2, 0, port, 4, 4, extra_args=extra)
    p1 = _spawn(corpus, 2, 1, port, 4, 4, extra_args=extra)
    out0, err0 = p0.communicate(timeout=540)
    out1, err1 = p1.communicate(timeout=540)
    assert p0.returncode == 0, f'stdout:\n{out0}\nstderr:\n{err0[-3000:]}'
    assert p1.returncode == 0, f'stdout:\n{out1}\nstderr:\n{err1[-3000:]}'
    m0 = re.search(r'WORKER_PREEMPT_STEP (\d+) preempted=(\w+)', out0)
    m1 = re.search(r'WORKER_PREEMPT_STEP (\d+) preempted=(\w+)', out1)
    assert m0 and m1, f'{out0}\n{out1}'
    step0, step1 = int(m0.group(1)), int(m1.group(1))
    assert step0 == step1 > 0
    assert m0.group(2) == m1.group(2) == 'True'
