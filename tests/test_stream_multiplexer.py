"""StreamMultiplexer: dynamically attached/detached streams in one batched
session must transcribe exactly like dedicated single-stream sessions
(slot rows are computationally independent; prime-scatter and
finish-slice must preserve that)."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.serving import (StreamingTranscriber,
                                            StreamingWav2Letter,
                                            StreamMultiplexer)
from tests.test_streaming import N_MELS, SMALL_LAYERS, _build

LABELS = ['_', 'a', 'b', 'c', 'd', 'e', ' ']


@pytest.fixture(scope='module')
def sw():
    model, variables, frontend = _build(SMALL_LAYERS)
    stats = (np.zeros(N_MELS, np.float32), np.ones(N_MELS, np.float32))
    fe = SpectrogramFrontend(AudioConfig(), n_mels=N_MELS, dither=0.0,
                             norm_stats=stats)
    return StreamingWav2Letter(SMALL_LAYERS, len(LABELS), variables, fe,
                               chunk_frames=16, norm='precomputed',
                               norm_stats=stats)


def _dedicated(sw, audio):
    sess = sw.start(1)
    tr = StreamingTranscriber(sess, LABELS)
    tr.feed(audio[None, :])
    return tr.finish(np.array([len(audio)]))[0]


def test_multiplexer_matches_dedicated_sessions(sw):
    rng = np.random.default_rng(21)
    cs, ps = sw.chunk_samples, sw.prime_samples
    lengths = [ps + 5 * cs + 700, ps + 4 * cs + 1300, ps + 3 * cs]
    streams = [(rng.standard_normal(L) * 0.3).astype(np.float32)
               for L in lengths]
    expected = [_dedicated(sw, a) for a in streams]

    mux = StreamMultiplexer(sw, slots=4, labels=LABELS)
    pos = [0, 0, 0]
    slot = [None, None, None]
    # Staggered attach: stream 0 immediately, 1 after one tick, 2 later.
    attach_at = [0, 1, 3]
    finals = [None, None, None]
    for t in range(30):
        if all(f is not None for f in finals):
            break
        for i in range(3):
            if attach_at[i] == t:
                slot[i] = mux.attach()
                mux.feed(slot[i], streams[i][:ps + cs])
                pos[i] = ps + cs
        # Real-time pacing: one chunk per stream per tick; detach once the
        # stream's audio is exhausted and its buffer drained below a chunk.
        for i in range(3):
            if slot[i] is None or finals[i] is not None:
                continue
            if pos[i] < lengths[i]:
                mux.feed(slot[i], streams[i][pos[i]:pos[i] + cs])
                pos[i] += cs
            if pos[i] >= lengths[i] and mux.pending(slot[i]) < cs:
                finals[i] = mux.detach(slot[i])
        mux.tick()
    for i in range(3):
        if finals[i] is None:
            finals[i] = mux.detach(slot[i])
    assert finals == expected


def test_tick_ready_skips_starved_slots_exactly(sw):
    """tick_ready must advance only chunk-complete slots; a starved slot's
    state must be bit-identical to never having been stepped, so its final
    transcript still matches a dedicated session."""
    rng = np.random.default_rng(11)
    cs, ps = sw.chunk_samples, sw.prime_samples
    fast = (rng.standard_normal(ps + 4 * cs + 100) * 0.3).astype(np.float32)
    slow = (rng.standard_normal(ps + 2 * cs + 900) * 0.3).astype(np.float32)
    expected = [_dedicated(sw, fast), _dedicated(sw, slow)]

    mux = StreamMultiplexer(sw, slots=3, labels=LABELS)
    fa, sl = mux.attach(), mux.attach()
    mux.feed(fa, fast)            # fast client: everything up front
    mux.feed(sl, slow[:ps])       # slow client: primes but starves
    stepped = mux.tick_ready()
    assert sl not in stepped      # starved slot skipped, no exception
    while mux.pending(fa) >= cs:
        mux.tick_ready()
    got_fast = mux.detach(fa)
    mux.feed(sl, slow[ps:])       # slow client catches up afterwards
    while mux.pending(sl) >= cs:
        mux.tick_ready()
    got_slow = mux.detach(sl)
    assert [got_fast, got_slow] == expected


def test_multiplexer_abort_frees_slot(sw):
    rng = np.random.default_rng(5)
    mux = StreamMultiplexer(sw, slots=1, labels=LABELS)
    s = mux.attach()
    mux.feed(s, (rng.standard_normal(200) * 0.3).astype(np.float32))
    mux.abort(s)                  # unprimed abort
    audio = (rng.standard_normal(sw.prime_samples + 10) * 0.3) \
        .astype(np.float32)
    s2 = mux.attach()             # slot reusable, state reset
    assert s2 == s
    mux.feed(s2, audio)
    assert mux.detach(s2) == _dedicated(sw, audio)


def test_multiplexer_slot_reuse_and_errors(sw):
    rng = np.random.default_rng(3)
    mux = StreamMultiplexer(sw, slots=2, labels=LABELS)
    a = mux.attach()
    b = mux.attach()
    with pytest.raises(RuntimeError, match='busy'):
        mux.attach()
    audio = (rng.standard_normal(sw.prime_samples + 300) * 0.3) \
        .astype(np.float32)
    mux.feed(a, audio)
    with pytest.raises(RuntimeError, match='starved'):
        mux.tick()  # slot a primed but lacks a full chunk
    text = mux.detach(a)
    assert text == _dedicated(sw, audio)
    c = mux.attach()   # freed slot is reusable
    assert c == a
    with pytest.raises(ValueError, match='prime window'):
        mux.detach(b)  # never primed

def _all_devices_mesh():
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices())
    return Mesh(devs, ('data',))


def test_mesh_sharded_multiplexer_matches_unsharded(sw):
    """mesh=: the slot axis shards across the device mesh with zero
    collectives; transcripts must equal the unsharded multiplexer's (and
    dedicated sessions') exactly, across staggered attach/detach."""
    mesh = _all_devices_mesh()
    n = int(np.prod(list(mesh.devices.shape)))
    rng = np.random.default_rng(77)
    cs, ps = sw.chunk_samples, sw.prime_samples
    lengths = [ps + 4 * cs + 500, ps + 3 * cs + 90, ps + 2 * cs]
    streams = [(rng.standard_normal(L) * 0.3).astype(np.float32)
               for L in lengths]
    expected = [_dedicated(sw, a) for a in streams]

    mux = StreamMultiplexer(sw, slots=n, labels=LABELS, mesh=mesh)
    # the batched state is really sharded over the mesh
    import jax
    leaf = jax.tree_util.tree_leaves(mux._state)[0]
    assert len(leaf.sharding.device_set) == n

    pos, slot = [0] * 3, [None] * 3
    attach_at = [0, 1, 2]
    finals = [None] * 3
    for t in range(30):
        if all(f is not None for f in finals):
            break
        for i in range(3):
            if attach_at[i] == t:
                slot[i] = mux.attach()
                mux.feed(slot[i], streams[i][:ps + cs])
                pos[i] = ps + cs
        for i in range(3):
            if slot[i] is None or finals[i] is not None:
                continue
            if pos[i] < lengths[i]:
                mux.feed(slot[i], streams[i][pos[i]:pos[i] + cs])
                pos[i] += cs
            if pos[i] >= lengths[i] and mux.pending(slot[i]) < cs:
                finals[i] = mux.detach(slot[i])
        mux.tick_ready()
    for i in range(3):
        if finals[i] is None:
            finals[i] = mux.detach(slot[i])
    assert finals == expected


def test_mesh_multiplexer_rejects_indivisible_slots(sw):
    mesh = _all_devices_mesh()
    with pytest.raises(ValueError, match='divisible'):
        StreamMultiplexer(sw, slots=3, labels=LABELS, mesh=mesh)
