"""TCP streaming server: framed protocol over StreamMultiplexer.

Contract under test: any mix of concurrent, differently-paced network
clients must receive EXACTLY the transcript a dedicated in-process
``StreamingSession`` produces for the same audio (the multiplexer's
slot-independence plus the jitter-tolerant tick must survive the
transport), and protocol errors (rate mismatch, capacity, short streams)
surface as typed ERROR frames, not hangs.
"""

import asyncio
import threading
import time

import numpy as np
import pytest

from wav2letter_pytorch_tpu.serving import StreamClient, StreamingServer
from wav2letter_pytorch_tpu.serving.net import _pack, _pack_json, END, HELLO
from tests.test_stream_multiplexer import LABELS, _dedicated, sw  # noqa: F401

SR = 16000


@pytest.fixture(scope='module')
def server(sw):  # noqa: F811
    srv = StreamingServer(sw, LABELS, slots=3, poll=0.002)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.start())
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    yield srv
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(10)


def _audio(rng, n):
    return (rng.standard_normal(n) * 0.3).astype(np.float32)


def test_single_stream_roundtrip(server, sw):  # noqa: F811
    rng = np.random.default_rng(40)
    audio = _audio(rng, sw.prime_samples + 3 * sw.chunk_samples + 777)
    c = StreamClient('127.0.0.1', server.port, sample_rate=SR)
    assert c.info['chunk_samples'] == sw.chunk_samples
    # Odd-sized sends: frame boundaries must not matter.
    for i in range(0, len(audio), 5000):
        c.send(audio[i:i + 5000])
    final = c.finish()
    assert final == _dedicated(sw, audio)
    # Incremental partials are a prefix of the final transcript.
    assert final.startswith(''.join(c.partials))


def test_concurrent_clients_pacing_parity(server, sw):  # noqa: F811
    """Three clients: one bulk sender, one real-time paced, one laggy.
    The laggy one must not corrupt anyone (tick_ready isolation)."""
    rng = np.random.default_rng(41)
    cs, ps = sw.chunk_samples, sw.prime_samples
    streams = [_audio(rng, ps + 5 * cs + 123),
               _audio(rng, ps + 3 * cs + 1500),
               _audio(rng, ps + 2 * cs)]
    expected = [_dedicated(sw, a) for a in streams]
    finals = [None] * 3

    def client(i, piece, delay):
        c = StreamClient('127.0.0.1', server.port, sample_rate=SR)
        a = streams[i]
        for j in range(0, len(a), piece):
            c.send(a[j:j + piece])
            if delay:
                time.sleep(delay)
        finals[i] = c.finish()

    threads = [threading.Thread(target=client, args=(0, 1 << 30, 0)),
               threading.Thread(target=client, args=(1, cs, 0.01)),
               threading.Thread(target=client, args=(2, 900, 0.02))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert finals == expected


def test_s16_format(server, sw):  # noqa: F811
    rng = np.random.default_rng(42)
    audio = _audio(rng, sw.prime_samples + sw.chunk_samples + 50)
    # The wire carries int16; parity target is the same quantized audio.
    q = np.clip(audio * 32768.0, -32768, 32767).astype('<i2') \
        .astype(np.float32) / 32768.0
    c = StreamClient('127.0.0.1', server.port, sample_rate=SR, fmt='s16')
    c.send(audio)
    assert c.finish() == _dedicated(sw, q)


def test_mismatched_rate_resampled_server_side(server, sw):  # noqa: F811
    """A 48 kHz client is accepted: the server's streaming polyphase
    conversion is chunk-exact, so the FINAL equals a dedicated session fed
    the one-shot-resampled audio."""
    from wav2letter_pytorch_tpu.data.resample import resample
    rng = np.random.default_rng(47)
    audio48 = _audio(rng, 3 * (sw.prime_samples + 2 * sw.chunk_samples))
    expected = _dedicated(sw, resample(audio48, 48000, SR))
    c = StreamClient('127.0.0.1', server.port, sample_rate=48000)
    assert c.info['input_rate'] == 48000
    assert c.info['sample_rate'] == SR
    for i in range(0, len(audio48), 7001):  # odd chunking on the wire
        c.send(audio48[i:i + 7001])
    assert c.finish() == expected


def test_bad_sample_rate_rejected(server):
    with pytest.raises(RuntimeError, match='sample_rate'):
        StreamClient('127.0.0.1', server.port, sample_rate=0)


def test_capacity_refusal(server, sw):  # noqa: F811
    rng = np.random.default_rng(43)
    audio = _audio(rng, sw.prime_samples + 10)
    held = [StreamClient('127.0.0.1', server.port, sample_rate=SR)
            for _ in range(3)]
    with pytest.raises(RuntimeError, match='busy'):
        StreamClient('127.0.0.1', server.port, sample_rate=SR)
    for c in held:   # slots free again after the held streams finish
        c.send(audio)
        assert c.finish() == _dedicated(sw, audio)
    c = StreamClient('127.0.0.1', server.port, sample_rate=SR)
    c.send(audio)
    assert c.finish() == _dedicated(sw, audio)


def test_short_stream_errors_cleanly(server, sw):  # noqa: F811
    rng = np.random.default_rng(44)
    c = StreamClient('127.0.0.1', server.port, sample_rate=SR)
    c.send(_audio(rng, sw.prime_samples // 4))
    with pytest.raises(RuntimeError, match='prime window'):
        c.finish()
    # The aborted slot must be reusable.
    audio = _audio(rng, sw.prime_samples + 20)
    c2 = StreamClient('127.0.0.1', server.port, sample_rate=SR)
    c2.send(audio)
    assert c2.finish() == _dedicated(sw, audio)


def test_abrupt_disconnect_frees_slot(server, sw):  # noqa: F811
    rng = np.random.default_rng(45)
    c = StreamClient('127.0.0.1', server.port, sample_rate=SR)
    c.send(_audio(rng, sw.prime_samples + sw.chunk_samples))
    c.close()                       # vanish mid-stream, no END
    deadline = time.time() + 10     # server notices EOF and aborts slot
    audio = _audio(rng, sw.prime_samples + 30)
    while True:
        try:
            c2 = StreamClient('127.0.0.1', server.port, sample_rate=SR)
            break
        except RuntimeError:
            assert time.time() < deadline, 'slot never freed'
            time.sleep(0.05)
    c2.send(audio)
    assert c2.finish() == _dedicated(sw, audio)


def test_protocol_garbage_rejected(server):
    import socket
    s = socket.create_connection(('127.0.0.1', server.port), timeout=10)
    s.sendall(_pack(END))           # END before HELLO
    buf = b''
    while len(buf) < 5:
        part = s.recv(4096)
        if not part:
            break
        buf += part
    assert buf[4:5] == b'\x84'      # ERROR frame
    s.close()
    # Bad JSON in HELLO
    s = socket.create_connection(('127.0.0.1', server.port), timeout=10)
    s.sendall(_pack(HELLO, b'{not json'))
    buf = b''
    while len(buf) < 5:
        part = s.recv(4096)
        if not part:
            break
        buf += part
    assert buf[4:5] == b'\x84'
    s.close()


def test_mesh_server_roundtrip(sw):  # noqa: F811
    """StreamingServer(mesh=...): the slot batch shards over the device
    mesh; a network client's transcript must still equal the dedicated
    session's exactly."""
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()), ('data',))
    n = len(jax.devices())
    srv = StreamingServer(sw, LABELS, slots=n, poll=0.002, mesh=mesh)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.start())
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    try:
        rng = np.random.default_rng(91)
        audio = _audio(rng, sw.prime_samples + 2 * sw.chunk_samples + 333)
        c = StreamClient('127.0.0.1', srv.port, sample_rate=SR)
        c.send(audio)
        assert c.finish() == _dedicated(sw, audio)
    finally:
        asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(10)
