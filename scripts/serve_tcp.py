#!/usr/bin/env python
"""Serve a streaming-ASR artifact over TCP, or stream a file to a server.

Server (one chip, up to --slots concurrent live streams batched into one
compiled streaming session — serving/net.py):

    python scripts/serve_tcp.py --artifact runs/demo/serving \\
        --host 0.0.0.0 --port 7600 --slots 16

Client (send a WAV/FLAC file chunk-by-chunk, print partials + final):

    python scripts/serve_tcp.py --client audio.wav --port 7600 [--realtime]

The reference has no serving surface at all; this CLI is the network
entry point of the TPU-native serving stack (see docs/SERVING.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--artifact', help='serving artifact dir (server mode)')
    p.add_argument('--client', metavar='AUDIO',
                   help='audio file to stream to a running server')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=7600)
    p.add_argument('--slots', type=int, default=16,
                   help='concurrent-stream capacity (batch rows)')
    p.add_argument('--mesh', action='store_true',
                   help='shard the slot batch across ALL local devices '
                        '(StreamMultiplexer mesh mode; slots must divide '
                        'by the device count)')
    p.add_argument('--chunk-frames', type=int, default=64,
                   help='feature frames per streaming step')
    p.add_argument('--realtime', action='store_true',
                   help='client: pace sends at real time instead of bulk')
    p.add_argument('--timeout', type=float, default=120.0,
                   help='client: socket timeout (first contact with a '
                        'cold server pays jit compiles)')
    args = p.parse_args()
    if bool(args.artifact) == bool(args.client):
        p.error('pass exactly one of --artifact (serve) / --client (send)')
    return run_client(args) if args.client else run_server(args)


def run_server(args):
    import asyncio

    from wav2letter_pytorch_tpu.serving import StreamingServer
    from wav2letter_pytorch_tpu.serving.export import streaming_from_artifact

    model, labels, meta = streaming_from_artifact(
        args.artifact, chunk_frames=args.chunk_frames)
    mesh = None
    if args.mesh:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ('data',))
    srv = StreamingServer(model, labels, slots=args.slots,
                          host=args.host, port=args.port, mesh=mesh)
    chunk_s = model.chunk_samples / model.sample_rate
    print(f'serving {meta.get("family", "wav2letter")} '
          f'({meta["format"]} weights) on {args.host}:{args.port} — '
          f'{args.slots} slots, {chunk_s * 1000:.0f} ms chunks, '
          f'{model.prime_samples / model.sample_rate:.2f} s prime window',
          flush=True)
    try:
        asyncio.run(srv.serve_forever())
    except KeyboardInterrupt:
        return 0
    return 0


def run_client(args):
    import numpy as np

    from wav2letter_pytorch_tpu.data.audio_io import read_audio
    from wav2letter_pytorch_tpu.serving import StreamClient

    audio, sr = read_audio(args.client)
    audio = np.asarray(audio, np.float32).ravel()
    c = StreamClient(args.host, args.port, sample_rate=sr,
                     timeout=args.timeout)
    cs = c.info['chunk_samples']
    print(f'streaming {len(audio) / sr:.2f} s '
          f'({len(audio)} samples) in {cs}-sample chunks', flush=True)
    seen = 0
    for i in range(0, len(audio), cs):
        c.send(audio[i:i + cs])
        if args.realtime:
            time.sleep(cs / sr)
        for t in c.partials[seen:]:
            print(f'partial: {t!r}', flush=True)
        seen = len(c.partials)
    final = c.finish()
    for t in c.partials[seen:]:
        print(f'partial: {t!r}', flush=True)
    print(f'final  : {final!r}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
