"""Audio file I/O with offset/duration seeking.

Replaces the reference's soundfile dependency (/root/reference/data/
data_loader.py:20-31) with a stdlib WAV reader plus the framework's own
FLAC decoder (native C++ fast path, pure-Python fallback — see
``flac.py``/``flac_native.py``), so LibriSpeech ``.flac`` manifests
(/root/reference/data/prepare_librispeech.py:33-38) ingest with zero
third-party audio dependencies.  Other formats go through soundfile when
it is installed — that import stays lazy and optional.
"""

from __future__ import annotations

import os
import wave

import numpy as np

_PCM_SCALE = {1: 127.0, 2: 32768.0, 4: 2147483648.0}
_PCM_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def read_wav(path: str, duration: float = -1, offset: float = 0):
    """Read a PCM WAV file -> (float32 samples in [-1, 1], sample_rate).

    ``offset``/``duration`` are in seconds and seek at the container level,
    mirroring the reference's manifest slicing of long files.
    Multi-channel audio is averaged to mono.
    """
    with wave.open(path, 'rb') as f:
        rate = f.getframerate()
        width = f.getsampwidth()
        channels = f.getnchannels()
        if offset > 0:
            f.setpos(min(int(offset * rate), f.getnframes()))
        n = f.getnframes() - f.tell()
        if duration > 0:
            n = min(n, int(duration * rate))
        raw = f.readframes(n)
    data = np.frombuffer(raw, dtype=_PCM_DTYPE[width]).astype(np.float32)
    if width == 1:  # uint8 WAV is offset-binary
        data = data - 128.0
    data /= _PCM_SCALE[width]
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return data, rate


def load_audio(path: str, duration: float = -1, offset: float = 0) -> np.ndarray:
    """Load audio samples as float32 (API parity with reference load_audio)."""
    samples, _ = read_audio(path, duration, offset)
    return samples


def read_flac(path: str, duration: float = -1, offset: float = 0):
    """Read a FLAC file -> (float32 samples in [-1, 1], sample_rate).

    Decodes through the native C++ decoder when available, else the
    pure-Python reference decoder; both are first-party (no soundfile).
    FLAC frames are not independently seekable without a seektable, so
    ``offset``/``duration`` slice the decoded signal — identical samples to
    the reference's container-level seek.
    """
    from . import flac as _flac
    from . import flac_native as _flac_native
    with open(path, 'rb') as f:
        data = f.read()
    nat = _flac_native.decode_native(data)
    if nat is not None:
        samples, rate, bps = nat
    else:
        samples, info = _flac.decode_flac(data)
        rate, bps = info.sample_rate, info.bits_per_sample
    out = samples.astype(np.float32) / float(1 << (bps - 1))
    out = out.mean(axis=1) if out.shape[1] > 1 else out[:, 0]
    start = min(int(offset * rate), len(out)) if offset > 0 else 0
    end = start + int(duration * rate) if duration > 0 else len(out)
    return out[start:end], rate


def read_audio(path: str, duration: float = -1, offset: float = 0):
    ext = os.path.splitext(path)[1].lower()
    if ext == '.wav':
        return read_wav(path, duration, offset)
    if ext == '.flac':
        return read_flac(path, duration, offset)
    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            f'Reading {ext!r} files requires the optional soundfile package '
            '(WAV works out of the box).') from e
    with sf.SoundFile(path, 'r') as f:
        rate = f.samplerate
        if offset > 0:
            f.seek(int(offset * rate))
        if duration > 0:
            samples = f.read(int(duration * rate), dtype='float32')
        else:
            samples = f.read(dtype='float32')
    samples = np.asarray(samples, np.float32)
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    return samples, rate


def audio_info(path: str):
    """(num_samples, sample_rate) from the header without decoding audio."""
    ext = os.path.splitext(path)[1].lower()
    if ext == '.wav':
        with wave.open(path, 'rb') as f:
            return f.getnframes(), f.getframerate()
    if ext == '.flac':
        from . import flac as _flac
        with open(path, 'rb') as f:
            head = f.read(65536)
        info = _flac.read_flac_info(head)
        return info.total_samples, info.sample_rate
    import soundfile as sf
    info = sf.info(path)
    return info.frames, info.samplerate


def write_wav(path: str, samples: np.ndarray, sample_rate: int):
    """Write mono float32 samples as 16-bit PCM (used by tests/tools)."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, 'wb') as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
