"""Manifest dataset + length-bucketed static-shape batching.

Parity surface: /root/reference/data/data_loader.py:90-163
(``SpectrogramDataset`` + ``_collator``/``BatchAudioDataLoader``), redesigned
for TPU:

* the dataset yields **raw audio**; feature extraction runs batched on
  device (data/features.py) inside the jitted train step, instead of
  per-sample CPU STFT in DataLoader workers;
* the reference pads every batch to its own max length (dynamic shapes,
  one XLA recompile per distinct length) — here lengths are quantized into
  a handful of buckets so the whole run compiles at most
  ``num_buckets x target-width`` variants;
* batches are host numpy; a background thread keeps ``prefetch`` batches
  ready while the device computes.

Manifest format parity: CSV (pandas, index_col=0 — matching
prepare_librispeech's to_csv) or JSON-lines with ``audio_filepath``/``text``
and optional ``offset``/``duration`` columns (data_loader.py:102-111).
"""

from __future__ import annotations

import json
import queue
import threading

import numpy as np

from . import label_sets
from .audio_io import audio_info, read_audio
from .resample import resample, resample_ratio


class ManifestDataset:
    """Audio + transcript samples described by a CSV / JSON-lines manifest."""

    def __init__(self, manifest_filepath: str, audio_conf, labels,
                 validate_rate: bool = True, cache_audio: bool = False,
                 audio_dtype: str = 'float32'):
        """``cache_audio=True`` keeps every decoded (and resampled) waveform
        in host RAM after first read — epochs 2+ skip FLAC/WAV decode
        entirely. On a single-core host the decode thread otherwise competes
        with the device dispatch loop and caps training throughput (measured
        ~50 utt/s decode-bound vs ~436 utt/s compute on a v5e chip for the
        offline corpus). Opt-in: only safe when the corpus fits in RAM
        (float32 samples: ~115 MB per hour of 16 kHz audio).

        ``audio_dtype='int16'``: samples are kept (and batched) as raw PCM
        ints — half the host->device transfer bytes and cache RAM of f32.
        The on-device frontend recovers floats as ``x / 2**15``, which is
        bit-exact for 16-bit sources (every int16/32768 is an exact f32);
        >16-bit or resampled audio is quantized to 16-bit wire precision."""
        import pandas as pd
        if manifest_filepath.endswith('.csv'):
            self.df = pd.read_csv(manifest_filepath, index_col=0)
        else:
            with open(manifest_filepath) as f:
                self.df = pd.DataFrame(json.loads(line) for line in f
                                       if line.strip())
        if 'offset' not in self.df.columns:
            self.df['offset'] = 0.0
        if 'duration' not in self.df.columns:
            self.df['duration'] = -1.0
        self.sample_rate = int(audio_conf['sample_rate'])
        # Opt-in rate conversion (audio_conf.resample: true): mismatched
        # files are polyphase-resampled to ``sample_rate`` on read instead
        # of rejected. Off by default for parity with the reference's
        # assert-only behavior (data_loader.py:135-138).
        self.resample = bool(audio_conf.get('resample', False))
        self.labels = label_sets.resolve_labels(labels)
        self.labels_map = {c: i for i, c in enumerate(self.labels)}
        if audio_dtype not in ('float32', 'int16'):
            raise ValueError(f'audio_dtype must be float32 or int16, '
                             f'got {audio_dtype!r}')
        self.audio_dtype = np.dtype(audio_dtype)
        self._audio_cache: dict[int, np.ndarray] | None = (
            {} if cache_audio else None)
        if validate_rate and not self.resample and len(self.df):
            self.validate_sample_rate()

    def validate_sample_rate(self):
        _, sr = audio_info(self.df.iloc[0].audio_filepath)
        assert sr == self.sample_rate, (
            f'Expected sample rate {self.sample_rate} but found {sr} in '
            'first file')

    def encode_text(self, text: str) -> list[int]:
        # filter(None, ...) parity: drops unmapped chars AND index 0 — safe
        # because index 0 is the blank, never present in transcripts
        # (reference data_loader.py:127).
        return [i for i in (self.labels_map.get(ch) for ch in text) if i]

    def __len__(self):
        return len(self.df)

    def sample_meta(self, index: int):
        """(num_samples, text) without decoding audio — for bucketing."""
        row = self.df.iloc[index]
        if row.duration and row.duration > 0:
            n = int(row.duration * self.sample_rate)
        elif self.resample:
            frames, sr = audio_info(row.audio_filepath)
            n_native = frames - int(row.offset * sr)
            # ceil(n * up / down): exact post-resample length (resample.py)
            up, down = resample_ratio(sr, self.sample_rate)
            n = -(-n_native * up // down)
        else:
            frames, _ = audio_info(row.audio_filepath)
            n = frames - int(row.offset * self.sample_rate)
        return n, row.text

    def __getitem__(self, index: int):
        row = self.df.iloc[index]
        if self._audio_cache is not None and index in self._audio_cache:
            audio = self._audio_cache[index]
        else:
            audio, sr = read_audio(row.audio_filepath, row.duration,
                                   row.offset)
            if self.resample and sr != self.sample_rate:
                audio = resample(audio, sr, self.sample_rate)
            if self.audio_dtype == np.int16:
                # rint is a no-op for 16-bit sources (x*32768 is already
                # integral); quantizes anything finer to wire precision.
                audio = np.clip(np.rint(audio * 32768.0),
                                -32768, 32767).astype(np.int16)
            if self._audio_cache is not None:
                self._audio_cache[index] = audio
        return audio, self.encode_text(row.text), row.audio_filepath, row.text

    def data_channels(self, mel_spec: int | None = None,
                      window_size: float | None = None) -> int:
        """Feature channels per frame (reference data_loader.py:143-147)."""
        if mel_spec:
            return mel_spec
        if window_size is None:
            raise ValueError('need window_size when mel_spec is unset')
        return int(1 + int(self.sample_rate * window_size) / 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BucketBatchLoader:
    """Batches with length-bucketed static shapes and thread prefetch.

    Yields dicts with keys: ``audio`` [B, T_bucket] f32, ``audio_lengths``
    [B] i32, ``targets`` [B, S] i32 (zero-padded), ``target_lengths`` [B]
    i32, plus host-side ``texts`` and ``paths`` lists. The final short batch
    is padded to full batch_size with repeated samples masked out via
    ``batch_mask`` (all-ones otherwise) so shapes never change.
    """

    def __init__(self, dataset: ManifestDataset, batch_size: int,
                 num_buckets: int = 4, max_duration: float | None = None,
                 shuffle: bool = False, seed: int = 0, prefetch: int = 2,
                 length_multiple: int = 1280, target_multiple: int = 16,
                 drop_last: bool = False, shard_id: int = 0,
                 num_shards: int = 1, frame_hop: int | None = None):
        """``shard_id``/``num_shards``: multi-host data parallelism — each
        host iterates a disjoint slice of the (identically shuffled) sample
        order, replacing Lightning's DistributedSampler (SURVEY.md §2.3).
        ``batch_size`` is the per-host batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.target_multiple = target_multiple
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

        metas = [dataset.sample_meta(i) for i in range(len(dataset))]
        self.lengths = np.array([m[0] for m in metas], dtype=np.int64)
        max_samples = (int(max_duration * dataset.sample_rate)
                       if max_duration else int(self.lengths.max(initial=1)))
        self.lengths = np.minimum(self.lengths, max_samples)

        # Bucket edges at length quantiles, rounded to a coarse multiple so
        # near-identical buckets collapse (fewer compiled shapes). With a
        # known STFT hop, edges are chosen so the frame count (1 + T/hop)
        # is a multiple of 8 — frames land on the TPU sublane tile exactly
        # (~2% faster conv stack than worst-case alignment).
        if frame_hop:
            def edge(x):
                target = (8 * frame_hop) - frame_hop  # T ≡ 7*hop (mod 8*hop)
                m = 8 * frame_hop
                return ((max(int(x) - target, 0) + m - 1) // m) * m + target
        else:
            def edge(x):
                return _round_up(int(x), length_multiple)
        qs = np.quantile(self.lengths, np.linspace(0, 1, num_buckets + 1)[1:])
        edges = sorted({edge(q) for q in qs})
        # The top edge covers the longest (cap-clipped) sample actually in
        # the data. max_duration is a CAP, not a floor: padding every batch
        # of a short-utterance corpus out to the cap multiplies the conv
        # stack's work by cap/data-max for zero benefit (observed 4.5x
        # slower train steps at cap 16.7s over a 3.5s-max corpus).
        edges[-1] = max(edge(int(self.lengths.max(initial=1))), edges[-1])
        self.bucket_edges = edges
        self.max_target_len = max(
            (len(dataset.encode_text(m[1])) for m in metas), default=1)

    def _bucket_of(self, length: int) -> int:
        for i, e in enumerate(self.bucket_edges):
            if length <= e:
                return i
        return len(self.bucket_edges) - 1

    def __len__(self):
        """Batch count for the first epoch's order (cheap: metadata only)."""
        return sum(1 for _ in self._batch_indices(0))

    def _batch_indices(self, epoch: int):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards]
        buckets: dict[int, list[int]] = {}
        for idx in order:
            b = self._bucket_of(int(self.lengths[idx]))
            buckets.setdefault(b, []).append(int(idx))
            if len(buckets[b]) == self.batch_size:
                yield b, buckets.pop(b)
        for b, rest in sorted(buckets.items()):
            if rest and not self.drop_last:
                yield b, rest

    def _make_batch(self, bucket: int, indices: list[int]):
        pad_to = self.bucket_edges[bucket]
        n = len(indices)
        B = self.batch_size
        audio = np.zeros((B, pad_to),
                         getattr(self.dataset, 'audio_dtype', np.float32))
        audio_lengths = np.ones((B,), np.int32)
        s_max = _round_up(max(self.max_target_len, 1), self.target_multiple)
        targets = np.zeros((B, s_max), np.int32)
        target_lengths = np.zeros((B,), np.int32)
        batch_mask = np.zeros((B,), np.float32)
        texts, paths = [], []
        for j, idx in enumerate(indices):
            samples, target, path, text = self.dataset[idx]
            t = min(len(samples), pad_to)
            audio[j, :t] = samples[:t]
            audio_lengths[j] = t
            target = target[:s_max]
            targets[j, :len(target)] = target
            target_lengths[j] = len(target)
            batch_mask[j] = 1.0
            texts.append(text)
            paths.append(path)
        # Short final batch: repeat the first sample into the padding rows
        # (masked out of the loss) so shapes stay static.
        for j in range(n, B):
            audio[j] = audio[n - 1]
            audio_lengths[j] = audio_lengths[n - 1]
            targets[j] = targets[n - 1]
            target_lengths[j] = target_lengths[n - 1]
        return dict(audio=audio, audio_lengths=audio_lengths, targets=targets,
                    target_lengths=target_lengths, batch_mask=batch_mask,
                    texts=texts, paths=paths)

    def peek_batch(self):
        """First batch of the upcoming epoch's order, WITHOUT consuming the
        epoch counter or starting a prefetch thread. Used to initialize model
        state before training: a plain ``for batch in loader: break`` would
        bump ``epoch`` (shifting every subsequent shuffle order off by one)
        and leak a prefetch worker blocked on its queue.
        """
        for b, idxs in self._batch_indices(self.epoch):
            return self._make_batch(b, idxs)
        return None

    def __iter__(self):
        epoch = self.epoch
        self.epoch += 1
        if self.prefetch <= 0:
            for b, idxs in self._batch_indices(epoch):
                yield self._make_batch(b, idxs)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b, idxs in self._batch_indices(epoch):
                    q.put(self._make_batch(b, idxs))
                q.put(stop)
            except BaseException as e:  # re-raised on the consumer side
                q.put(e)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                thread.join()
                raise item
            yield item
        thread.join()
