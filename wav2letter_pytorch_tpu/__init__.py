"""wav2letter_pytorch_tpu — a TPU-native (JAX / XLA / Pallas / pjit) ASR framework.

A ground-up rebuild of the capabilities of ``assafmu/wav2letter_pytorch``
(mounted read-only at /root/reference) designed TPU-first:

* on-device batched feature frontend (dither -> preemphasis -> STFT-as-matmul
  -> mel -> log1p -> masked per-feature normalization), MXU-friendly;
* Wav2Letter / Jasper 1-D conv acoustic models as fused XLA graphs in NTC
  (batch, time, channel) layout with explicit length masking;
* CTC loss as a log-space ``lax.scan`` alpha recursion (torch
  ``nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)`` semantics);
* data parallelism via a ``jax.sharding.Mesh`` + NamedSharding (gradient
  all-reduce rides ICI, not NCCL);
* host-side greedy / kenlm-fused prefix-beam-search decoding (plus a
  batched on-device beam search) with a native C++ Levenshtein extension
  for WER/CER;
* a production serving layer (``serving/``): chunked streaming sessions
  with exact offline parity, incremental greedy/beam transcription, BN
  folding, int8 weight-only and full-int8 MXU inference with calibration,
  serving artifacts, mesh-sharded batched inference, and a multi-stream
  request multiplexer — see docs/SERVING.md.

Reference layer map: /root/reference — see SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
