"""Serving / inference runtime — the production layer the reference lacks.

The reference is training-only (its README marks even offline eval "WIP",
/root/reference/README.md:46-47). This subpackage is the TPU-native
inference stack:

* ``streaming`` / ``streaming_jasper`` — chunked stateful sessions for
  both model families through three compiled fixed-shape phase programs,
  with exact offline parity; incremental greedy (``StreamingTranscriber``,
  word timings) and LM-fused beam (``StreamingBeamTranscriber``) text;
* ``infer`` — BN-folded fused offline forward, plus full-int8 MXU
  inference (``offline_forward_q8``);
* ``quantize`` — per-channel int8 weights and static activation-scale
  calibration;
* ``qat`` — quantization-aware finetuning of the folded stack against
  the int8 deployment graph (``qat_finetune``, STE fake-quant);
* ``export`` — self-contained serving artifacts (weights + CMVN +
  calibration) for both families;
* ``parallel_infer`` — mesh-sharded batched inference (``MeshInference``);
* ``longform`` — exact overlap-chunked inference for hour-scale audio
  (``LongFormTranscriber``): bounded memory, mesh-parallel windows,
  bit-parity with the one-shot offline stack;
* ``endpoint`` — live CTC endpointing for continuous streams
  (``SegmentingTranscriber``): confident-blank end-of-utterance detection,
  per-segment finals with frame timings, bounded decoder state;
* ``server`` — dynamic multi-stream batching (``StreamMultiplexer``);
* ``net`` — the TCP transport over the multiplexer (``StreamingServer``
  + ``StreamClient``): framed live-audio protocol, jitter-tolerant
  batched ticking, partial + final transcripts.

See docs/SERVING.md for the end-to-end guide and measured numbers.
"""

from .endpoint import Segment, SegmentingTranscriber
from .export import (compute_cmvn, export_serving, export_serving_jasper,
                     load_serving)
from .infer import offline_forward, offline_forward_q8
from .longform import LongFormTranscriber, longform_logprobs
from .parallel_infer import MeshInference
from .server import StreamMultiplexer
from .net import StreamClient, StreamingServer
from .qat import qat_finetune, qat_forward
from .quantize import (calibrate_activation_scales, quantize_folded,
                       quantized_bytes)
from .streaming_jasper import StreamingJasper, fold_jasper
from .streaming import (StreamingBeamTranscriber, StreamingSession,
                        StreamingTranscriber, StreamingWav2Letter,
                        fold_batchnorm)

__all__ = ['StreamingWav2Letter', 'StreamingJasper', 'StreamingSession',
           'StreamingTranscriber', 'StreamingBeamTranscriber',
           'fold_batchnorm', 'fold_jasper',
           'offline_forward', 'offline_forward_q8', 'quantize_folded',
           'quantized_bytes', 'export_serving', 'export_serving_jasper',
           'load_serving',
           'compute_cmvn', 'MeshInference', 'LongFormTranscriber',
           'longform_logprobs', 'calibrate_activation_scales',
           'StreamMultiplexer', 'StreamingServer', 'StreamClient',
           'qat_finetune', 'qat_forward',
           'Segment', 'SegmentingTranscriber']
