"""Serving / inference runtime: streaming sessions and quantized paths.

The reference has no serving surface (training-only; README.md:46-47 marks
even offline eval "WIP"). This subpackage is the TPU-native production
inference layer: chunked stateful streaming with compiled fixed-shape phase
programs (streaming.py) and BatchNorm-folded fused conv blocks.
"""

from .export import (compute_cmvn, export_serving, export_serving_jasper,
                     load_serving)
from .infer import offline_forward, offline_forward_q8
from .parallel_infer import MeshInference
from .server import StreamMultiplexer
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
           'compute_cmvn', 'MeshInference', 'calibrate_activation_scales',
           'StreamMultiplexer']
