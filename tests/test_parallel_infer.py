"""Mesh-sharded batched inference (serving/parallel_infer.py) on the
8-virtual-device CPU mesh: numerically identical to single-path inference,
across weight modes."""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.features import (AudioConfig,
                                                  SpectrogramFrontend)
from wav2letter_pytorch_tpu.decoding import GreedyDecoder
from wav2letter_pytorch_tpu.serving import (MeshInference, fold_batchnorm,
                                            offline_forward,
                                            offline_forward_q8,
                                            quantize_folded)
from tests.test_streaming import N_MELS, SMALL_LAYERS, _build


@pytest.fixture(scope='module')
def setup():
    model, variables, frontend = _build(SMALL_LAYERS)
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    rng = np.random.default_rng(0)
    B, T = 8, 24000
    audio = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    lengths = np.array([T, T - 1000, T - 2000, T - 3000] * 2, np.int32)
    for b, L in enumerate(lengths):
        audio[b, L:] = 0.0
    return model, variables, frontend, folded, audio, lengths


def test_mesh_inference_matches_single_path(setup):
    model, variables, frontend, folded, audio, lengths = setup
    mi = MeshInference(SMALL_LAYERS, folded, frontend)
    assert mi.mesh.shape['data'] == 8
    logp, out_lens = mi.logprobs(audio, lengths)

    feats, flens = frontend(audio, lengths)
    ref, ref_lens = offline_forward(SMALL_LAYERS, folded,
                                    np.asarray(feats), flens)
    np.testing.assert_array_equal(out_lens, np.asarray(ref_lens))
    np.testing.assert_allclose(logp, np.asarray(ref), atol=2e-5)

    texts = mi.transcribe(audio, lengths,
                          GreedyDecoder(['_', 'a', 'b', 'c', 'd', 'e', ' ']))
    assert len(texts) == 8


def test_mesh_inference_int8_full(setup):
    model, variables, frontend, folded, audio, lengths = setup
    folded_q = quantize_folded(folded)
    mi = MeshInference(SMALL_LAYERS, folded_q, frontend, mode='int8_full')
    logp, out_lens = mi.logprobs(audio, lengths)
    feats, flens = frontend(audio, lengths)
    ref, _ = offline_forward_q8(SMALL_LAYERS, folded_q, np.asarray(feats),
                                flens)
    np.testing.assert_allclose(logp, np.asarray(ref), atol=2e-5)


def test_mesh_inference_errors(setup):
    model, variables, frontend, folded, audio, lengths = setup
    mi = MeshInference(SMALL_LAYERS, folded, frontend)
    with pytest.raises(ValueError, match='divisible'):
        mi.logprobs(audio[:3], lengths[:3])
    with pytest.raises(ValueError, match='int8_full'):
        MeshInference(SMALL_LAYERS, folded, frontend, mode='int8_full')


def test_scaling_benchmark_smoke(tmp_path):
    """benchmarks/scaling.py (the dormant multi-chip scaling benchmark)
    compiles and executes its sharded train + MeshInference programs at
    several mesh sizes on the CPU test mesh."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks'))
    import scaling
    out = tmp_path / 'scaling.json'
    assert scaling.main(['--cpu-smoke', '--mesh-sizes', '1,2',
                         '--out', str(out)]) == 0
    result = json.loads(out.read_text())
    assert set(result['train']) == {'1', '2'}
    assert set(result['infer']) == {'1', '2'}
    assert all(v > 0 for v in result['train'].values())
