"""Native C++ beam search vs the Python golden reference.

Randomized cross-checks (decoded string must match exactly; ranked score to
float tolerance), the canonical fixed cases, LM fusion through the native
ARPA scorer, and a speed sanity check.
"""

import time

import numpy as np
import pytest

from wav2letter_pytorch_tpu.data.label_sets import english_labels
from wav2letter_pytorch_tpu.decoding import prefix_beam_search
from wav2letter_pytorch_tpu.decoding.beam_native import (
    native_available, prefix_beam_search_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native lib not built')


def test_canonical_cases():
    sample = np.zeros((10, len(english_labels)), np.float32)
    sample[0, 2] = 0.5
    sample[1, 20] = 0.5
    sample[2, 19] = 0.5
    sample[3:, 0] = 0.5
    assert prefix_beam_search_native(sample, english_labels) == 'ASR'

    labels = ['_', 'A', 'B', ' ']
    samples = np.array([[0.8, 0.2, 0, 0], [0.6, 0.4, 0, 0]], np.float32)
    res, score = prefix_beam_search_native(samples, labels,
                                           return_weights=True)
    assert res == 'A'
    assert score == pytest.approx(0.52)


@pytest.mark.parametrize('trial', range(8))
def test_randomized_matches_python(trial):
    rng = np.random.default_rng(trial)
    labels = ['_', 'a', 'b', 'c', 'd', ' ']
    T = int(rng.integers(4, 24))
    probs = rng.dirichlet(np.ones(len(labels)) * 0.4, size=T).astype(
        np.float32)
    k = int(rng.integers(1, 8))
    beta = float(rng.uniform(0, 3))
    prune = float(rng.uniform(0.0005, 0.05))

    py = prefix_beam_search(probs, labels, k=k, beta=beta, prune=prune,
                            return_weights=True)
    cc = prefix_beam_search_native(probs, labels, k=k, beta=beta,
                                   prune=prune, return_weights=True)
    assert cc[0] == py[0], (trial, cc, py)
    assert cc[1] == pytest.approx(py[1], rel=1e-5)


def test_native_lm_fusion(tmp_path):
    from tests.test_arpa_lm import TINY_ARPA
    from wav2letter_pytorch_tpu.decoding.arpa_lm import ArpaLM
    path = tmp_path / 'tiny.arpa'
    path.write_text(TINY_ARPA)
    lm = ArpaLM(str(path))

    labels = ['_', 't', 'h', 'e', 'c', 'a', ' ']
    T = 8
    probs = np.full((T, len(labels)), 0.01, np.float32)
    for t, ch in enumerate('the '):
        probs[t, labels.index(ch)] = 0.9
    probs[4:, 0] = 0.9

    out = prefix_beam_search_native(probs, labels, lm=lm, k=8, alpha=0.5,
                                    beta=1)
    assert out.startswith('the')

    # Python path with the same LM must agree.
    py = prefix_beam_search(probs, labels,
                            lm=lambda s: 10 ** lm.score(s), k=8, alpha=0.5,
                            beta=1)
    assert out == py


def test_hebrew_labels_roundtrip():
    from wav2letter_pytorch_tpu.data.label_sets import hebrew_labels
    probs = np.zeros((6, len(hebrew_labels)), np.float32)
    probs[0, 1] = 0.9   # א
    probs[1, 2] = 0.9   # ב
    probs[2:, 0] = 0.9
    out = prefix_beam_search_native(probs, hebrew_labels, k=3)
    assert out == 'אב'


def test_native_is_faster():
    rng = np.random.default_rng(0)
    labels = list('_abcdefghijklmnopqrstuvwxyz') + [' ']
    probs = rng.dirichlet(np.ones(len(labels)) * 0.3, size=200).astype(
        np.float32)
    t0 = time.perf_counter()
    py = prefix_beam_search(probs, labels, k=8)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    cc = prefix_beam_search_native(probs, labels, k=8)
    t_cc = time.perf_counter() - t0
    assert cc == py
    assert t_cc < t_py  # typically 10-100x


def test_native_long_input_does_not_underflow():
    """Mirror of the incremental-beam renorm: the C++ DP must decode an
    hour-scale input whose raw probability product underflows double."""
    import numpy as np

    from wav2letter_pytorch_tpu.decoding.beam_native import (
        native_available, prefix_beam_search_native)
    if not native_available():
        import pytest
        pytest.skip('native library not built')
    labels = ['_', 'a', 'b', 'c', ' ']
    ix = {ch: i for i, ch in enumerate(labels)}
    frames = []
    for _ in range(800):                       # 16,000 frames
        for ch in 'ab cab ba ':
            row = np.full(len(labels), 0.01)
            row[ix[ch]] = 0.9
            frames.append(row)
            blank = np.full(len(labels), 0.01)
            blank[0] = 0.9
            frames.append(blank)
    probs = np.stack(frames).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    out = prefix_beam_search_native(probs, labels, k=4, alpha=0.0,
                                    beta=0.0, prune=0.001)
    assert out.split() == ('ab cab ba ' * 800).split()
