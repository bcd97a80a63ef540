"""Native C++ Levenshtein extension vs pure-Python fallback."""

import random

from wav2letter_pytorch_tpu.decoding import levenshtein


def test_basic_distances():
    assert levenshtein.distance('kitten', 'sitting') == 3
    assert levenshtein.distance('', 'abc') == 3
    assert levenshtein.distance('abc', '') == 3
    assert levenshtein.distance('abc', 'abc') == 0
    assert levenshtein.distance([1, 2, 3], [1, 3]) == 1
    assert levenshtein.distance('שלום', 'שלום') == 0  # non-BMP-safe path


def test_native_matches_python_fallback():
    rng = random.Random(0)
    alphabet = 'abcde '
    for _ in range(50):
        a = ''.join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        b = ''.join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        assert levenshtein.distance(a, b) == levenshtein._py_distance(a, b)


def test_batch_distance():
    pairs = [('kitten', 'sitting'), ('', ''), ('a', 'b'), ('same', 'same')]
    assert levenshtein.batch_distance(pairs) == [3, 0, 1, 0]
