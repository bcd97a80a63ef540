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


def test_align_ops_match_distance():
    rng = random.Random(7)
    words = ['the', 'cat', 'sat', 'on', 'a', 'mat', 'hat']
    for _ in range(30):
        a = [rng.choice(words) for _ in range(rng.randrange(0, 10))]
        b = [rng.choice(words) for _ in range(rng.randrange(0, 10))]
        ops = levenshtein.align(a, b)
        errs = [o for o in ops if o[0] != 'ok']
        ids = {w: i for i, w in enumerate(words)}
        assert len(errs) == levenshtein.distance([ids[w] for w in a],
                                                 [ids[w] for w in b])
        # alignment reconstructs both sequences
        assert [r for op, r, _ in ops if op in ('ok', 'sub', 'del')] == a
        assert [h for op, _, h in ops if op in ('ok', 'sub', 'ins')] == b
        for op, r, h in ops:
            if op == 'ok':
                assert r == h
            elif op == 'sub':
                assert r != h
