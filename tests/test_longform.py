"""Exact long-form chunked inference (serving/longform.py).

The contract is strong: overlap-chunked windows, cropped to their cores and
concatenated, must reproduce the ONE-SHOT offline stack — including the
centered-SAME-padding parity effects that make interior outputs depend on
total length mod stride. Tests sweep odd/even lengths, the dilated
flagship geometry, int8 with static scales, the single-shot fallback, and
mesh-sharded windows.
"""

import numpy as np
import pytest

from wav2letter_pytorch_tpu.serving import (LongFormTranscriber,
                                            calibrate_activation_scales,
                                            fold_batchnorm, longform_logprobs,
                                            offline_forward,
                                            offline_forward_q8,
                                            quantize_folded)
from wav2letter_pytorch_tpu.serving.longform import (plan_windows,
                                                     stack_geometry)
from tests.test_streaming import FLAGSHIP_STRUCTURE, SMALL_LAYERS, _build


@pytest.fixture(scope='module')
def small():
    return _build(SMALL_LAYERS)


def _audio(n, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _global_logp(layers, folded, frontend, audio):
    feats, flens = frontend(audio[None, :], np.array([len(audio)], np.int32))
    t = int(np.asarray(flens)[0])
    logp, _ = offline_forward(layers, folded, np.asarray(feats)[:, :t])
    return np.asarray(logp)[0]


def test_plan_windows_invariants():
    layers = SMALL_LAYERS
    S, P, Q = stack_geometry(layers)
    assert S == 2 and P > 0 and Q > 0
    for t in (731, 732, 733, 1024):
        w, out_w, starts, keeps = plan_windows(t, layers, chunk_frames=40)
        if w is None:
            continue
        assert w % 1 == 0 and (t - w) % S == 0     # parity-matched length
        t_out = keeps[-1][2] + (keeps[-1][1] - keeps[-1][0])
        covered = 0
        for a, (j0, j1, g0) in zip(starts, keeps):
            assert a % S == 0 and 0 <= a <= t - w   # on-grid, in-bounds
            assert 0 <= j0 < j1 <= out_w
            assert g0 == covered                    # cores tile contiguously
            covered += j1 - j0
        assert covered == t_out


@pytest.mark.parametrize('n_samples', [59957, 60000, 60161])
def test_longform_exact_f32(small, n_samples):
    """Odd/even sample counts exercise both SAME-pad parity branches."""
    _, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    audio = _audio(n_samples)
    ref = _global_logp(SMALL_LAYERS, folded, frontend, audio)
    logp, valid = longform_logprobs(SMALL_LAYERS, folded, frontend, audio,
                                    chunk_frames=40, max_batch=3)
    assert logp.shape == ref.shape
    np.testing.assert_allclose(logp, ref, atol=2e-5, rtol=0)
    assert (logp.argmax(-1) == ref.argmax(-1)).all()
    assert valid <= logp.shape[0]


def test_longform_exact_flagship_structure():
    """Real flagship geometry (stride-2 entry + dilated tail) at toy width."""
    _, variables, frontend = _build(FLAGSHIP_STRUCTURE)
    folded = fold_batchnorm(variables, len(FLAGSHIP_STRUCTURE))
    audio = _audio(160157, seed=11)
    ref = _global_logp(FLAGSHIP_STRUCTURE, folded, frontend, audio)
    logp, _ = longform_logprobs(FLAGSHIP_STRUCTURE, folded, frontend, audio,
                                chunk_frames=120, max_batch=4)
    np.testing.assert_allclose(logp, ref, atol=2e-5, rtol=0)
    assert (logp.argmax(-1) == ref.argmax(-1)).all()


def test_longform_single_shot_fallback(small):
    _, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    audio = _audio(8000)
    ref = _global_logp(SMALL_LAYERS, folded, frontend, audio)
    logp, _ = longform_logprobs(SMALL_LAYERS, folded, frontend, audio,
                                chunk_frames=10_000)
    np.testing.assert_allclose(logp, ref, atol=1e-6, rtol=0)


def test_longform_int8_static_scales(small):
    _, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    rng = np.random.default_rng(7)
    cal = (rng.standard_normal((2, 24000)) * 0.1).astype(np.float32)
    scales = calibrate_activation_scales(
        SMALL_LAYERS, folded, frontend, cal, np.array([24000, 20000]))
    q = quantize_folded(folded)
    audio = _audio(60000, seed=5)
    feats, flens = frontend(audio[None, :], np.array([len(audio)], np.int32))
    t = int(np.asarray(flens)[0])
    ref, _ = offline_forward_q8(SMALL_LAYERS, q, np.asarray(feats)[:, :t],
                                act_scales=scales)
    ref = np.asarray(ref)[0]
    logp, _ = longform_logprobs(SMALL_LAYERS, q, frontend, audio,
                                mode='int8_full', act_scales=scales,
                                chunk_frames=40, max_batch=4)
    np.testing.assert_allclose(logp, ref, atol=2e-5, rtol=0)
    assert (logp.argmax(-1) == ref.argmax(-1)).all()


def test_longform_transcriber_matches_offline_decode(small):
    from wav2letter_pytorch_tpu.data.label_sets import english_labels
    from wav2letter_pytorch_tpu.decoding import GreedyDecoder

    _, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    labels = english_labels[:7]
    decoder = GreedyDecoder(labels)
    audio = _audio(60000, seed=9)
    ref = _global_logp(SMALL_LAYERS, folded, frontend, audio)
    valid = ref.shape[0]
    ref_text = decoder.decode(ref[None], sizes=np.array([valid]))[0]

    lf = LongFormTranscriber(SMALL_LAYERS, folded, frontend, decoder,
                             chunk_frames=40, max_batch=3)
    assert lf.transcribe(audio) == ref_text


def test_longform_mesh_sharded(small):
    from wav2letter_pytorch_tpu.parallel import make_mesh

    _, variables, frontend = small
    folded = fold_batchnorm(variables, len(SMALL_LAYERS))
    audio = _audio(60161, seed=13)
    ref = _global_logp(SMALL_LAYERS, folded, frontend, audio)
    logp, _ = longform_logprobs(SMALL_LAYERS, folded, frontend, audio,
                                chunk_frames=40, max_batch=4,
                                mesh=make_mesh(4))
    np.testing.assert_allclose(logp, ref, atol=2e-5, rtol=0)


def test_blank_segments_cover_and_cut():
    from wav2letter_pytorch_tpu.serving.longform import blank_segments

    # 3 speech bursts separated by 30-frame blank runs.
    V = 5
    lp = np.full((300, V), -10.0, np.float32)
    for a, b in ((0, 80), (110, 200), (230, 300)):
        lp[a:b, 2] = 0.0          # argmax = label 2 (speech)
    for a, b in ((80, 110), (200, 230)):
        lp[a:b, 0] = 0.0          # argmax = blank
    segs = blank_segments(lp, min_blank_run=20)
    assert segs[0][0] == 0 and segs[-1][1] == 300
    assert all(s2 == e1 for (_, e1), (s2, _) in zip(segs, segs[1:]))
    assert len(segs) == 3
    # Each cut lands inside a blank run.
    am = lp.argmax(-1)
    for _, e in segs[:-1]:
        assert am[e] == 0


def test_blank_segments_forced_split_on_continuous_speech():
    """No long silences at all: segments must still respect max_frames
    (probability-space beam DPs underflow past a few thousand frames),
    splitting at the longest available blank runs."""
    from wav2letter_pytorch_tpu.serving.longform import blank_segments

    V = 5
    T = 5000
    lp = np.full((T, V), -10.0, np.float32)
    lp[:, 2] = 0.0                      # continuous speech...
    for t in range(0, T, 97):           # ...with 3-frame micro-blanks
        lp[t:t + 3, 0] = 10.0
    segs = blank_segments(lp, min_blank_run=20, max_frames=1200)
    assert segs[0][0] == 0 and segs[-1][1] == T
    assert all(s2 == e1 for (_, e1), (s2, _) in zip(segs, segs[1:]))
    assert max(b - a for a, b in segs) <= 1200


def test_decode_segmented_matches_full_beam():
    """On an in-range sequence with real silences, segmented beam decoding
    reproduces the full-sequence beam text."""
    from wav2letter_pytorch_tpu.data.label_sets import labels_map
    from wav2letter_pytorch_tpu.decoding.decoder import \
        PrefixBeamSearchLMDecoder
    from wav2letter_pytorch_tpu.serving.longform import decode_segmented

    labels = labels_map['english_lowercase']
    ix = {ch: i for i, ch in enumerate(labels)}
    rng = np.random.default_rng(0)
    text = 'the cat sat'
    frames = []
    for word in text.split():
        for ch in word:
            row = np.full(len(labels), 1e-4)
            row[ix[ch]] = 0.8 + 0.1 * rng.random()
            frames.append(row)
            blank = np.full(len(labels), 1e-4)
            blank[0] = 0.9
            frames.append(blank)
        space = np.full(len(labels), 1e-4)
        space[ix[' ']] = 0.9
        frames.append(space)
        for _ in range(30):             # long silence between words
            blank = np.full(len(labels), 1e-4)
            blank[0] = 0.95
            frames.append(blank)
    probs = np.stack(frames)
    probs /= probs.sum(-1, keepdims=True)
    logp = np.log(probs).astype(np.float32)
    dec = PrefixBeamSearchLMDecoder('', labels, k=8, alpha=0.0, beta=0.0)
    full = dec.decode(probs).strip()
    seg = decode_segmented(logp, dec, min_blank_run=20)
    assert seg == full == text


def test_transcribe_long_cli_word_timings(small, tmp_path):
    """scripts/transcribe_long.py --word-timings: hour-scale timestamping
    surface (reference decoder.py:270-302 exposes word timing only through
    the in-process API; here it rides the long-form CLI + JSON record)."""
    import importlib.util
    import json as _json
    import os

    from wav2letter_pytorch_tpu.data.audio_io import write_wav
    from wav2letter_pytorch_tpu.serving import export_serving

    _, variables, frontend = small
    art = export_serving(str(tmp_path / 'art'), SMALL_LAYERS, 7, variables,
                         labels=list('_abcde '),
                         audio_conf={'sample_rate': 16000,
                                     'window_size': 0.02,
                                     'window_stride': 0.01,
                                     'window': 'hamming'})
    audio = _audio(60000, seed=21)
    wav = str(tmp_path / 'long.wav')
    write_wav(wav, audio, 16000)

    spec = importlib.util.spec_from_file_location(
        'transcribe_long',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'transcribe_long.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / 'result.json')
    rc = mod.main(['--artifact', art, '--audio', wav, '--word-timings',
                   '--chunk-frames', '40', '--json-out', out])
    assert rc == 0
    with open(out) as f:
        rec = _json.load(f)
    assert rec['num_words_timed'] == len(rec['word_timings'])
    secs = 60000 / 16000
    prev_start = -1.0
    for word, start, end in rec['word_timings']:
        assert word and ' ' not in word
        assert 0 <= start <= end <= secs + 0.1     # inside the recording
        assert start >= prev_start                 # monotone word order
        prev_start = start


def test_transcribe_long_cli_hotwords(small, tmp_path):
    """--hotwords triggers biased beam decoding on the long-form CLI."""
    import importlib.util
    import json as _json
    import os

    from wav2letter_pytorch_tpu.data.audio_io import write_wav
    from wav2letter_pytorch_tpu.serving import export_serving

    _, variables, frontend = small
    art = export_serving(str(tmp_path / 'art'), SMALL_LAYERS, 7, variables,
                         labels=list('_abcde '),
                         audio_conf={'sample_rate': 16000,
                                     'window_size': 0.02,
                                     'window_stride': 0.01,
                                     'window': 'hamming'})
    audio = _audio(48000, seed=3)
    wav = str(tmp_path / 'in.wav')
    write_wav(wav, audio, 16000)
    spec = importlib.util.spec_from_file_location(
        'transcribe_long2',
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     'scripts', 'transcribe_long.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / 'r.json')
    rc = mod.main(['--artifact', art, '--audio', wav,
                   '--hotwords', 'abba,dad', '--chunk-frames', '40',
                   '--json-out', out])
    assert rc == 0
    with open(out) as f:
        rec = _json.load(f)
    assert rec['decode'] == 'beam_lm'
