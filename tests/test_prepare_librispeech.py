"""LibriSpeech preparation pipeline, network-free.

The download itself needs openslr.org; everything after it — extraction,
transcript walking, manifest writing, manifest consumption — is tested here
against a fake LibriSpeech tree (reference surface:
/root/reference/data/prepare_librispeech.py, incl. the fixed
--use_relative_path/absolute-path branch that referenced a nonexistent
dataframe column, prepare_librispeech.py:64).
"""

import os
import tarfile

import pandas as pd

from wav2letter_pytorch_tpu.data.prepare_librispeech import (
    extract_subset, main, read_transcriptions, write_manifest)

SUBSET = 'dev-clean'


def _fake_tree(root, subset=SUBSET):
    """extracted/LibriSpeech/<subset>/<spk>/<chap>/ with trans.txt + flacs."""
    utts = []
    for spk, chap, texts in [('84', '121123', ['HELLO WORLD', 'A CAT SAT']),
                             ('174', '50561', ['THE LAZY DOG'])]:
        d = os.path.join(root, 'LibriSpeech', subset, spk, chap)
        os.makedirs(d, exist_ok=True)
        lines = []
        for i, text in enumerate(texts):
            utt = f'{spk}-{chap}-{i:04d}'
            open(os.path.join(d, utt + '.flac'), 'wb').close()
            lines.append(f'{utt} {text}')
            utts.append((os.path.join(d, utt + '.flac'), text))
        with open(os.path.join(d, f'{spk}-{chap}.trans.txt'), 'w') as f:
            f.write('\n'.join(lines) + '\n')
    return utts


def test_read_transcriptions_and_manifest(tmp_path):
    extracted = tmp_path / 'extracted'
    utts = _fake_tree(str(extracted))
    rows = read_transcriptions(SUBSET, str(extracted))
    assert sorted(rows) == sorted(utts)

    manifest = tmp_path / 'man.csv'
    write_manifest(rows, str(manifest))
    # CSV round trip with the reference's index_col=0 convention
    df = pd.read_csv(manifest, index_col=0)
    assert list(df.columns) == ['audio_filepath', 'text']
    assert len(df) == 3
    assert set(df.text) == {'HELLO WORLD', 'A CAT SAT', 'THE LAZY DOG'}

    # the manifest is directly consumable by the dataset layer
    from wav2letter_pytorch_tpu.data.dataset import ManifestDataset
    ds = ManifestDataset(str(manifest),
                         {'sample_rate': 16000}, 'english_lowercase',
                         validate_rate=False)
    assert len(ds) == 3


def test_absolute_paths_flag(tmp_path):
    extracted = tmp_path / 'extracted'
    _fake_tree(str(extracted))
    rows = [(os.path.relpath(p), t)
            for p, t in read_transcriptions(SUBSET, str(extracted))]
    manifest = tmp_path / 'abs.csv'
    write_manifest(rows, str(manifest), absolute_paths=True)
    df = pd.read_csv(manifest, index_col=0)
    assert all(os.path.isabs(p) for p in df.audio_filepath)


def test_main_with_local_tarball(tmp_path):
    """Full CLI path minus the network: a pre-placed tarball skips the
    download, then extraction + transcript walk + manifest run for real."""
    download = tmp_path / 'dl'
    download.mkdir()
    stage = tmp_path / 'stage'
    _fake_tree(str(stage))
    with tarfile.open(download / f'{SUBSET}.tar.gz', 'w:gz') as tar:
        tar.add(str(stage / 'LibriSpeech'), arcname='LibriSpeech')

    manifest = tmp_path / 'out.csv'
    rc = main(['--subset', SUBSET,
               '--download_dir', str(download),
               '--extracted_dir', str(tmp_path / 'extracted'),
               '--manifest_path', str(manifest)])
    assert rc == 0
    df = pd.read_csv(manifest, index_col=0)
    assert len(df) == 3 and 'THE LAZY DOG' in set(df.text)


def test_main_download_branch_mocked_network(tmp_path, monkeypatch, capsys):
    """The download branch itself (reference prepare_librispeech.py:11-17):
    with no pre-placed tarball, main() must request the openslr subset URL
    and land the tarball at <download_dir>/<subset>.tar.gz before
    extraction. The network is mocked — urlretrieve writes a real tarball
    built from the fake tree — so the full CLI runs end-to-end through the
    same code path a live download takes."""
    import urllib.request

    stage = tmp_path / 'stage'
    _fake_tree(str(stage))
    payload = tmp_path / 'payload.tar.gz'
    with tarfile.open(payload, 'w:gz') as tar:
        tar.add(str(stage / 'LibriSpeech'), arcname='LibriSpeech')
    calls = []

    def fake_urlretrieve(url, filename):
        calls.append((url, filename))
        import shutil
        shutil.copyfile(payload, filename)
        return filename, None

    monkeypatch.setattr(urllib.request, 'urlretrieve', fake_urlretrieve)
    download = tmp_path / 'dl'
    manifest = tmp_path / 'out.csv'
    rc = main(['--subset', SUBSET,
               '--download_dir', str(download),
               '--extracted_dir', str(tmp_path / 'extracted'),
               '--manifest_path', str(manifest)])
    assert rc == 0
    assert calls == [
        (f'https://www.openslr.org/resources/12/{SUBSET}.tar.gz',
         str(download / f'{SUBSET}.tar.gz'))]
    assert (download / f'{SUBSET}.tar.gz').exists()
    df = pd.read_csv(manifest, index_col=0)
    assert len(df) == 3

    # Re-running must hit the skip ("already exists"), not the network.
    capsys.readouterr()
    rc = main(['--subset', SUBSET,
               '--download_dir', str(download),
               '--extracted_dir', str(tmp_path / 'extracted'),
               '--manifest_path', str(manifest)])
    assert rc == 0 and len(calls) == 1
    assert 'skipping download' in capsys.readouterr().out


def test_main_empty_archive_fails(tmp_path):
    download = tmp_path / 'dl'
    download.mkdir()
    empty = tmp_path / 'empty'
    (empty / 'LibriSpeech').mkdir(parents=True)
    with tarfile.open(download / f'{SUBSET}.tar.gz', 'w:gz') as tar:
        tar.add(str(empty / 'LibriSpeech'), arcname='LibriSpeech')
    rc = main(['--subset', SUBSET,
               '--download_dir', str(download),
               '--extracted_dir', str(tmp_path / 'x'),
               '--manifest_path', str(tmp_path / 'out.csv')])
    assert rc == 1


def test_extract_skips_when_present(tmp_path, capsys):
    extracted = tmp_path / 'extracted'
    _fake_tree(str(extracted))
    extract_subset(SUBSET, str(tmp_path), str(extracted))  # no tarball needed
    assert 'skipping extraction' in capsys.readouterr().out
