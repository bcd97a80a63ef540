#!/usr/bin/env python
"""LibriSpeech download + manifest preparation CLI.

Parity surface: /root/reference/data/prepare_librispeech.py (download a
subset tarball from openslr.org, extract, walk transcript files, write a
CSV manifest) with the reference's `--use_relative_path` bug fixed
(prepare_librispeech.py:64 referenced a nonexistent column).

    python -m wav2letter_pytorch_tpu.data.prepare_librispeech \
        --subset dev-clean --manifest_path dev_clean.csv
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import urllib.request


def download_librispeech_subset(subset_name: str, download_dir: str) -> str:
    os.makedirs(download_dir, exist_ok=True)
    tar_path = os.path.join(download_dir, f'{subset_name}.tar.gz')
    if os.path.exists(tar_path):
        print(f'{tar_path} already exists - skipping download')
        return tar_path
    url = f'https://www.openslr.org/resources/12/{subset_name}.tar.gz'
    print(f'Downloading {url} -> {tar_path}')
    urllib.request.urlretrieve(url, tar_path)
    return tar_path


def extract_subset(subset_name: str, download_dir: str, extracted_dir: str):
    target = os.path.join(extracted_dir, 'LibriSpeech', subset_name)
    if os.path.exists(target):
        print(f'{target} already exists, skipping extraction')
        return
    os.makedirs(extracted_dir, exist_ok=True)
    print('Unpacking tarball')
    shutil.unpack_archive(os.path.join(download_dir, f'{subset_name}.tar.gz'),
                          extracted_dir)


def read_transcriptions(subset_name: str, extracted_dir: str):
    """[(flac_path, text)] from LibriSpeech's */*/*.trans.txt layout."""
    rows = []
    pattern = os.path.join(extracted_dir, 'LibriSpeech', subset_name,
                           '*/*/*.txt')
    for transcript_file in sorted(glob.glob(pattern)):
        base = os.path.dirname(transcript_file)
        with open(transcript_file) as f:
            for line in f:
                utt_id, _, text = line.partition(' ')
                rows.append((os.path.join(base, utt_id + '.flac'),
                             text.strip()))
    return rows


def write_manifest(rows, manifest_path: str, absolute_paths: bool = False):
    import pandas as pd
    df = pd.DataFrame(rows, columns=['audio_filepath', 'text'])
    if absolute_paths:
        df.audio_filepath = df.audio_filepath.apply(os.path.abspath)
    df.to_csv(manifest_path)
    print(f'Done - manifest created at {manifest_path} ({len(df)} utterances)')


def main(argv=None):
    parser = argparse.ArgumentParser('LibriSpeech data preparation.')
    parser.add_argument('--subset', default='dev-clean',
                        help='LibriSpeech subset to download')
    parser.add_argument('--download_dir', default='.',
                        help='where the tarball lands')
    parser.add_argument('--extracted_dir', default='./extracted',
                        help='where the archive is unpacked')
    parser.add_argument('--manifest_path', default='df.csv',
                        help='output CSV manifest (feed to train.py)')
    parser.add_argument('--absolute_paths', action='store_true',
                        help='write absolute audio paths into the manifest')
    args = parser.parse_args(argv)

    download_librispeech_subset(args.subset, args.download_dir)
    extract_subset(args.subset, args.download_dir, args.extracted_dir)
    rows = read_transcriptions(args.subset, args.extracted_dir)
    if not rows:
        print('No transcripts found - is the archive complete?',
              file=sys.stderr)
        return 1
    write_manifest(rows, args.manifest_path, args.absolute_paths)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
