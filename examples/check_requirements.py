#!/usr/bin/env python
"""Import smoke test for required (and optional) dependencies.

Parity surface: /root/reference/examples/check_requirements.py.
"""

REQUIRED = ['jax', 'flax', 'optax', 'orbax.checkpoint', 'numpy', 'pandas',
            'yaml', 'wav2letter_pytorch_tpu']
# soundfile is only needed for formats beyond WAV/FLAC — the framework has
# its own FLAC decoder (wav2letter_pytorch_tpu/data/flac.py, native/flac.cpp).
OPTIONAL = ['tensorboardX', 'soundfile', 'kenlm']


def main():
    failed = []
    for mod in REQUIRED:
        try:
            __import__(mod)
        except ImportError as e:
            failed.append((mod, str(e)))
    for mod in OPTIONAL:
        try:
            __import__(mod)
        except ImportError:
            print(f'optional dependency missing (ok): {mod}')
    if failed:
        for mod, err in failed:
            print(f'MISSING required dependency: {mod} ({err})')
        raise SystemExit(1)
    print('All required dependencies import cleanly.')


if __name__ == '__main__':
    main()
