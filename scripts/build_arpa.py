#!/usr/bin/env python
"""Train an ARPA n-gram LM from manifest transcripts (or plain text).

    python scripts/build_arpa.py --manifest train.csv --out lm.arpa
    python scripts/build_arpa.py --text corpus.txt --order 4 --out lm.arpa

The written file plugs straight into every LM consumer in the framework:
``test.py --lm-path lm.arpa --beam-search-params ...``, the C++/Python
ARPA scorers, the device beam search's fused LM, and the streaming beam
transcriber. Closes the loop the reference leaves open — it can only
*consume* a kenlm file built elsewhere (/root/reference/decoder.py:249).
Estimator: interpolated Kneser-Ney (decoding/ngram_train.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_sentences(manifest: str = '', text: str = '') -> list[str]:
    if text:
        with open(text, encoding='utf-8') as f:
            return [ln.strip() for ln in f if ln.strip()]
    if manifest.endswith('.csv'):
        import pandas as pd
        df = pd.read_csv(manifest, index_col=0)
        return [str(t) for t in df.text]
    with open(manifest, encoding='utf-8') as f:
        return [json.loads(ln)['text'] for ln in f if ln.strip()]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='train an interpolated-KN ARPA n-gram LM')
    parser.add_argument('--manifest', default='',
                        help='CSV/JSONL manifest; transcripts from `text`')
    parser.add_argument('--text', default='',
                        help='plain text file, one sentence per line')
    parser.add_argument('--out', required=True, help='output .arpa path')
    parser.add_argument('--order', type=int, default=3)
    parser.add_argument('--prune-count', type=int, default=0,
                        help='drop n>=2 grams with raw count <= this')
    args = parser.parse_args(argv)
    if not (args.manifest or args.text):
        parser.error('need --manifest or --text')

    from wav2letter_pytorch_tpu.decoding.arpa_lm import PyArpaLM
    from wav2letter_pytorch_tpu.decoding.ngram_train import train_arpa

    sents = read_sentences(args.manifest, args.text)
    lm = train_arpa(sents, args.out, order=args.order,
                    prune_count=args.prune_count)
    # Self-check: reload through the scorer stack and report train-set
    # perplexity (a wildly high number = something went wrong upstream).
    py = PyArpaLM(args.out)
    logp = n = 0
    for s in sents:
        logp += py.score(s)
        n += len(s.split()) + 1
    ppl = 10 ** (-logp / max(n, 1))
    print(json.dumps({
        'out': args.out, 'order': lm.order, 'sentences': len(sents),
        'vocab': len(lm.vocab),
        'ngrams': [len(lm._kept(k)) for k in range(1, lm.order + 1)],
        'train_ppl': round(ppl, 2),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
