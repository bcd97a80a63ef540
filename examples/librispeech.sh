#!/bin/bash
# One-command end-to-end demo: download LibriSpeech dev-clean/test-clean,
# build manifests, train one epoch, then evaluate.
# Parity surface: /root/reference/examples/librispeech.sh.
set -e

python examples/check_requirements.py

python -m wav2letter_pytorch_tpu.data.prepare_librispeech \
    --subset dev-clean --manifest_path dev_clean.csv
python -m wav2letter_pytorch_tpu.data.prepare_librispeech \
    --subset test-clean --manifest_path test_clean.csv

python train.py data.train_manifest=dev_clean.csv \
    data.val_manifest=test_clean.csv trainer.max_epochs=1

python test.py --model-path . --test-manifest test_clean.csv

# Optional: train a 3-gram LM on the transcripts and decode with the
# LM-fused beam (no kenlm needed; measured ~1.2 pts WER off greedy on the
# offline corpus — benchmarks/lm_eval.json).
python scripts/build_arpa.py --manifest dev_clean.csv --out lm.arpa
python test.py --model-path . --test-manifest test_clean.csv \
    --lm-path lm.arpa --beam-search-params k=16,alpha=0.4,beta=0

echo "Metrics in ./metrics.csv; TensorBoard logs (if tensorboardX present) in ./tb"
