#!/bin/bash
# One-command end-to-end demo: download LibriSpeech dev-clean/test-clean,
# build manifests, train one epoch, then evaluate.
# Parity surface: /root/reference/examples/librispeech.sh.
#
# `bash examples/librispeech.sh --offline` runs the IDENTICAL pipeline on
# the first-party formant-synthesis FLAC corpus instead of downloading —
# the network-free stand-in recorded in benchmarks/full_depth_run.json.
# Adding `--cpu` (any position) pins train/eval to the CPU backend.
set -e

# Resolve the repo root so the demo can run from any working directory
# (outputs — run dir, manifests, corpus — land in $PWD).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

# Flags are position-independent: any arg may be --offline or --cpu.
EXTRA=""
OFFLINE=0
for arg in "$@"; do
    case "$arg" in
        --offline) OFFLINE=1 ;;
        --cpu)     EXTRA="--cpu" ;;
        *) echo "unknown argument: $arg (expected --offline / --cpu)" >&2
           exit 2 ;;
    esac
done

python "$REPO/examples/check_requirements.py"

if [ "$OFFLINE" = 1 ]; then
    python "$REPO/scripts/make_offline_corpus.py" --root ./offline_corpus \
        --n-train 300 --n-test 60 --splits train,test
    TRAIN_CSV=./offline_corpus/train_manifest.csv
    TEST_CSV=./offline_corpus/test_manifest.csv
else
    python -m wav2letter_pytorch_tpu.data.prepare_librispeech \
        --subset dev-clean --manifest_path dev_clean.csv
    python -m wav2letter_pytorch_tpu.data.prepare_librispeech \
        --subset test-clean --manifest_path test_clean.csv
    TRAIN_CSV=dev_clean.csv
    TEST_CSV=test_clean.csv
fi

python "$REPO/train.py" $EXTRA data.train_manifest="$TRAIN_CSV" \
    data.val_manifest="$TEST_CSV" trainer.max_epochs=1

python "$REPO/test.py" $EXTRA --model-path . --test-manifest "$TEST_CSV"

# Optional: train a 3-gram LM on the transcripts and decode with the
# LM-fused beam (no kenlm needed; measured ~1.2 pts WER off greedy on the
# offline corpus — benchmarks/lm_eval.json).
python "$REPO/scripts/build_arpa.py" --manifest "$TRAIN_CSV" --out lm.arpa
python "$REPO/test.py" $EXTRA --model-path . --test-manifest "$TEST_CSV" \
    --lm-path lm.arpa --beam-search-params k=16,alpha=0.4,beta=0

echo "Metrics in ./metrics.csv; TensorBoard logs (if tensorboardX present) in ./tb"
