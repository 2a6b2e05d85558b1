#!/usr/bin/env bash
# Turnkey VQA v2 accuracy-gate run (RUNBOOK.md): preprocessing -> config-1
# train (reference recipe, att_type=base, f32) -> val -> 55.8 gate check.
# Usage: scripts/run_gate.sh /path/to/dataroot [exp_name]
set -euo pipefail

ROOT=${1:?usage: run_gate.sh /path/to/dataroot [exp_name]}
EXP=${2:-updown_vqa_gate}
cd "$(dirname "$0")/.."

for split in train2014 val2014; do
  python preprocessing.py \
    --vqa_path "$ROOT/data/vqa" --coco_path "$ROOT/data/coco" \
    --vocab_path "$ROOT/data/vocab_list.txt" \
    --ans_vocab_path "$ROOT/data/answer_candidate.txt" \
    --feature_path "$ROOT/COCO_feature_36" --save_path "$ROOT/annot" \
    --dataset_type "$split" --save_q 1 --save_a 1 --save_c 1
done

COMMON=(
  --comment "$EXP"
  --encoder_type base --att_type base --predictor_type base
  --decoder_type none --select_path vqa
  --vocab_path "$ROOT/data/vocab_list.txt"
  --ans_path "$ROOT/data/answer_candidate.txt"
  --load_path "$ROOT/annot" --feature_path "$ROOT/COCO_feature_36"
  --pretrained_embed_path "$ROOT/data/glove.6B/glove.6B.300d.txt"
  --train_dtype float32
)
python main.py --mode train "${COMMON[@]}"
python scripts/gate_check.py "checkpoint/$EXP" --threshold 55.8
