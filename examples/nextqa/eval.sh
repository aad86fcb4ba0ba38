#!/bin/bash
# nextqa eval one-liner (reference examples/nextqa/eval.sh parity):
# greedy generation through the serving engine, task metric printed as JSON.
MODEL="${MODEL:-out/nextqa_moe_lora_490/checkpoints}"
DATASET="${DATASET:-datasets/nextqa}"

time python -m aria_tpu.cli.eval \
    --task nextqa \
    --dataset "$DATASET" \
    --model-path "$MODEL" \
    --max-image-size 490
