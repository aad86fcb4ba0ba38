#!/bin/bash
# nlvr2 eval one-liner (reference examples/nlvr2/eval.sh parity):
# greedy generation through the serving engine, task metric printed as JSON.
MODEL="${MODEL:-out/nlvr2_moe_lora_980/checkpoints}"
DATASET="${DATASET:-datasets/nlvr2}"

time python -m aria_tpu.cli.eval \
    --task nlvr2 \
    --dataset "$DATASET" \
    --model-path "$MODEL" \
    --max-image-size 980
