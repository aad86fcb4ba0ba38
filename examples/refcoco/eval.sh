#!/bin/bash
# refcoco eval one-liner (reference examples/refcoco/eval.sh parity):
# greedy generation through the serving engine, task metric printed as JSON.
MODEL="${MODEL:-out/refcoco_moe_lora_980/checkpoints}"
DATASET="${DATASET:-datasets/refcoco}"

time python -m aria_tpu.cli.eval \
    --task refcoco \
    --dataset "$DATASET" \
    --model-path "$MODEL" \
    --max-image-size 980
