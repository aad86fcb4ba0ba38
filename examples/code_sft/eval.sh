#!/bin/bash
# HumanEval-style pass@1 eval (reference examples/code_sft parity): greedy
# completions through the engine, scored in the sandboxed executor.
MODEL="${MODEL:-out/code_sft_moe_lora_980/checkpoints}"
DATASET="${DATASET:-datasets/human_eval/problems.jsonl}"

time python examples/code_sft/evaluation.py \
    --dataset "$DATASET" \
    --model-path "$MODEL"
