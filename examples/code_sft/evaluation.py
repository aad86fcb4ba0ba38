"""HumanEval-style functional-correctness evaluation.

The analogue of the reference's examples/code_sft/evaluation.py: generate one
completion per problem through the engine, extract the code block, and score
pass@k in the sandboxed executor (aria_tpu/evals/code_exec.py).

Problems jsonl rows: {"task_id", "prompt", "test", "entry_point"} (HumanEval
schema). Usage:

    python examples/code_sft/evaluation.py --dataset problems.jsonl \
        --model-path <ckpt> [--tiny] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import re


def extract_code(text: str) -> str:
    """Prefer the first fenced code block; fall back to the raw text."""
    m = re.search(r"```(?:python)?\n(.*?)```", text, re.DOTALL)
    return m.group(1) if m else text


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="HumanEval-schema problems jsonl")
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--max-seq-len", type=int, default=4096)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    from aria_tpu.cli.infer import load_model_and_tokenizer
    from aria_tpu.engine.generate import Engine
    from aria_tpu.evals.code_exec import evaluate_functional_correctness
    from aria_tpu.evals.runner import make_engine_generate_fn

    problems = {}
    with open(args.dataset) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                problems[row["task_id"]] = row
    if args.limit:
        problems = dict(list(problems.items())[: args.limit])

    ns = argparse.Namespace(
        model_path=args.model_path, tokenizer_path=args.tokenizer_path,
        lora_path=None, lora_r=8, lora_alpha=32.0, tiny=args.tiny,
    )
    params, cfg, tokenizer = load_model_and_tokenizer(ns)
    engine = Engine(params, cfg, max_seq_len=args.max_seq_len)
    generate = make_engine_generate_fn(
        engine, tokenizer, max_new_tokens=args.max_new_tokens,
    )

    samples = []
    for task_id, prob in problems.items():
        prompt = (
            "Complete the following Python function. Reply with the full "
            "function in a ```python code block.\n\n```python\n"
            + prob["prompt"] + "\n```"
        )
        text = generate(prompt, [])
        samples.append({"task_id": task_id, "completion": extract_code(text)})

    metrics = evaluate_functional_correctness(samples, problems, k_values=(1,))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
