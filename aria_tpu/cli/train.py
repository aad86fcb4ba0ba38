"""Train CLI: ``python -m aria_tpu.cli.train --config recipes/config_lora.yaml
[--key value ...]`` — the analogue of ``python aria/train.py --config ...``
(reference train.py:212-249) with CLI overrides for any recipe key.
"""

from __future__ import annotations

import argparse
import sys


def parse_overrides(argv):
    out = {}
    i = 0
    while i < len(argv):
        if not argv[i].startswith("--"):
            raise SystemExit(f"unexpected argument {argv[i]}")
        key = argv[i][2:]
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            out[key] = "true"
            i += 1
        else:
            out[key] = argv[i + 1]
            i += 2
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser(add_help=True)
    ap.add_argument("--config", default=None, help="recipe YAML path")
    ap.add_argument("--tiny", action="store_true", help="use the tiny test model config")
    ap.add_argument("--max-steps", type=int, default=None)
    # multi-host (reference multi-node envelope: accelerate_configs/zero2.yaml
    # machine_rank/num_machines); also settable via ARIA_TPU_COORDINATOR etc.
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (enables jax.distributed)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args, rest = ap.parse_known_args(argv)

    from aria_tpu.parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)

    from aria_tpu.config import AriaConfig
    from aria_tpu.train.loop import train
    from aria_tpu.train.recipe import load_recipe

    recipe = load_recipe(args.config, parse_overrides(rest))
    cfg = AriaConfig.tiny() if args.tiny else None
    train(recipe, cfg=cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
