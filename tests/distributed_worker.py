"""Worker for the 2-process DP loss-parity test (launched by
tests/test_distributed.py, one subprocess per rank).

Usage: python distributed_worker.py <process_id> <port> <dataset_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port, ds, out = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # never touch the TPU relay
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from aria_tpu.parallel.distributed import initialize

    initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    from aria_tpu.config import AriaConfig
    from aria_tpu.train.loop import train
    from aria_tpu.train.recipe import Recipe

    r = Recipe(
        output_dir=out,
        dataset_mixer={ds: 1.0},
        per_device_train_batch_size=2,  # global batch; 1 row per process
        gradient_accumulation_steps=1,
        num_train_epochs=1,
        max_seq_length=64,
        learning_rate=1e-3,
        dtype="float32",
        mesh_data=2,
        logging_steps=1,
    )
    train(r, cfg=AriaConfig.tiny(), max_steps=3)


if __name__ == "__main__":
    main()
