"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py. Each process owns 4 virtual CPU devices
(8 global), loads only its half of the global batch, assembles the global
array via parallel.mesh.shard_batch (make_array_from_process_local_data
path), runs one train step, and writes the loss + an all_reduce check to a
JSON file. This is the TPU-equivalent of the reference's multi-GPU mpirun
launch (SURVEY §5.8) exercised without hardware.
"""

import json
import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_dir = sys.argv[4]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    import numpy as np

    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import (
        all_reduce_host_sum, make_mesh, shard_batch)

    # Same model/batch family as tests/test_train_step.py (shared XLA cache).
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import make_batch

    cfg = get_default_config()
    cfg.model.name = "SelfSupModel"
    cfg.model.depth_net.name = "DepthResNet"
    cfg.model.depth_net.version = "18"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.flip_lr_prob = 0.0

    model = setup_model(cfg.model)
    full = make_batch(np.random.default_rng(0), b=8)

    # Host-local shard: contiguous half, matching the process-ordered device
    # layout that make_array_from_process_local_data assembles.
    half = 8 // num_processes
    lo, hi = process_id * half, (process_id + 1) * half
    local = jax.tree_util.tree_map(lambda x: x[lo:hi], full)

    mesh = make_mesh()
    variables = init_model(model, jax.random.PRNGKey(0), local)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh)

    sharded = shard_batch(local, mesh)
    assert sharded["rgb"].shape[0] == 8, "global batch = local x processes"
    state, acc = step(state, zero_metrics(), sharded)
    loss = float(jax.device_get(acc["loss"][0]))

    # Cross-process host reduction (metric protocol building block)
    reduced = all_reduce_host_sum(
        {"x": np.asarray([float(process_id + 1)])})["x"]

    with open(os.path.join(out_dir, f"result_{process_id}.json"), "w") as f:
        json.dump({"loss": loss, "allreduce": float(reduced[0])}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
