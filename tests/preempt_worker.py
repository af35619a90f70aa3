"""Worker for the 2-process distributed preemption test
(tests/test_multihost.py::test_distributed_preemption_drains_both).

Runs a REAL Trainer.fit over jax.distributed (2 processes x 2 virtual CPU
devices) on the synthetic dataset. The parent SIGTERMs exactly ONE process
mid-epoch; the preemption protocol (parallel.mesh.any_process_flag inside
engine/trainer.train_epoch/fit) must drain BOTH processes at an agreed
batch boundary — a one-sided drain deadlocks the next collective.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_dir = sys.argv[4]
    mode = sys.argv[5]                      # "train" | "resume"
    ckpt_path = sys.argv[6] if len(sys.argv) > 6 else ""

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes

    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.engine.trainer import Trainer

    cfg = get_default_config()
    cfg.arch.max_epochs = 1
    cfg.arch.preempt_sync_every = 4
    cfg.model.name = "SelfSupModel"
    cfg.model.depth_net.name = "DepthResNet"
    cfg.model.depth_net.version = "18"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.flip_lr_prob = 0.0
    cfg.checkpoint.filepath = os.path.join(out_dir, "ckpt")
    cfg.checkpoint.monitor = "depth_gt_abs_rel"
    cfg.checkpoint.mode = "min"
    for split, length, repeat in (("train", 32, 12), ("validation", 8, 1),
                                  ("test", 8, 1)):
        node = cfg.datasets[split]
        node.batch_size = 4
        node.dataset = ["Synthetic"]
        node.path = [""]
        node.split = [""]
        node.depth_type = [""]
        node.synthetic_length = length
        if split == "train":
            node.repeat = [repeat]

    trainer = Trainer(cfg)
    if mode == "resume":
        trainer.resume(ckpt_path)
    trainer.fit()

    with open(os.path.join(out_dir, f"done_{mode}_{process_id}"), "w") as f:
        f.write("ok")
    print(f"### worker {process_id} ({mode}) finished cleanly", flush=True)


if __name__ == "__main__":
    main()
