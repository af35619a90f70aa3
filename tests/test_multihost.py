"""Real multi-process data path: 2 jax.distributed CPU processes x 4 virtual
devices must produce the same train-step loss as one process with 8 devices.

Proves the multi-host batch assembly
(``jax.make_array_from_process_local_data`` inside parallel.mesh.shard_batch)
and the cross-process host reduction — the TPU-native equivalent of the
reference's mpirun/Horovod launch (SURVEY §5.8) — without multi-host
hardware.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    workers = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count (4)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(root, "tests", "multihost_worker.py")
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, script, str(pid), "2",
             f"localhost:{port}", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=900)
        outs.append(out.decode())
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    # both processes see the same (replicated) loss and the summed reduction
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
    assert results[0]["allreduce"] == 3.0  # 1 + 2
    assert results[1]["allreduce"] == 3.0

    # single-process reference: same full batch on the 8-device mesh
    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, replicate_state, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch
    from test_train_step import make_batch

    cfg = get_default_config()
    cfg.model.name = "SelfSupModel"
    cfg.model.depth_net.name = "DepthResNet"
    cfg.model.depth_net.version = "18"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.flip_lr_prob = 0.0
    model = setup_model(cfg.model)
    full = make_batch(np.random.default_rng(0), b=8)
    mesh = make_mesh()
    variables = init_model(model, jax.random.PRNGKey(0), full)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    step = make_train_step(model, tx, mesh)
    _, acc = step(state, zero_metrics(), shard_batch(full, mesh))
    ref_loss = float(jax.device_get(acc["loss"][0]))

    assert abs(results[0]["loss"] - ref_loss) < 1e-4 * max(abs(ref_loss), 1e-3), \
        (results[0]["loss"], ref_loss)


@pytest.mark.slow
def test_distributed_preemption_drains_both(tmp_path):
    """SIGTERM ONE of two jax.distributed processes mid-epoch (SURVEY §5.3 /
    VERDICT r4 weak-6): the agreed-drain protocol must bring BOTH processes
    to a clean exit (a one-sided drain deadlocks the next collective), land
    an emergency checkpoint on rank 0, and the 2-process resume from that
    checkpoint must finish the interrupted run."""
    import signal
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tests", "preempt_worker.py")

    def launch(mode, ckpt=""):
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs, logs = [], []
        for pid in range(2):
            log = open(tmp_path / f"{mode}_worker{pid}.log", "wb")
            logs.append(log)
            args = [sys.executable, script, str(pid), "2",
                    f"localhost:{port}", str(tmp_path), mode]
            if ckpt:
                args.append(ckpt)
            procs.append(subprocess.Popen(
                args, env=env, stdout=log, stderr=subprocess.STDOUT))
        return procs, logs

    procs, logs = launch("train")
    # Wait until worker 0 is actually training (model initialized), then a
    # little longer so the signal lands inside epoch 0's batch loop.
    log0 = tmp_path / "train_worker0.log"
    deadline = time.time() + 600
    while time.time() < deadline:
        if log0.exists() and b"Initialized model" in log0.read_bytes():
            break
        if procs[0].poll() is not None:
            break
        time.sleep(2)
    else:
        pytest.fail("worker 0 never started training")
    time.sleep(8)
    procs[0].send_signal(signal.SIGTERM)  # ONE process only

    for p in procs:
        try:
            p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("drain deadlocked: a worker did not exit after the "
                        "one-sided SIGTERM")
    for log in logs:
        log.close()
    for pid, p in enumerate(procs):
        out = (tmp_path / f"train_worker{pid}.log").read_text()
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n{out[-3000:]}"

    ckpts = list((tmp_path / "ckpt").glob("preempt_epoch=*.ckpt"))
    assert ckpts, "no emergency checkpoint written by rank 0"

    # 2-process resume completes the interrupted run end-to-end.
    procs, logs = launch("resume", ckpt=str(ckpts[0]))
    for p in procs:
        try:
            p.wait(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("resume run hung")
    for log in logs:
        log.close()
    for pid, p in enumerate(procs):
        out = (tmp_path / f"resume_worker{pid}.log").read_text()
        assert p.returncode == 0, f"resume worker {pid} rc={p.returncode}:\n{out[-3000:]}"
        assert (tmp_path / f"done_resume_{pid}").exists()
    assert list((tmp_path / "ckpt").glob("epoch=00_*.ckpt")), \
        "resumed run produced no epoch checkpoint"
