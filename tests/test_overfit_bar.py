"""Accuracy-bar proof through the real CLI (VERDICT r2 next-3).

Drives ``cli.train configs/overfit_synthetic.yaml`` — the in-environment
counterpart of the reference's overfit smoke workflow (reference
README.md:41-48 + configs/overfit_kitti.yaml) — to a PINNED metric bar:
self-supervised DepthResNet18+PoseNet must reach depth_gt abs_rel < 0.10 on
the geometry-consistent synthetic set, then ``cli.eval`` must reproduce the
trained checkpoint's metrics. Deterministic (fixed seeds, fixed data).

~25 min on 2 CPUs (768 train steps at 64x96) — slow tier.
"""

import glob
import os
import re
import sys

import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")
BAR = 0.10


def test_selfsup_overfit_reaches_bar(tmp_path, capsys, monkeypatch):
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/overfit_synthetic.yaml")))
    cfg["checkpoint"]["filepath"] = str(tmp_path / "ckpts")
    cfg_path = tmp_path / "overfit.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from packnet_sfm_tpu.cli import train as cli_train

    monkeypatch.setattr(sys, "argv", ["train", str(cfg_path)])
    cli_train.main()

    ckpts = glob.glob(str(tmp_path / "ckpts" / "epoch=*_depth_gt_abs_rel=*.ckpt"))
    assert ckpts, "training saved no checkpoints"
    # the monitored metric is embedded in the checkpoint name (top-k manager)
    values = {c: float(re.search(r"abs_rel=([0-9.]+)\.ckpt", c).group(1))
              for c in ckpts}
    best_ckpt, best = min(values.items(), key=lambda kv: kv[1])
    assert best < BAR, (
        f"self-sup overfit did not reach the abs_rel bar: best {best:.3f} "
        f">= {BAR} (checkpoints: {sorted(values.values())})")

    # eval CLI round-trip on the best checkpoint reproduces the bar
    from packnet_sfm_tpu.cli import eval as cli_eval

    capsys.readouterr()
    monkeypatch.setattr(sys, "argv", ["eval", "--checkpoint", best_ckpt])
    cli_eval.main()
    out = capsys.readouterr().out
    row = [l for l in out.splitlines()
           if l.strip().startswith("|") and " depth_gt " in l]
    assert row, f"eval printed no depth_gt row:\n{out}"
    eval_abs_rel = float(row[0].split("|")[2])
    assert abs(eval_abs_rel - best) < 5e-3, (best, eval_abs_rel, out)


def test_packnet_family_learns(tmp_path, monkeypatch):
    """The FLAGSHIP depth family must be shown to learn end-to-end through
    the real train CLI (VERDICT r4 next-2), not just agree at fixed weights.
    CPU-feasible variant: supervised PackNetSlim01 (SemiSup weight 1.0) on
    synthetic gt depth — measured TPU trajectory abs_rel 0.479 (ep0) ->
    0.327 (ep1); pinned < 0.42 with improvement. The full self-supervised
    flagship recipe + its measured 0.067 result live in
    configs/overfit_packnet_synthetic.yaml (TPU, docs/STATUS.md round 5)."""
    cfg = yaml.safe_load(
        open(os.path.join(REPO, "configs/overfit_packnet_supervised.yaml")))
    cfg["checkpoint"]["filepath"] = str(tmp_path / "ckpts")
    cfg_path = tmp_path / "overfit_packnet.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from packnet_sfm_tpu.cli import train as cli_train

    monkeypatch.setattr(sys, "argv", ["train", str(cfg_path)])
    cli_train.main()

    ckpts = glob.glob(str(tmp_path / "ckpts" / "epoch=*_depth_gt_abs_rel=*.ckpt"))
    assert ckpts, "training saved no checkpoints"
    by_epoch = {int(re.search(r"epoch=(\d+)", c).group(1)):
                float(re.search(r"abs_rel=([0-9.]+)\.ckpt", c).group(1))
                for c in ckpts}
    assert 1 in by_epoch, f"no epoch-1 checkpoint: {sorted(by_epoch)}"
    assert by_epoch[1] < 0.42, (
        f"PackNetSlim supervised overfit missed the bar: {by_epoch[1]:.3f}")
    if 0 in by_epoch:
        assert by_epoch[1] < by_epoch[0], by_epoch
