"""Train -> crash-free stop -> resume continuity through the CLI."""
import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = dict(
    os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1",
)


def run_main(args, timeout=500):
    return subprocess.run(
        [sys.executable, "main.py"] + args,
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def synth_root():
    from ealdm_tpu.data import generate_synthetic_dataset

    if not os.path.isdir("/tmp/ealdm_synth/Site_A_01"):
        generate_synthetic_dataset("/tmp/ealdm_synth", n_days=30, image_size=32)
    return "/tmp/ealdm_synth"


def test_train_then_resume(tmp_path, synth_root):
    logroot = str(tmp_path / "logs")
    r = run_main([
        "-t", "-b", "configs/smoke/stdiff_micro.yaml", "-l", logroot,
        "--max_steps", "2", "--max_epochs", "1", "--third_stage", "false",
        "--log_every", "1",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    runs = glob.glob(os.path.join(logroot, "*"))
    assert len(runs) == 1
    run_dir = runs[0]
    # config dumped, metrics written, checkpoint saved
    assert glob.glob(os.path.join(run_dir, "configs", "*.yaml"))
    metrics = [
        json.loads(line)
        for line in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert any("train/loss" in m for m in metrics)
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "last"))

    # resume: step counter continues past the first run's steps
    r2 = run_main([
        "-t", "-r", run_dir, "--max_steps", "4", "--max_epochs", "2",
        "--third_stage", "false", "--log_every", "1",
    ])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Restored state at step" in r2.stdout
    metrics2 = [
        json.loads(line)
        for line in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    steps = [m["step"] for m in metrics2 if "train/loss" in m]
    assert max(steps) > 2  # continued beyond the first run
