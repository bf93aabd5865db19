"""One-process full EALDM pipeline through the CLI: `main.py -t` trains the
latent diffusion model, dumps third-stage data for both splits, and runs
ThirdStageModel train+test — the reference's post-fit flow at
`main.py:776-859` (fit -> third-stage dump -> `ThirdStageModel(model).run`).
"""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = dict(
    os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1",
)


@pytest.fixture(scope="module")
def synth_root():
    from ealdm_tpu.data import generate_synthetic_dataset

    if not os.path.isdir("/tmp/ealdm_synth/Site_A_01"):
        generate_synthetic_dataset("/tmp/ealdm_synth", n_days=30, image_size=32)
    return "/tmp/ealdm_synth"


def test_train_to_third_stage(tmp_path, synth_root):
    logroot = str(tmp_path / "logs")
    r = subprocess.run(
        [
            sys.executable, "main.py", "-t",
            "-b", "configs/smoke/stdiff_micro.yaml", "-l", logroot,
            "--max_steps", "2", "--max_epochs", "1", "--log_every", "1",
            "--third_stage", "true", "--third_stage_max_batches", "1",
        ],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    runs = glob.glob(os.path.join(logroot, "*"))
    assert len(runs) == 1
    logdir = runs[0]
    # third-stage dumps for both splits (reference main.py:785-856)
    for split in ("train", "test"):
        files = glob.glob(
            os.path.join(logdir, "third_stage_data", split, "*.npz")
        )
        assert files, f"no third-stage dump for split {split!r}"
    # ThirdStageModel.run wrote its eval artifacts
    # (reference third_stage_model.py:733-856: metrics + flow CSV)
    assert os.path.exists(os.path.join(logdir, "third_stage_results.csv"))
    assert os.path.exists(os.path.join(logdir, "third_stage_flow.csv"))
    # training checkpoints exist alongside
    assert glob.glob(os.path.join(logdir, "checkpoints", "*"))
