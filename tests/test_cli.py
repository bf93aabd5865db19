"""CLI surface smokes (subprocess, hermetic CPU, tiny models)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_ENV = dict(
    os.environ,
    PALLAS_AXON_POOL_IPS="",
    JAX_PLATFORMS="cpu",
    PYTHONUNBUFFERED="1",
)


def run_cli(args, timeout=400):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=timeout,
    )


def test_txt2img_tiny(tmp_path):
    out = str(tmp_path / "txt2img")
    r = run_cli([
        "scripts/txt2img.py", "--config", "configs/smoke/txt2img_tiny.yaml",
        "--prompt", "a small stream", "--n_samples", "2", "--ddim_steps", "4",
        "--outdir", out, "--H", "32", "--W", "32",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = os.listdir(os.path.join(out, "samples"))
    assert len(pngs) == 2


def test_txt2img_plms_tiny(tmp_path):
    out = str(tmp_path / "plms")
    r = run_cli([
        "scripts/txt2img.py", "--config", "configs/smoke/txt2img_tiny.yaml",
        "--prompt", "night river", "--n_samples", "1", "--ddim_steps", "5",
        "--plms", "--outdir", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]


def test_inpaint_tiny(tmp_path):
    from PIL import Image

    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(indir / "example.png")
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255
    Image.fromarray(mask).save(indir / "example_mask.png")

    r = run_cli([
        "scripts/inpaint.py", "--indir", str(indir), "--outdir", str(outdir),
        "--steps", "4", "--tiny",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(outdir / "example.png")
    # known region preserved exactly (composite semantics)
    out = np.asarray(Image.open(outdir / "example.png"))
    np.testing.assert_allclose(out[:4, :4], img[:4, :4], atol=2)


def test_train_searcher_and_search(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        np.save(d / f"im{i}.npy", (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    idx = str(tmp_path / "index.npz")
    r = run_cli([
        "scripts/train_searcher.py", "-d", str(d), "-t", idx, "--size", "32",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    from ealdm_tpu.retrieval import Searcher

    s = Searcher.load(idx)
    assert s.num_entries == 4
    res = s.search(s.embeddings[:2], k=2)
    assert list(res["nn_indices"][:, 0]) == [0, 1]


def test_main_help():
    r = run_cli(["main.py", "--help"], timeout=60)
    assert r.returncode == 0
    for flag in ("--base", "--train", "--resume", "--scale_lr"):
        assert flag in r.stdout
