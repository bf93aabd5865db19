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


def test_inpaint_plms(tmp_path):
    """--plms routes the mask/x0 re-noising through the PLMS sampler
    (reference plms.py:147-150); was silently dropped before round 5."""
    outdir = tmp_path / "out"
    r = run_cli([
        "scripts/inpaint.py", "--outdir", str(outdir), "--steps", "3",
        "--tiny", "--plms",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "example0.png" in os.listdir(outdir)


def test_inpaint_committed_examples(tmp_path):
    """No --indir: runs on the committed data/inpainting_examples fixtures
    out of the box (reference ships data/inpainting_examples/, consumed by
    its inpaint.py:11-30)."""
    outdir = tmp_path / "out"
    r = run_cli([
        "scripts/inpaint.py", "--outdir", str(outdir), "--steps", "2",
        "--tiny",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    outs = os.listdir(outdir)
    assert "example0.png" in outs and "example1.png" in outs


def test_committed_font_and_conditioning_examples():
    """data/ ships the font + example_conditioning tree like the reference."""
    assert os.path.exists(os.path.join(REPO, "data", "DejaVuSans.ttf"))
    sr = os.path.join(REPO, "data", "example_conditioning", "superresolution")
    txt = os.path.join(REPO, "data", "example_conditioning", "text_conditional")
    assert any(f.endswith(".png") for f in os.listdir(sr))
    assert any(f.endswith(".txt") for f in os.listdir(txt))
    # log_txt_as_img resolves the committed font (not the PIL fallback)
    from ealdm_tpu.util import log_txt_as_img

    imgs = log_txt_as_img((64, 64), ["committed font"], size=10)
    assert imgs.shape == (1, 64, 64, 3)
    assert (imgs < 0).any()  # black glyphs actually rendered


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

    # forced --num_leaves must persist a probe count, so the loaded index
    # actually searches its partitions instead of silently falling back to
    # the exact path (advisor r3 finding)
    idx2 = str(tmp_path / "index_part.npz")
    r = run_cli([
        "scripts/train_searcher.py", "-d", str(d), "-t", idx2, "--size", "32",
        "--num_leaves", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    s2 = Searcher.load(idx2)
    assert s2.partitioned
    assert s2.default_leaves_to_search == 1  # max(2 // 20, 1)


def test_knn2img_text_query(tmp_path):
    """Real entry point: model from --config, text-query CLIP retrieval,
    [query ; neighbours] conditioning, DDIM CFG sampling + grid (reference
    knn2img.py:309-310,356-397)."""
    db_path = str(tmp_path / "db.npz")
    rng = np.random.RandomState(0)
    np.savez(db_path, embedding=rng.randn(32, 512).astype(np.float32))
    out = str(tmp_path / "rdm")
    r = run_cli([
        "scripts/knn2img.py", "--config", "configs/smoke/rdm_tiny.yaml",
        "--database", db_path, "--prompt", "a stone bridge at dusk",
        "--use_neighbors", "--knn", "3", "--clip_type", "ViT-B/32",
        "--n_samples", "2", "--ddim_steps", "4", "--scale", "2.0",
        "--H", "32", "--W", "32", "--outdir", out,
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = os.listdir(os.path.join(out, "samples"))
    assert len(pngs) == 2
    assert any(f.startswith("grid") for f in os.listdir(out))


def test_knn2img_image_query(tmp_path):
    """CLIP image-query retrieval from a prebuilt searcher index, PLMS
    sampling (reference load_retriever/search, knn2img.py:124,135-161)."""
    from PIL import Image

    from ealdm_tpu.retrieval import Searcher

    rng = np.random.RandomState(1)
    idx_path = str(tmp_path / "index.npz")
    Searcher(rng.randn(24, 512).astype(np.float32)).save(idx_path)
    img_path = str(tmp_path / "query.png")
    Image.fromarray(
        (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    ).save(img_path)
    out = str(tmp_path / "rdm_img")
    r = run_cli([
        "scripts/knn2img.py", "--config", "configs/smoke/rdm_tiny.yaml",
        "--database", idx_path, "--query_image", img_path,
        "--use_neighbors", "--knn", "2", "--clip_type", "ViT-B/32",
        "--n_samples", "1", "--ddim_steps", "4", "--plms",
        "--scale", "2.0", "--H", "32", "--W", "32", "--outdir", out,
        "--skip_grid",
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(os.listdir(os.path.join(out, "samples"))) == 1


def test_main_help():
    r = run_cli(["main.py", "--help"], timeout=60)
    assert r.returncode == 0
    for flag in ("--base", "--train", "--resume", "--scale_lr"):
        assert flag in r.stdout
