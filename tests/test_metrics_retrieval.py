"""Metrics (FID/PSNR/F1/agreement), retrieval k-NN, config system."""
import numpy as np
import pytest

from ealdm_tpu.metrics import FID, frechet_distance, label_agreement, multilabel_f1, psnr


def test_psnr():
    a = np.zeros((4, 4))
    assert psnr(a, a) == float("inf")
    b = np.ones((4, 4)) * 0.1
    assert 20 < psnr(a, b) < 30  # 20*log10(2/0.1) = 26.02


def test_frechet_distance_identity():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    assert frechet_distance(mu, sigma, mu + 1.0, sigma) == pytest.approx(4.0, abs=1e-5)


def test_fid_streaming(rng):
    fid = FID()
    fid.update(rng.randn(100, 8), real=True)
    fid.update(rng.randn(100, 8), real=False)
    same_dist = fid.compute()
    fid2 = FID()
    fid2.update(rng.randn(100, 8), real=True)
    fid2.update(rng.randn(100, 8) + 3.0, real=False)
    assert fid2.compute() > same_dist


def test_multilabel_f1():
    y = np.array([[1, 0, 1], [0, 1, 0]])
    assert multilabel_f1(y, y) == pytest.approx(1.0)
    assert multilabel_f1(y, 1 - y) == pytest.approx(0.0)


def test_label_agreement():
    sim = np.array([[0.9, 0.1], [0.2, 0.8]])
    labels = np.array([[1, 0], [1, 0]])
    assert label_agreement(sim, labels) == pytest.approx(0.5)


def test_searcher_knn(rng):
    from ealdm_tpu.retrieval import Searcher

    db = rng.randn(50, 16).astype(np.float32)
    s = Searcher(db)
    q = db[[3, 7]] + rng.randn(2, 16) * 0.01
    res = s.search(q, k=5)
    assert res["nn_indices"].shape == (2, 5)
    assert res["nn_indices"][0, 0] == 3
    assert res["nn_indices"][1, 0] == 7
    assert res["nn_embeddings"].shape == (2, 5, 16)


def test_searcher_save_load(tmp_path, rng):
    from ealdm_tpu.retrieval import Searcher

    s = Searcher(rng.randn(10, 4).astype(np.float32))
    p = str(tmp_path / "index.npz")
    s.save(p)
    s2 = Searcher.load(p)
    assert s2.num_entries == 10 and s2.dim == 4


def test_config_merge_and_overrides(tmp_path):
    from ealdm_tpu.config import apply_dotlist, deep_merge, load_config

    a = {"model": {"params": {"timesteps": 1000, "lr": 1}}}
    b = {"model": {"params": {"lr": 2}}, "data": {"bs": 4}}
    m = deep_merge(a, b)
    assert m["model"]["params"]["timesteps"] == 1000
    assert m["model"]["params"]["lr"] == 2
    assert m["data"]["bs"] == 4

    m2 = apply_dotlist(m, ["model.params.lr=5e-4", "data.bs=8", "new.flag=true"])
    assert m2["model"]["params"]["lr"] == 5e-4
    assert m2["data"]["bs"] == 8
    assert m2["new"]["flag"] is True

    import yaml

    p1, p2 = tmp_path / "a.yaml", tmp_path / "b.yaml"
    p1.write_text(yaml.safe_dump(a))
    p2.write_text(yaml.safe_dump(b))
    cfg = load_config([str(p1), str(p2)], ["model.params.timesteps=10"])
    assert cfg["model"]["params"]["timesteps"] == 10


def test_registry_resolves_reference_targets():
    from ealdm_tpu.config import resolve_target
    from ealdm_tpu.models import UNetModel, UnetCond, VQModel
    from ealdm_tpu.data.stdiff import StreamCameraDataset

    assert resolve_target("ldm.modules.diffusionmodules.openaimodel.UNetModel") is UNetModel
    assert resolve_target("STDiff.models.UnetCond") is UnetCond
    assert resolve_target("ldm.models.autoencoder.VQModelInterface") is VQModel
    assert (
        resolve_target("STDiff.dataset_wlbl.ImageNetVidDataset")
        is StreamCameraDataset
    )


def test_model_from_config_flagship_yaml():
    from ealdm_tpu.config import load_config, model_from_config
    from ealdm_tpu.models.ddpm import LatentDiffusion

    cfg = load_config(["configs/latent-diffusion/stdiff_cin-ldm-vq-f8.yaml"])
    model, base_lr = model_from_config(cfg["model"])
    assert isinstance(model, LatentDiffusion)
    assert base_lr == pytest.approx(1e-6)
    assert model.conditioning_key == "crossattn"
    assert model.cond_stage_key == "mixed"
    assert model.unet_config["model_channels"] == 256
    assert model.unconditional_guidance_scale == 2.0


def test_searcher_partitioned_mode(rng):
    """Partitioned (ScaNN-tree style) search: with enough probed leaves the
    result matches exact search; with few leaves recall degrades gracefully;
    partitions survive save/load (`train_searcher.py:16-22,96-118`)."""
    from ealdm_tpu.retrieval import Searcher

    db = rng.randn(200, 16).astype(np.float32)
    s = Searcher(db)
    s.build_partitions(num_leaves=8, iters=5)
    assert s.partitioned

    q = rng.randn(3, 16).astype(np.float32)
    exact = s.search(q, k=5)
    # probing every leaf must reproduce the exact result
    approx_full = s.search(q, k=5, leaves_to_search=8)
    np.testing.assert_array_equal(approx_full["nn_indices"], exact["nn_indices"])
    np.testing.assert_allclose(
        approx_full["nn_scores"], exact["nn_scores"], rtol=1e-5, atol=1e-5
    )
    # probing 2 leaves: top-1 should usually still be found (nearest leaf)
    approx = s.search(q, k=5, leaves_to_search=2)
    assert approx["nn_indices"].shape == (3, 5)
    assert np.isfinite(approx["nn_scores"]).all()


def test_searcher_partitions_save_load(tmp_path, rng):
    from ealdm_tpu.retrieval import Searcher

    s = Searcher(rng.randn(60, 8).astype(np.float32))
    s.build_partitions(num_leaves=4, iters=3)
    p = str(tmp_path / "idx.npz")
    s.save(p)
    s2 = Searcher.load(p)
    assert s2.partitioned
    q = rng.randn(2, 8).astype(np.float32)
    a = s.search(q, k=3, leaves_to_search=2)
    b = s2.search(q, k=3, leaves_to_search=2)
    np.testing.assert_array_equal(a["nn_indices"], b["nn_indices"])


def test_auto_build_searcher_thresholds(rng):
    from ealdm_tpu.retrieval import auto_build_searcher

    small = auto_build_searcher({"embedding": rng.randn(50, 4).astype(np.float32)})
    assert not small.partitioned


def test_load_data_from_h5(tmp_path):
    import h5py

    from ealdm_tpu.data.stdiff import load_data_from_h5

    p = str(tmp_path / "cap.h5")
    with h5py.File(p, "w") as f:
        f["image"] = np.zeros((3, 8, 8, 3), np.uint8)
        f["temps"] = np.arange(3.0)
        f["depths"] = np.arange(3.0) * 2
        f["dates"] = np.bytes_(["2021-01-01"] * 3)
    images, temps, depths, dates = load_data_from_h5(p)
    assert images.shape == (3, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(temps), [0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(depths), [0.0, 2.0, 4.0])
    assert len(dates) == 3


def test_searcher_partitioned_padding_sentinels(rng):
    """k larger than the probed leaves' population: tail slots must be
    sentinel -1 indices with -inf scores and zero embeddings, never padded
    index 0 masquerading as a neighbor."""
    from ealdm_tpu.retrieval import Searcher

    s = Searcher(rng.randn(12, 4).astype(np.float32))
    s.build_partitions(num_leaves=6, iters=4)
    q = rng.randn(2, 4).astype(np.float32)
    out = s.search(q, k=10, leaves_to_search=1)
    # fixed [B, min(k, num_entries)] width even when the probed pool
    # (n_probe * max_leaf) is smaller than k — same as the exact path
    assert out["nn_indices"].shape == (2, 10)
    assert out["nn_scores"].shape == (2, 10)
    assert out["nn_embeddings"].shape == (2, 10, 4)
    inval = ~np.isfinite(out["nn_scores"])
    assert inval.any()  # one leaf of ~2 members cannot fill k=10
    np.testing.assert_array_equal(out["nn_indices"][inval], -1)
    assert (out["nn_embeddings"][inval] == 0).all()
    valid = ~inval
    assert (out["nn_indices"][valid] >= 0).all()


def test_auto_searcher_default_probe_persisted(tmp_path, rng):
    """auto_build_searcher's baked-in probe count is actually used by
    search() and survives save/load (ScaNN bakes this into the built
    searcher, train_searcher.py:108-118)."""
    from ealdm_tpu.retrieval import Searcher, auto_build_searcher

    db = {"embedding": rng.randn(300, 8).astype(np.float32)}
    s = auto_build_searcher(db, num_leaves=None)
    # small db: stays exact
    assert not s.partitioned
    s2 = Searcher.from_database(db)
    s2.build_partitions(10)
    s2.default_leaves_to_search = 2
    p = str(tmp_path / "i.npz")
    s2.save(p)
    s3 = Searcher.load(p)
    assert s3.default_leaves_to_search == 2
    q = rng.randn(2, 8).astype(np.float32)
    # implicit probing: same result as explicit leaves_to_search=2
    np.testing.assert_array_equal(
        s3.search(q, k=3)["nn_indices"],
        s3.search(q, k=3, leaves_to_search=2)["nn_indices"],
    )
