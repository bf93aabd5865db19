"""Third-stage dataset/model over synthetic dumps (tiny, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.data.pipeline import DataLoader
from ealdm_tpu.third_stage import ThirdStageDataset, ThirdStageModel


@pytest.fixture(scope="module")
def dumps(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts")
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        d = root / "third_stage_data" / split
        d.mkdir(parents=True)
        for i in range(2):
            np.savez(
                d / f"batch_{i:05d}.npz",
                img=rng.randn(2, 32, 32, 3).astype(np.float32),
                latent=rng.randn(2, 16, 16, 4).astype(np.float32),
                w=rng.randn(2, 1, 16).astype(np.float32),
                wlabel_nxt=(rng.rand(2, 10) > 0.7).astype(np.float32),
                flabel=rng.randn(2, 1, 1).astype(np.float32),
                flabel_nxt=rng.randn(2, 1).astype(np.float32),
                t=rng.rand(2, 1).astype(np.float32),
            )
    return str(root)


def test_third_stage_dataset(dumps):
    ds = ThirdStageDataset(os.path.join(dumps, "third_stage_data", "train"))
    assert len(ds) == 4
    item = ds[0]
    assert item["latent"].shape == (16, 16, 4)
    assert item["wlabel_nxt"].shape == (10,)


class _FakeDiffusion:
    """Stands in for LatentDiffusion: decode = upsample latent to RGB."""

    def decode_first_stage(self, z):  # referenced via method=
        raise NotImplementedError

    def apply(self, variables, z, method=None):
        up = jnp.repeat(jnp.repeat(z[..., :3], 2, axis=1), 2, axis=2)
        return jnp.tanh(up)


def test_third_stage_train_and_test(dumps, tmp_path):
    model = ThirdStageModel(_FakeDiffusion(), {"params": {}}, lr=1e-3,
                            clip_image_size=32)
    train_ds = ThirdStageDataset(os.path.join(dumps, "third_stage_data", "train"))
    before = jax.tree_util.tree_map(lambda x: x, model.head_params)
    model.train(DataLoader(train_ds, 2), epochs=1, log_every=1)
    # fc heads moved, trunk frozen
    d_fc = float(
        jnp.abs(
            model.head_params["fc_w"]["kernel"] - before["fc_w"]["kernel"]
        ).sum()
    )
    d_trunk = float(
        jnp.abs(
            model.head_params["trunk"]["conv1"]["kernel"]
            - before["trunk"]["conv1"]["kernel"]
        ).sum()
    )
    assert d_fc > 0 and d_trunk == 0.0
    results = model.test(
        DataLoader(ThirdStageDataset(os.path.join(dumps, "third_stage_data", "test")), 2),
        str(tmp_path),
    )
    for k in ("fid", "weather_f1", "clip_agreement", "head_agreement", "flow_mse"):
        assert k in results and np.isfinite(results[k]), k
    assert os.path.exists(tmp_path / "third_stage_flow.csv")
    assert os.path.exists(tmp_path / "third_stage_results.csv")


def test_run_clamps_batch_size_to_tiny_dumps(dumps):
    """run() must not silently drop the only (partial) batch when the dump
    is smaller than the default head batch size (drop_last loader)."""
    model = ThirdStageModel(_FakeDiffusion(), {"params": {}}, lr=1e-3,
                            clip_image_size=32)
    results = model.run(dumps, batch_size=64)  # 4 samples << 64
    for k in ("fid", "weather_f1", "clip_agreement", "flow_mse"):
        assert k in results, k


def test_clip_zero_shot_scorer_is_image_based_and_pinned():
    """The zero-shot scorer scores IMAGE content against class-name text
    embeddings (reference third_stage_model.py:774-789) — it is not the fc_w
    head evaluated on itself, and its parameters are pinned (seed 0) so
    scores are comparable across runs/seeds."""
    from ealdm_tpu.third_stage import CLIPZeroShot, WEATHER_CLASSES

    scorer = CLIPZeroShot(image_size=32)
    rng = np.random.RandomState(0)
    imgs = np.tanh(rng.randn(2, 32, 32, 3)).astype(np.float32)
    logits = scorer.logits(imgs)
    assert logits.shape == (2, len(WEATHER_CLASSES))
    # different images -> different similarity profiles
    assert not np.allclose(logits[0], logits[1])
    # pinned: a fresh scorer reproduces the same logits exactly
    logits2 = CLIPZeroShot(image_size=32).logits(imgs)
    np.testing.assert_allclose(logits, logits2)
    # and it disagrees with a head-on-itself scorer: a 'perfect' head gives
    # agreement 1.0 by construction while the zero-shot score is image-driven
    from ealdm_tpu.metrics import label_agreement

    labels = np.zeros((2, len(WEATHER_CLASSES)), np.float32)
    labels[0, 3] = 1.0
    labels[1, 7] = 1.0
    assert label_agreement(labels.copy(), labels) == 1.0  # head-on-itself
    assert label_agreement(logits, labels) in (0.0, 0.5, 1.0)


def test_clip_zero_shot_weight_reload_affects_traced_shapes():
    """Loading weights AFTER the image tower was already traced for a shape
    must change subsequent logits for that same shape — the jit cache holds
    the trace, not the parameters (regression: params were once baked into
    the closure as constants)."""
    from ealdm_tpu.third_stage import CLIPZeroShot

    scorer = CLIPZeroShot(image_size=32)
    rng = np.random.RandomState(1)
    imgs = np.tanh(rng.randn(2, 32, 32, 3)).astype(np.float32)
    before = scorer.logits(imgs)  # traces _embed_images for this shape
    # swap in visibly different visual-tower params (same structure)
    import jax

    scorer._image_params = jax.tree_util.tree_map(
        lambda x: x * 0.5 + 0.01, scorer._image_params
    )
    after = scorer.logits(imgs)
    assert not np.allclose(before, after)


def test_fid_trunk_is_seed_independent():
    """FID features must come from the pinned seed-0 trunk, not the per-run
    head trunk, so FID orderings are comparable across runs."""
    m1 = ThirdStageModel(_FakeDiffusion(), {"params": {}}, seed=1, clip_image_size=32)
    m2 = ThirdStageModel(_FakeDiffusion(), {"params": {}}, seed=2, clip_image_size=32)
    x = jnp.ones((1, 16, 16, 3)) * 0.3
    np.testing.assert_allclose(
        np.asarray(m1._fid_feats(x)), np.asarray(m2._fid_feats(x))
    )
    # while the head trunks DO differ across seeds
    assert not np.allclose(
        np.asarray(m1.head_params["trunk"]["conv1"]["kernel"]),
        np.asarray(m2.head_params["trunk"]["conv1"]["kernel"]),
    )
