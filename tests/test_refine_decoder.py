"""Decoder fine-tune (vq_loss path) on the tiny stdiff model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_diffusion import stdiff_model  # noqa: F401

from ealdm_tpu.data.pipeline import DataLoader, Dataset
from ealdm_tpu.third_stage import ThirdStageModel


class _DumpDS(Dataset):
    def __init__(self, rng, n=4):
        self.lat = rng.randn(n, 16, 16, 4).astype(np.float32)
        self.img = rng.rand(n, 32, 32, 3).astype(np.float32) * 2 - 1

    def __len__(self):
        return len(self.lat)

    def __getitem__(self, i):
        return {"latent": self.lat[i], "img": self.img[i]}


def test_refine_decoder_updates_decoder(stdiff_model, rng):  # noqa: F811
    model, variables, _ = stdiff_model
    ts = ThirdStageModel(model, variables)
    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x),
        variables["params"]["first_stage_model"]["decoder"],
    )
    loader = DataLoader(_DumpDS(rng), batch_size=2)
    gl, dl = ts.refine_decoder(loader, steps=2, lr=1e-4)
    assert np.isfinite(gl) and np.isfinite(dl)
    after = ts.variables["params"]["first_stage_model"]["decoder"]
    moved = jax.tree_util.tree_reduce(
        lambda a, d: a + float(np.abs(np.asarray(d)).sum()),
        jax.tree_util.tree_map(lambda a, b: np.asarray(a) - np.asarray(b),
                               before, after),
        0.0,
    )
    assert moved > 0
