"""log_images bundle + intermediates on the tiny stdiff model (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_diffusion import _mixed_batch, stdiff_model  # noqa: F401

from ealdm_tpu.inference import log_images, sample_images
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.samplers import DDIMConfig, ddim_sample


def test_log_images_bundle(stdiff_model):  # noqa: F811
    model, variables, batch = stdiff_model
    logs = log_images(
        model, variables, batch, jax.random.PRNGKey(0), n=2, steps=4,
        quantize_denoised=True, plot_progressive_rows=True,
    )
    for key in ("inputs", "reconstruction", "conditioning", "samples",
                "diff_samples", "diffusion_row", "progressive_row"):
        assert key in logs, key
        assert np.isfinite(np.asarray(logs[key])).all(), key
    assert logs["samples"].shape == (2, 32, 32, 3)
    # diffusion_row: 6 q_sample stages concatenated widthwise
    assert logs["diffusion_row"].shape[2] == 6 * 32


def test_ddim_return_intermediates():
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5)
    eps = lambda x, t, c: x * 0.1
    x, (x_inter, pred_x0) = ddim_sample(
        eps, jax.random.PRNGKey(0), (1, 4, 4, 2), ddim, DDIMConfig(),
        return_intermediates=True,
    )
    assert x_inter.shape == (5, 1, 4, 4, 2)
    assert pred_x0.shape == (5, 1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_inter[-1]))


def test_sample_images_inpaint_path(stdiff_model):  # noqa: F811
    model, variables, batch = stdiff_model
    z = model.apply(
        variables, batch["img"][:1], jax.random.PRNGKey(0),
        method=model.encode_first_stage,
    )
    mask = jnp.ones(z.shape[:3] + (1,)).at[:, 4:12, 4:12].set(0.0)
    sched = DiffusionSchedule.create(timesteps=model.timesteps,
                                     linear_start=model.linear_start,
                                     linear_end=model.linear_end)
    mixed = {k: v[:1] for k, v in batch["mixed"].items()}
    imgs, zs = sample_images(
        model, variables, jax.random.PRNGKey(1), 1, z.shape[1:], steps=3,
        mask=mask, x0=z, mixed=mixed,
    )
    assert imgs.shape == (1, 32, 32, 3)
