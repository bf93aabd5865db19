"""Losses + two-optimizer VAE GAN training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.losses import (
    LPIPS,
    LPIPSWithDiscriminator,
    NLayerDiscriminator,
    VQLPIPSWithDiscriminator,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from ealdm_tpu.models.vae import AutoencoderKL, VQModel
from ealdm_tpu.training import (
    init_vae_train_state,
    make_vae_eval_step,
    make_vae_train_step,
)

TINY_DD = dict(
    double_z=True, z_channels=2, resolution=32, in_channels=3, out_ch=3,
    ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
)


def test_hinge_and_vanilla_d_loss():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    # perfect discriminator: hinge loss 0
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    assert float(vanilla_d_loss(real, fake)) < 0.2
    # fooled discriminator: high loss
    assert float(hinge_d_loss(-real, -fake)) == pytest.approx(3.0)


def test_adopt_weight_warmup():
    assert float(adopt_weight(1.0, 5, threshold=10)) == 0.0
    assert float(adopt_weight(1.0, 10, threshold=10)) == 1.0
    # traced step works
    assert float(jax.jit(lambda s: adopt_weight(2.0, s, 3))(jnp.asarray(2))) == 0.0


def test_lpips_is_a_distance(rng):
    m = LPIPS()
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    y = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) * 2 - 1
    params = m.init(jax.random.PRNGKey(0), x, y)
    d_same = m.apply(params, x, x)
    d_diff = m.apply(params, x, y)
    assert float(d_same[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(d_diff[0]) > 0


def test_discriminator_output_is_patch_logits(rng):
    m = NLayerDiscriminator(n_layers=2, ndf=16)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 32  # downsampled patch map


def test_kl_vae_gan_train_step(rng):
    vae = AutoencoderKL(ddconfig=TINY_DD, embed_dim=2)
    loss_mod = LPIPSWithDiscriminator(
        disc_start=0, kl_weight=1e-6, disc_weight=0.5, disc_num_layers=1,
        perceptual_weight=1.0,
    )
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)) * 2 - 1
    state, opt_ae, opt_disc = init_vae_train_state(
        vae, loss_mod, jax.random.PRNGKey(0), x, learning_rate=1e-3
    )
    step = make_vae_train_step(vae, loss_mod, opt_ae, opt_disc)
    batch = {"image": x}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    for k in ("aeloss", "discloss", "train/rec_loss", "train/kl_loss",
              "train/d_weight", "train/g_loss", "train/disc_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # both param sets moved
    d_ae = jax.tree_util.tree_reduce(
        lambda a, d: a + float(jnp.abs(d).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state.ae_params, state2.ae_params),
        0.0,
    )
    d_disc = jax.tree_util.tree_reduce(
        lambda a, d: a + float(jnp.abs(d).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b,
            state.loss_params["discriminator"],
            state2.loss_params["discriminator"],
        ),
        0.0,
    )
    assert d_ae > 0 and d_disc > 0
    # LPIPS (perceptual) params must NOT move (frozen oracle net)
    d_lpips = jax.tree_util.tree_reduce(
        lambda a, d: a + float(jnp.abs(d).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b,
            state.loss_params["perceptual"],
            state2.loss_params["perceptual"],
        ),
        0.0,
    )
    assert d_lpips == 0.0
    # eval step produces val metrics
    ev = make_vae_eval_step(vae, loss_mod)
    val = ev(state2, batch, jax.random.PRNGKey(2))
    assert "val/rec_loss" in val


def test_vq_vae_gan_train_step(rng):
    dd = dict(TINY_DD, double_z=False, z_channels=3)
    vae = VQModel(ddconfig=dd, n_embed=16, embed_dim=3)
    loss_mod = VQLPIPSWithDiscriminator(
        disc_start=0, disc_num_layers=1, codebook_weight=1.0, n_classes=16
    )
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)) * 2 - 1
    state, opt_ae, opt_disc = init_vae_train_state(
        vae, loss_mod, jax.random.PRNGKey(0), x, learning_rate=1e-3
    )
    step = make_vae_train_step(vae, loss_mod, opt_ae, opt_disc)
    state2, metrics = step(state, {"image": x}, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["aeloss"]))
    assert np.isfinite(float(metrics["train/quant_loss"]))
    assert float(metrics["train/perplexity"]) > 0
