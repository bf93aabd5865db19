"""Convergence smokes: training must actually LEARN, not just step.

Everything else in the suite proves per-step correctness (weight-for-weight
loss composition parity, EMA movement, finiteness). These tests close the
remaining gap: optimizer-masking, LR-plumbing, or adaptive-d_weight bugs
that only show up as non-convergence over many steps. Reference semantics:
the diffusion training loop (`/root/reference/ldm/models/diffusion/
ddpm.py:346-372`) and the two-optimizer VAE-GAN
(`/root/reference/ldm/models/autoencoder.py:142-162`).

Design for bounded runtime on CPU: micro models, a fixed synthetic corpus
(so the eps target is exactly learnable), one jitted step re-executed.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def _window_mean(xs, lo, hi):
    return float(np.mean(xs[lo:hi]))


def test_latent_diffusion_loss_converges():
    """A few hundred steps on a fixed corpus must robustly reduce the
    diffusion loss (frozen VQ first stage + trainable STDiff cond tower +
    training-time CFG — the full flagship composition at micro scale), and
    the EMA eval loss must be finite and also improved."""
    from ealdm_tpu.models.ddpm import LatentDiffusion
    from ealdm_tpu.training import init_train_state, make_eval_step, make_train_step

    tiny_unet = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=64,
    )
    tiny_vq = {
        "target": "ldm.models.autoencoder.VQModelInterface",
        "params": {
            "embed_dim": 4, "n_embed": 64,
            "ddconfig": dict(
                double_z=False, z_channels=4, resolution=32, in_channels=3,
                out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[], dropout=0.0,
            ),
        },
    }
    stdiff_cond = {
        "target": "STDiff.models.UnetCond",
        "params": {
            "mid_dim": 4, "emb_dim": 32, "out_dim": 64, "w_dim": 16,
            "f_dim": 1, "hidden_dim": 32,
            "cond_args": {
                "type": "fourier", "dims": 6, "lr": 1, "lin_lr": 0.01,
                "f_manual": [1.84, 672], "include_lin": True,
                "noise": 0, "noise_f": [], "noise_f_int": [],
            },
        },
    }
    model = LatentDiffusion(
        unet_config=tiny_unet,
        first_stage_config=tiny_vq,
        cond_stage_config=stdiff_cond,
        timesteps=20,
        linear_start=0.0015,
        linear_end=0.0195,
        conditioning_key="crossattn",
        cond_stage_key="mixed",
        cond_stage_trainable=True,
        unconditional_guidance_scale=2.0,
    )
    rng_np = np.random.RandomState(0)
    b = 4
    batch = {
        "img": jnp.asarray(rng_np.randn(b, 32, 32, 3), jnp.float32),
        "mixed": {
            "img": jnp.asarray(rng_np.randn(b, 32, 32, 3), jnp.float32),
            "img_random": jnp.asarray(rng_np.randn(b, 32, 32, 3), jnp.float32),
            "flow": jnp.asarray(rng_np.randn(b, 1, 1), jnp.float32),
            "weather": jnp.asarray(rng_np.randn(b, 1, 16), jnp.float32),
            "time": jnp.asarray(rng_np.rand(b, 1), jnp.float32),
        },
    }
    state, opt = init_train_state(model, jr.PRNGKey(0), batch,
                                  learning_rate=2e-3)
    step = jax.jit(make_train_step(model, opt, donate=False))

    n_steps = 300
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jr.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), "non-finite training loss"

    first = _window_mean(losses, 0, 50)
    last = _window_mean(losses, n_steps - 50, n_steps)
    assert last < 0.7 * first, (
        f"diffusion loss did not converge: first50={first:.4f} "
        f"last50={last:.4f} (ratio {last / first:.3f}, need < 0.7)"
    )

    # EMA eval path: finite and also better than the start-of-training loss
    ev = make_eval_step(model)
    val = ev(state.params, state.ema.shadow, batch, jr.PRNGKey(999))
    ema_loss = float(val["loss_simple_ema"])
    assert np.isfinite(ema_loss)
    assert ema_loss < first


def test_vae_gan_two_optimizer_training_converges():
    """Tiny KL VAE-GAN on a fixed corpus: the reconstruction term must
    decrease, the discriminator must stay FROZEN until disc_start (optimizer
    masking), and move off its post-start value afterwards (adaptive
    d_weight + two-optimizer alternation actually training)."""
    from ealdm_tpu.losses import LPIPSWithDiscriminator
    from ealdm_tpu.models.vae import AutoencoderKL
    from ealdm_tpu.training import init_vae_train_state, make_vae_train_step

    dd = dict(
        double_z=True, z_channels=2, resolution=16, in_channels=3,
        out_ch=3, ch=16, ch_mult=[1, 2], num_res_blocks=1,
        attn_resolutions=[], dropout=0.0,
    )
    disc_start = 60
    n_steps = 160
    vae = AutoencoderKL(ddconfig=dd, embed_dim=2)
    loss_mod = LPIPSWithDiscriminator(
        disc_start=disc_start, kl_weight=1e-6, disc_weight=0.5,
        disc_num_layers=1, perceptual_weight=1.0,
    )
    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.rand(4, 16, 16, 3), jnp.float32) * 2 - 1
    state, opt_ae, opt_disc = init_vae_train_state(
        vae, loss_mod, jr.PRNGKey(0), x, learning_rate=2e-3
    )
    step = jax.jit(make_vae_train_step(vae, loss_mod, opt_ae, opt_disc))

    disc0 = jax.device_get(state.loss_params["discriminator"])
    rec, discs = [], []
    batch = {"image": x}
    for i in range(n_steps):
        if i == disc_start - 1:
            # discriminator must not have moved before disc_start
            dnow = jax.device_get(state.loss_params["discriminator"])
            moved = sum(
                float(np.abs(a - b).sum())
                for a, b in zip(jax.tree_util.tree_leaves(disc0),
                                jax.tree_util.tree_leaves(dnow))
            )
            assert moved == 0.0, f"discriminator trained before disc_start ({moved})"
        state, metrics = step(state, batch, jr.PRNGKey(100 + i))
        rec.append(float(metrics["train/rec_loss"]))
        discs.append(float(metrics["train/disc_loss"]))
    assert all(np.isfinite(rec)) and all(np.isfinite(discs))

    first = _window_mean(rec, 0, 20)
    last = _window_mean(rec, n_steps - 20, n_steps)
    assert last < 0.7 * first, (
        f"VAE reconstruction did not converge: first20={first:.4f} "
        f"last20={last:.4f} (ratio {last / first:.3f}, need < 0.7)"
    )

    # discriminator moved off its value at disc_start once training engaged
    dend = jax.device_get(state.loss_params["discriminator"])
    moved = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(disc0),
                        jax.tree_util.tree_leaves(dend))
    )
    assert moved > 0.0, "discriminator never trained after disc_start"
    assert abs(discs[-1] - discs[disc_start]) > 1e-5 or (
        _window_mean(discs, n_steps - 20, n_steps)
        != _window_mean(discs, disc_start, disc_start + 20)
    ), "disc loss never moved after disc_start"
