"""Two-optimizer VAE-GAN training (first-stage autoencoders), fused pjit step.

Parity target: the Lightning alternating-optimizer protocol of
`/root/reference/ldm/models/autoencoder.py:142-162,330-372` with Adam
betas (0.5, 0.9) (`:410-417`) and the adaptive d_weight of
`contperceptual.py:32-43`. In JAX both updates run inside ONE jitted step:

  1. forward the autoencoder
  2. adaptive d_weight from grads of (nll, g) w.r.t. the reconstruction
  3. generator grad/update over the AE params (loss params constant)
  4. discriminator grad/update over the disc params (recon stop-gradient)

Note (parity quirk): the reference's opt_ae does NOT include the loss
module's logvar despite the comment saying so — logvar stays at init. The
same holds here (logvar lives in the frozen loss-param tree).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.contperceptual import LPIPSWithDiscriminator, adaptive_d_weight
from ..losses.vqperceptual import VQLPIPSWithDiscriminator
from ..models.vae import AutoencoderKL, VQModel


@dataclasses.dataclass
class VAETrainState:
    step: jnp.ndarray
    ae_params: Any
    loss_params: Any        # LPIPS + logvar + discriminator (disc subtree trained)
    opt_ae_state: Any
    opt_disc_state: Any

    def tree_flatten(self):
        return (
            self.step, self.ae_params, self.loss_params,
            self.opt_ae_state, self.opt_disc_state,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    VAETrainState, VAETrainState.tree_flatten, VAETrainState.tree_unflatten
)


def init_vae_train_state(
    vae,
    loss_module,
    rng: jax.Array,
    example_image: jnp.ndarray,
    learning_rate: float,
    lr_g_factor: float = 1.0,
) -> Tuple[VAETrainState, optax.GradientTransformation, optax.GradientTransformation]:
    r1, r2, r3 = jax.random.split(rng, 3)
    is_kl = isinstance(vae, AutoencoderKL)
    if is_kl:
        ae_vars = vae.init({"params": r1}, example_image, r2)
        rec, posterior = vae.apply(ae_vars, example_image, r2)
        loss_vars = loss_module.init(
            {"params": r3}, example_image, rec, posterior, 0
        )
    else:
        ae_vars = vae.init({"params": r1}, example_image)
        rec, qloss, _ = vae.apply(ae_vars, example_image)
        loss_vars = loss_module.init({"params": r3}, qloss, example_image, rec, 0)

    opt_ae = optax.adam(learning_rate * lr_g_factor, b1=0.5, b2=0.9)
    opt_disc = optax.adam(learning_rate, b1=0.5, b2=0.9)
    ae_params = ae_vars["params"]
    loss_params = loss_vars["params"]
    if "perceptual" in loss_params:
        # auto-install pretrained VGG-LPIPS weights from $EALDM_WEIGHTS_DIR,
        # the file counterpart of the reference's runtime download
        # (contperceptual.py:4) — same mechanism as the FID/CLIP trunks
        from ..weights import find_weights, load_lpips_params

        if find_weights("lpips") is not None:
            loss_params = dict(loss_params)
            loss_params["perceptual"] = load_lpips_params(
                loss_params["perceptual"]
            )
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params,
        loss_params=loss_params,
        opt_ae_state=opt_ae.init(ae_params),
        opt_disc_state=opt_disc.init(loss_params["discriminator"]),
    )
    return state, opt_ae, opt_disc


def make_vae_train_step(
    vae,
    loss_module,
    opt_ae: optax.GradientTransformation,
    opt_disc: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    is_kl = isinstance(vae, AutoencoderKL)

    def forward(ae_params, x, rng):
        if is_kl:
            rec, posterior = vae.apply({"params": ae_params}, x, rng)
            return rec, posterior
        rec, qloss, ind = vae.apply({"params": ae_params}, x)
        return rec, (qloss, ind)

    def loss_apply(loss_params, method, *args, **kwargs):
        return loss_module.apply({"params": loss_params}, *args, method=method, **kwargs)

    def step_fn(state: VAETrainState, batch, rng):
        x = batch["image"]
        gstep = state.step
        lp = state.loss_params

        # ---- adaptive d_weight from grads w.r.t. the reconstruction
        rec0, aux0 = forward(state.ae_params, x, rng)

        if is_kl:
            def nll_of(r):
                wn, _, _ = loss_apply(lp, loss_module.nll_loss, x, r)
                return wn
        else:
            def nll_of(r):
                n, _ = loss_apply(lp, loss_module.nll_loss, x, r)
                return n

        def g_of(r):
            return loss_apply(lp, loss_module.g_loss, r)

        nll_grad = jax.grad(nll_of)(rec0)
        g_grad = jax.grad(g_of)(rec0)
        d_weight = jax.lax.stop_gradient(
            adaptive_d_weight(nll_grad, g_grad, loss_module.disc_weight)
        )

        # ---- generator update
        def gen_loss_fn(ae_params):
            rec, aux = forward(ae_params, x, rng)
            if is_kl:
                loss, log = loss_apply(
                    lp, loss_module.generator_loss, x, rec, aux, gstep, d_weight
                )
            else:
                qloss, ind = aux
                loss, log = loss_apply(
                    lp, loss_module.generator_loss, qloss, x, rec, gstep,
                    d_weight, None, ind,
                )
            return loss, (log, rec)

        (g_total, (g_log, rec)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.ae_params)
        ae_updates, opt_ae_state = opt_ae.update(
            g_grads, state.opt_ae_state, state.ae_params
        )
        ae_params = optax.apply_updates(state.ae_params, ae_updates)

        # ---- discriminator update (recon frozen)
        def disc_loss_fn(disc_params):
            lp2 = dict(lp)
            lp2["discriminator"] = disc_params
            d_loss, d_log = loss_apply(
                lp2, loss_module.discriminator_loss, x, rec, gstep
            )
            return d_loss, d_log

        (d_total, d_log), d_grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            lp["discriminator"]
        )
        disc_updates, opt_disc_state = opt_disc.update(
            d_grads, state.opt_disc_state, lp["discriminator"]
        )
        loss_params = dict(lp)
        loss_params["discriminator"] = optax.apply_updates(
            lp["discriminator"], disc_updates
        )

        metrics = {**g_log, **d_log, "aeloss": g_total, "discloss": d_total}
        new_state = VAETrainState(
            step=state.step + 1,
            ae_params=ae_params,
            loss_params=loss_params,
            opt_ae_state=opt_ae_state,
            opt_disc_state=opt_disc_state,
        )
        return new_state, metrics

    if mesh is not None:
        batch_spec = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn, in_shardings=(None, batch_spec, NamedSharding(mesh, P()))
        )
    return jax.jit(step_fn)


def make_vae_eval_step(vae, loss_module):
    """Validation losses for both branches (reference `_validation_step`)."""
    is_kl = isinstance(vae, AutoencoderKL)

    def eval_fn(state: VAETrainState, batch, rng):
        x = batch["image"]
        lp = state.loss_params
        if is_kl:
            rec, posterior = vae.apply({"params": state.ae_params}, x, rng)
            _, log_ae = loss_module.apply(
                {"params": lp}, x, rec, posterior, state.step, 1.0,
                method=loss_module.generator_loss, split="val",
            )
            _, log_d = loss_module.apply(
                {"params": lp}, x, rec, state.step,
                method=loss_module.discriminator_loss, split="val",
            )
        else:
            rec, qloss, ind = vae.apply({"params": state.ae_params}, x)
            _, log_ae = loss_module.apply(
                {"params": lp}, qloss, x, rec, state.step, 1.0, None, ind,
                method=loss_module.generator_loss, split="val",
            )
            _, log_d = loss_module.apply(
                {"params": lp}, x, rec, state.step,
                method=loss_module.discriminator_loss, split="val",
            )
        return {**log_ae, **log_d}

    return jax.jit(eval_fn)
