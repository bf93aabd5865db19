"""Inference pipelines: conditioning -> sampler scan -> decode, as single
jitted programs, plus the `log_images` visualization bundle.

Parity targets: `LatentDiffusion.log_images` (`/root/reference/ldm/models/
diffusion/ddpm.py:1287-1407`: inputs, reconstruction, conditioning, samples,
quantized 'diff_samples', inpaint/outpaint, progressive rows) and
`sample_log` (`:1267-1284`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.ddpm import LatentDiffusion
from .ops.schedules import DDIMSchedule, DiffusionSchedule
from .samplers import DDIMConfig, ddim_sample, plms_sample


def split_streams(eps_fn, num_streams: int):
    """Wrap a denoiser so each call runs `num_streams` INDEPENDENT
    sub-batch chains, concatenated back.

    TPU latency-hiding: the v5e executes one op stream with large fixed
    per-op issue latency (isolated conv chains measure ~56 TF/s at a
    constant ~340 us/conv while pipelined in-program convs reach
    ~190 TF/s). Giving XLA independent dependency chains lets it
    interleave them: on the 256^2 DDIM-50 CFG bench 1/2/3 streams measure
    10.26/10.60/10.70 img/s (saturating at 3-4). Use when batch is a
    multiple of `num_streams` x 8 so each chain keeps sublane-aligned
    CFG batches; identical numerics to the unsplit call."""
    if num_streams <= 1:
        return eps_fn

    def split_fn(x, t, ctx, *extra):
        assert x.shape[0] % num_streams == 0, (
            f"batch {x.shape[0]} not divisible by {num_streams} streams"
        )
        n = x.shape[0] // num_streams
        # ctx may be a pytree of batch-leading leaves (hoisted K/V);
        # per-step extras (hoisted emb rows) are batch-free and shared.
        outs = [
            eps_fn(
                x[i * n:(i + 1) * n],
                t[i * n:(i + 1) * n],
                jax.tree_util.tree_map(
                    lambda a: a[i * n:(i + 1) * n], ctx
                ),
                *extra,
            )
            for i in range(num_streams)
        ]
        return jnp.concatenate(outs, axis=0)

    return split_fn


def make_eps_fn(model: LatentDiffusion, variables):
    def eps_fn(x, t, ctx):
        return model.apply(variables, x, t, ctx, method=model.apply_model)

    return eps_fn


def hoist_invariants(model: LatentDiffusion, variables, ddim, cond=None,
                     uncond=None, want_emb_tables: bool = True):
    """Hoist the step-invariant work of a DDIM sampling chain out of the scan.

    Two invariants are precomputed ONCE instead of per step (the reference
    re-executes both inside every one of its S sampler steps):
      * cross-attn K/V of the constant conditioning context — every
        SpatialTransformer's `to_k(ctx)`/`to_v(ctx)`
        (ref `ldm/modules/attention.py:152-193`);
      * the timestep-embedding MLP + every ResBlock's emb projection for all
        S known timesteps, as [S, ...] tables scanned alongside alpha/sigma
        (ref `openaimodel.py:184-205,468-473`).
    On a latency-bound chip (v5e: fixed ~340us issue cost per serial op,
    docs/PERF.md) this deletes ~50 small ops per step at numerically
    equivalent results (tested to 1e-5, tests/test_hoisted_sampling.py).

    Returns (eps_fn, cond', uncond', extra_tables) ready for
    `ddim_sample(eps_fn, ..., cond=cond', uncond=uncond',
    extra_tables=extra_tables)`. Falls back to the plain eps_fn (with
    cond/uncond passed through and extra_tables=None) when hoisting does not
    apply: non-crossattn conditioning, split-input patched inference, or a
    class-conditional UNet.
    """
    from .models.ddpm import build_unet
    from .models.unet import precompute_context_kv, precompute_emb_tables

    unet = build_unet(model.unet_config, dtype=model.dtype)
    if (
        model.conditioning_key not in (None, "crossattn")
        or model.split_input_params is not None
        or unet.num_classes is not None
    ):
        return make_eps_fn(model, variables), cond, uncond, None

    params = variables["params"]["model"]["diffusion_model"]
    # want_emb_tables=False: the caller's sampler cannot consume per-step
    # tables (PLMS evaluates off the ddim.timesteps grid) — skip the work
    emb_tables = (
        precompute_emb_tables(unet, params, ddim.timesteps)
        if want_emb_tables else None
    )
    kv = None
    if model.conditioning_key == "crossattn" and unet.use_spatial_transformer:
        if cond is not None:
            cond = precompute_context_kv(unet, params, cond)
        if uncond is not None:
            uncond = precompute_context_kv(unet, params, uncond)
        kv = True

    def eps_fn(x, t, ctx, emb_rows=None):
        return model.apply(
            variables, x, t, None if kv else ctx,
            context_kv=ctx if kv else None, emb_tables=emb_rows,
            method=model.apply_model,
        )

    return eps_fn, cond, uncond, emb_tables


def encode_cfg_conditioning(model: LatentDiffusion, variables, mixed: Dict):
    """(c_neg, c_pos) for the EALDM negative-pairing convention; the image
    encodes run as one 2N-batched first-stage call."""
    return model.apply(
        variables, mixed, method=model.get_learned_conditioning_pair
    )


def sample_images(
    model: LatentDiffusion,
    variables,
    rng: jax.Array,
    batch_size: int,
    latent_shape,
    steps: int = 50,
    eta: float = 1.0,
    guidance_scale: Optional[float] = None,
    mixed: Optional[Dict] = None,
    cond: Optional[jnp.ndarray] = None,
    uncond: Optional[jnp.ndarray] = None,
    sampler: str = "ddim",
    quantize_denoised: bool = False,
    decode: bool = True,
    x_T=None,
    mask=None,
    x0=None,
    hoist: bool = True,
):
    """Full pipeline; returns decoded images (or latents if decode=False).

    hoist: precompute the step-invariant cross-attn K/V + timestep-embedding
    tables outside the sampler scan (numerically equivalent, tested to 1e-5; see hoist_invariants)."""
    sched = DiffusionSchedule.create(
        timesteps=model.timesteps,
        beta_schedule=model.beta_schedule,
        linear_start=model.linear_start,
        linear_end=model.linear_end,
        cosine_s=model.cosine_s,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=eta)
    if guidance_scale is None:
        guidance_scale = model.unconditional_guidance_scale
    cfg = DDIMConfig(
        num_steps=steps, eta=eta, unconditional_guidance_scale=guidance_scale,
        parameterization=model.parameterization,
    )
    if mixed is not None and cond is None:
        uncond, cond = encode_cfg_conditioning(model, variables, mixed)

    if hoist:
        # PLMS consumes the hoisted K/V but not the emb tables (its first
        # step evaluates at t_next, off the per-step table grid).
        eps_fn, cond, uncond, extra = hoist_invariants(
            model, variables, ddim, cond, uncond,
            want_emb_tables=sampler != "plms",
        )
    else:
        eps_fn, extra = make_eps_fn(model, variables), None
    shape = (batch_size,) + tuple(latent_shape)
    sampler_fn = plms_sample if sampler == "plms" else ddim_sample
    kwargs = dict(mask=mask, x0=x0, schedule=sched)
    if sampler != "plms":
        kwargs["extra_tables"] = extra
    z = sampler_fn(
        eps_fn, rng, shape, ddim, cfg, cond=cond, uncond=uncond, x_T=x_T, **kwargs
    )
    if quantize_denoised:
        z = model.apply(variables, z, method=model.quantize_latent)
    if not decode:
        return z
    return model.apply(variables, z, method=model.decode_first_stage), z


def log_images(
    model: LatentDiffusion,
    variables,
    batch: Dict,
    rng: jax.Array,
    n: int = 8,
    steps: int = 50,
    eta: float = 1.0,
    sample: bool = True,
    quantize_denoised: bool = True,
    inpaint: bool = False,
    plot_progressive_rows: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Reference log_images bundle as a dict of NHWC image tensors."""
    out: Dict[str, jnp.ndarray] = {}
    x = batch["img"][:n]
    n = x.shape[0]
    out["inputs"] = x

    rngs = jax.random.split(rng, 4)
    z = model.apply(
        variables, x, rngs[0], method=model.encode_first_stage
    )
    z = model.scale_factor * z
    out["reconstruction"] = model.apply(
        variables, z, method=model.decode_first_stage
    )
    latent_shape = z.shape[1:]

    mixed = None
    if model.cond_stage_key == "mixed" and "mixed" in batch:
        mixed = {k: v[:n] for k, v in batch["mixed"].items()}
        out["conditioning"] = mixed["img"]
    cond_ctx = None
    if (
        mixed is None
        and model.conditioning_key is not None
        and model.cond_stage_key in batch
    ):
        # generic conditioning (class_label / caption tokens / bbox tokens)
        cond_ctx = model.apply(
            variables, batch[model.cond_stage_key][:n],
            method=model.get_learned_conditioning,
        )
    if model.cond_stage_key == "coordinates_bbox" and "coordinates_bbox" in batch:
        # layout plot (reference Layout2ImgDiffusion.log_images "bbox_image",
        # ddpm.py:1480-1493): rasterize the tokenized boxes
        from .data.layout import BBoxTokenizer, render_layout

        tok = BBoxTokenizer()
        out["bbox_image"] = jnp.stack([
            jnp.asarray(
                render_layout(tok.decode(np.asarray(ids)), x.shape[1])
            )
            for ids in batch["coordinates_bbox"][:n]
        ])

    # diffusion row: q_sample of the first rows at increasing t
    # (reference log_images `diffusion_row`)
    n_row = min(n, 4)
    ts = jnp.linspace(0, model.timesteps - 1, 6).astype(jnp.int32)
    noise = jax.random.normal(jax.random.fold_in(rng, 7), z[:n_row].shape)
    diff_rows = [
        model.apply(
            variables,
            model.apply(
                variables, z[:n_row], jnp.full((n_row,), int(t), jnp.int32), noise,
                method=model.q_sample,
            ),
            method=model.decode_first_stage,
        )
        for t in ts
    ]
    out["diffusion_row"] = jnp.concatenate(diff_rows, axis=2)  # widthwise strip

    if sample:
        imgs, zs = sample_images(
            model, variables, rngs[1], n, latent_shape,
            steps=steps, eta=eta, mixed=mixed, cond=cond_ctx,
            guidance_scale=None if mixed is not None else 1.0,
        )
        out["samples"] = imgs
        if quantize_denoised:
            zq = model.apply(variables, zs, method=model.quantize_latent)
            out["diff_samples"] = model.apply(
                variables, zq, method=model.decode_first_stage
            )
            out["diff_samples_latent"] = zq
        if inpaint:
            h, w = latent_shape[0], latent_shape[1]
            mask = jnp.ones((n, h, w, 1))
            mask = mask.at[:, h // 4: 3 * h // 4, w // 4: 3 * w // 4].set(0.0)
            imgs_inp, _ = sample_images(
                model, variables, rngs[2], n, latent_shape, steps=steps, eta=eta,
                mixed=mixed, cond=cond_ctx,
                guidance_scale=None if mixed is not None else 1.0,
                mask=mask, x0=z,
            )
            out["samples_inpainting"] = imgs_inp
            out["mask"] = mask
            imgs_outp, _ = sample_images(
                model, variables, rngs[3], n, latent_shape, steps=steps, eta=eta,
                mixed=mixed, cond=cond_ctx,
                guidance_scale=None if mixed is not None else 1.0,
                mask=1.0 - mask, x0=z,
            )
            out["samples_outpainting"] = imgs_outp
        if plot_progressive_rows:
            # progressive denoising strip: decoded pred_x0 at 6 spaced steps
            sched = DiffusionSchedule.create(
                timesteps=model.timesteps, beta_schedule=model.beta_schedule,
                linear_start=model.linear_start, linear_end=model.linear_end,
            )
            ddim = DDIMSchedule.create(sched, steps, eta=eta)
            cond = uncond = None
            ucg = model.unconditional_guidance_scale
            if mixed is not None:
                uncond, cond = encode_cfg_conditioning(model, variables, mixed)
            elif cond_ctx is not None:
                # generic conditioning (class/caption/bbox): condition the
                # progressive chain too, CFG off (no paired negative)
                cond, ucg = cond_ctx, 1.0
            _, (x_inter, pred_x0s) = ddim_sample(
                make_eps_fn(model, variables),
                jax.random.fold_in(rng, 9),
                (min(n, 4),) + tuple(latent_shape),
                ddim,
                DDIMConfig(
                    num_steps=steps, eta=eta,
                    unconditional_guidance_scale=ucg,
                    parameterization=model.parameterization,
                ),
                cond=cond[: min(n, 4)] if cond is not None else None,
                uncond=uncond[: min(n, 4)] if uncond is not None else None,
                return_intermediates=True,
            )
            picks = jnp.linspace(0, steps - 1, 6).astype(jnp.int32)
            strips = [
                model.apply(
                    variables, pred_x0s[int(i)], method=model.decode_first_stage
                )
                for i in picks
            ]
            out["progressive_row"] = jnp.concatenate(strips, axis=2)
    return out
