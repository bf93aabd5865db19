"""DDPM / LatentDiffusion core, TPU-native flax.

Parity target: `/root/reference/ldm/models/diffusion/ddpm.py`:
  DDPM (46-425): beta-schedule tables, q_sample, p_losses, eps/x0
      parameterization, lvlb weighting, per-timestep logvar.
  LatentDiffusion (428-1440): frozen first stage + trainable cond stage,
      latent scale factor, training-time classifier-free guidance with the
      hardcoded scale 2.0 (`ddpm.py:442,1040-1048`), negative-cond built from
      a random other-site image with env fusion disabled (`ddpm.py:885-893`).
  DiffusionWrapper (1443-1469): conditioning_key dispatch
      {None, concat, crossattn, hybrid, adm}.

TPU design: one flax module tree (first stage frozen via stop_gradient +
optimizer masking, not Python-level requires_grad), NHWC tensors, the CFG
pair as a single 2N-batched UNet call, all tables baked as scanned constants.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.patching import clamp_patch_params, patched_apply, unfold2d
from ..ops.schedules import DiffusionSchedule, extract
from .distributions import normal_kl
from .stdiff import UnetCond
from .unet import UNetModel
from .vae import AutoencoderKL, IdentityFirstStage, VQModel


def build_unet(unet_config: Dict[str, Any], dtype=jnp.float32) -> UNetModel:
    cfg = dict(unet_config)
    cfg.pop("use_checkpoint", None)  # remat is applied by the trainer
    cfg.pop("use_fp16", None)
    for k in ("attention_resolutions", "channel_mult"):
        if k in cfg:
            cfg[k] = tuple(cfg[k])
    return UNetModel(**cfg, dtype=dtype)


def build_first_stage(config: Dict[str, Any], dtype=jnp.float32):
    """Map a reference first_stage_config {target, params} to a flax module."""
    target = config.get("target", "identity")
    params = dict(config.get("params", {}))
    params.pop("ckpt_path", None)
    params.pop("lossconfig", None)
    params.pop("image_key", None)
    params.pop("monitor", None)
    if target.endswith("VQModelInterface") or target.endswith("VQModel"):
        return VQModel(
            ddconfig=dict(params["ddconfig"]),
            n_embed=params["n_embed"],
            embed_dim=params["embed_dim"],
            dtype=dtype,
        )
    if target.endswith("AutoencoderKL"):
        return AutoencoderKL(
            ddconfig=dict(params["ddconfig"]), embed_dim=params["embed_dim"], dtype=dtype
        )
    if "Identity" in target or target == "identity":
        return IdentityFirstStage()
    raise ValueError(f"unknown first stage target: {target}")


def build_cond_stage(config, dtype=jnp.float32):
    """Map cond_stage_config to a module (or the sentinel strings)."""
    if config in ("__is_first_stage__", "__is_unconditional__", None):
        return config
    target = config.get("target", "")
    params = dict(config.get("params", {}))
    if target.endswith("UnetCond"):
        params.pop("device", None)
        cond_args = dict(params.pop("cond_args", {}))
        # normalise YAML nulls inside noise tuples
        if cond_args.get("noise_f_int"):
            cond_args["noise_f_int"] = [t for t in cond_args["noise_f_int"] if t]
        kwargs = {}
        for k in ("mid_dim", "emb_dim", "out_dim", "w_dim", "f_dim",
                  "hidden_dim", "num_layers", "num_ws", "norm"):
            if k in params:
                kwargs[k] = params[k]
        if "dims" in cond_args:
            kwargs["t_dim"] = int(cond_args["dims"])
        return UnetCond(cond_args=cond_args, dtype=dtype, **kwargs)
    from .encoders import build_encoder  # late import to avoid cycles

    return build_encoder(target, params, dtype=dtype)


class DiffusionWrapper(nn.Module):
    """conditioning_key dispatch around the UNet denoiser."""

    unet_config: Dict[str, Any]
    conditioning_key: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        assert self.conditioning_key in (None, "concat", "crossattn", "hybrid", "adm")
        self.diffusion_model = build_unet(self.unet_config, dtype=self.dtype)

    def __call__(self, x, t, c_concat=None, c_crossattn=None, *,
                 context_kv=None, emb_tables=None, deterministic=True):
        """context_kv / emb_tables: hoisted step-invariant projections for
        sampling scans (see unet.precompute_context_kv / _emb_tables)."""
        key = self.conditioning_key
        hoist = dict(context_kv=context_kv, emb_tables=emb_tables)
        if key is None:
            return self.diffusion_model(x, t, deterministic=deterministic, **hoist)
        if key == "concat":
            xc = jnp.concatenate([x] + list(c_concat), axis=-1)
            return self.diffusion_model(xc, t, deterministic=deterministic, **hoist)
        if key == "crossattn":
            # c_crossattn=None is only valid on the hoisted fast path where
            # context_kv carries the projected conditioning; with BOTH absent
            # attn2 would silently run as self-attention (context=x).
            assert c_crossattn is not None or context_kv is not None, (
                "crossattn conditioning requires c_crossattn or context_kv"
            )
            cc = None if c_crossattn is None else jnp.concatenate(
                list(c_crossattn), axis=1
            )
            return self.diffusion_model(
                x, t, context=cc, deterministic=deterministic, **hoist
            )
        if key == "hybrid":
            xc = jnp.concatenate([x] + list(c_concat), axis=-1)
            cc = jnp.concatenate(list(c_crossattn), axis=1)
            return self.diffusion_model(
                xc, t, context=cc, deterministic=deterministic, **hoist
            )
        if key == "adm":
            assert emb_tables is None  # class embedding precludes emb hoisting
            return self.diffusion_model(x, t, y=c_crossattn[0], deterministic=deterministic)
        raise NotImplementedError(key)


class LatentDiffusion(nn.Module):
    """Latent diffusion with frozen first stage + (trainable) cond stage."""

    unet_config: Dict[str, Any]
    first_stage_config: Optional[Dict[str, Any]] = None
    cond_stage_config: Any = "__is_unconditional__"
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    cosine_s: float = 8e-3
    v_posterior: float = 0.0
    parameterization: str = "eps"
    loss_type: str = "l2"
    conditioning_key: Optional[str] = None
    first_stage_key: str = "img"
    cond_stage_key: str = "image"
    cond_stage_trainable: bool = False
    num_timesteps_cond: int = 1
    scale_factor: float = 1.0
    unconditional_guidance_scale: float = 2.0  # training-time CFG (ddpm.py:442)
    # overlapping-crop inference for oversized inputs (reference
    # split_input_params, ddpm.py:723-1009); keys as ops/patching.py
    split_input_params: Optional[Dict[str, Any]] = None
    learn_logvar: bool = False
    logvar_init: float = 0.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.schedule = DiffusionSchedule.create(
            timesteps=self.timesteps,
            beta_schedule=self.beta_schedule,
            linear_start=self.linear_start,
            linear_end=self.linear_end,
            cosine_s=self.cosine_s,
            v_posterior=self.v_posterior,
            parameterization=self.parameterization,
        )
        self.model = DiffusionWrapper(
            self.unet_config, self.conditioning_key, dtype=self.dtype, name="model"
        )
        if self.first_stage_config is not None:
            self.first_stage_model = build_first_stage(
                self.first_stage_config, dtype=self.dtype
            )
        else:
            self.first_stage_model = IdentityFirstStage()
        cond = build_cond_stage(self.cond_stage_config, dtype=self.dtype)
        if isinstance(cond, str) or cond is None:
            self.cond_stage_model = None
            self._cond_sentinel = cond
        else:
            self.cond_stage_model = cond
            self._cond_sentinel = None
        if self.learn_logvar:
            self.logvar = self.param(
                "logvar",
                lambda rng: jnp.full((self.timesteps,), self.logvar_init, jnp.float32),
            )
        else:
            self.logvar = jnp.full((self.timesteps,), self.logvar_init, jnp.float32)
        # shortened conditioning-noise schedule (reference make_cond_schedule,
        # ddpm.py:479-481; active only when num_timesteps_cond > 1)
        assert self.num_timesteps_cond <= self.timesteps
        cond_ids = jnp.full((self.timesteps,), self.timesteps - 1, jnp.int32)
        if self.num_timesteps_cond > 1:
            ids = jnp.round(
                jnp.linspace(0, self.timesteps - 1, self.num_timesteps_cond)
            ).astype(jnp.int32)
            cond_ids = cond_ids.at[: self.num_timesteps_cond].set(ids)
        self.cond_ids = cond_ids
        self.shorten_cond_schedule = self.num_timesteps_cond > 1

    # ------------------------------------------------------------- first stage
    def _patching(self) -> Optional[Dict[str, Any]]:
        """Active split_input_params for first-stage crops, or None."""
        p = self.split_input_params
        if p is not None and p.get("patch_distributed_vq"):
            return p
        return None

    def encode_first_stage(self, x, rng=None, sample_posterior: bool = True):
        """Image -> (un-quantized / sampled) latent; gradients stopped.
        With split_input_params set, encodes an overlapping crop grid and
        stitches (reference encode_first_stage, ddpm.py:835-880)."""
        p = self._patching()
        if p is not None and x.ndim == 4:
            z = patched_apply(
                lambda crops: self._encode_raw(crops, rng, sample_posterior),
                x, p, df=int(p.get("vqf", 1)),
            )
        else:
            z = self._encode_raw(x, rng, sample_posterior)
        return jax.lax.stop_gradient(z)

    def _encode_raw(self, x, rng=None, sample_posterior: bool = True):
        fs = self.first_stage_model
        if isinstance(fs, VQModel):
            return fs.encode_prequant(x)
        if isinstance(fs, AutoencoderKL):
            posterior = fs.encode(x)
            return posterior.sample(rng) if sample_posterior else posterior.mode()
        return fs.encode(x)

    def get_first_stage_encoding(self, z):
        return self.scale_factor * z

    def decode_first_stage(self, z, force_not_quantize: bool = False):
        """Latent -> image; with split_input_params set, decodes an
        overlapping crop grid and stitches with border weighting (reference
        decode_first_stage, ddpm.py:723-830)."""
        z = (1.0 / self.scale_factor) * z
        p = self._patching()
        if p is not None and z.ndim == 4:
            return patched_apply(
                lambda crops: self._decode_raw(crops, force_not_quantize),
                z, p, uf=int(p.get("vqf", 1)),
            )
        return self._decode_raw(z, force_not_quantize)

    def _decode_raw(self, z, force_not_quantize: bool = False):
        fs = self.first_stage_model
        if isinstance(fs, VQModel):
            return fs.decode_interface(z, force_not_quantize=force_not_quantize)
        return fs.decode(z)

    def quantize_latent(self, z):
        """VQ-quantize a (scaled) latent; used for the 'diff_samples' path."""
        fs = self.first_stage_model
        if isinstance(fs, VQModel):
            zq, _, _ = fs.quantize(z)
            return zq
        return z

    # ------------------------------------------------------------- conditioning
    def get_learned_conditioning(self, cond, fuse_env: bool = True, *, deterministic=True):
        """Encode conditioning. For `mixed` cond, `cond` is a dict with keys
        img/flow/weather/time (+ img_random when building the negative)."""
        if self.cond_stage_model is None:
            if self._cond_sentinel == "__is_first_stage__":
                # e.g. inpainting/SR: condition is first-stage-encoded; KL
                # posteriors use the MODE (reference instantiate_cond_stage
                # ddpm.py:516-518 + get_learned_conditioning 558-563)
                return self.encode_first_stage(cond, sample_posterior=False)
            return cond
        if self.cond_stage_key == "mixed":
            img = cond["img"]
            # image branch through the FROZEN first-stage encoder
            feat = jax.lax.stop_gradient(self._mixed_image_features(img))
            return self.cond_stage_model(
                feat,
                cond["flow"],
                cond["weather"],
                cond["time"],
                fuse_env=fuse_env,
                deterministic=deterministic,
            )
        return self.cond_stage_model(cond, deterministic=deterministic)

    def get_learned_conditioning_pair(self, mixed, *, deterministic=True):
        """(c_neg, c_pos) for the EALDM CFG negative-pairing convention
        (negative = other-site image `img_random` with env fusion off,
        reference STDiff training loop). The frozen first-stage image
        encode — nearly all the conditioning FLOPs — runs as ONE 2N-batched
        call so the MXU stays fed; only the small env-fusion heads run per
        branch."""
        assert self.cond_stage_key == "mixed"
        img2 = jnp.concatenate([mixed["img"], mixed["img_random"]], axis=0)
        feat2 = jax.lax.stop_gradient(self._mixed_image_features(img2))
        n = mixed["img"].shape[0]
        c_pos = self.cond_stage_model(
            feat2[:n], mixed["flow"], mixed["weather"], mixed["time"],
            fuse_env=True, deterministic=deterministic,
        )
        c_neg = self.cond_stage_model(
            feat2[n:], mixed["flow"], mixed["weather"], mixed["time"],
            fuse_env=False, deterministic=deterministic,
        )
        return c_neg, c_pos

    def _mixed_image_features(self, img):
        fs = self.first_stage_model
        if isinstance(fs, VQModel):
            return fs.encoder(img)
        if isinstance(fs, AutoencoderKL):
            return fs.encoder(img)
        return img

    # ------------------------------------------------------------- diffusion math
    def q_sample(self, x_start, t, noise):
        s = self.schedule
        return (
            extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_mean_variance(self, x_start, t):
        """Moments of q(x_t | x_0) (ddpm.py:214-224)."""
        s = self.schedule
        mean = extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        log_var = extract(s.log_one_minus_alphas_cumprod, t, x_start.ndim)
        var = jnp.exp(log_var)
        return mean, var, log_var

    def prior_bpd(self, x_start):
        """Prior KL term of the VLB in bits-per-dim (`_prior_bpd`,
        ddpm.py:1022-1034): KL(q(x_T|x_0) || N(0, I)), one value per batch
        element. Not trainable — diagnostic only."""
        b = x_start.shape[0]
        t = jnp.full((b,), self.schedule.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_var = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
        return kl.reshape(b, -1).mean(axis=1) / jnp.log(2.0)

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        """Inverse of predict_start_from_noise (`_predict_eps_from_xstart`,
        ddpm.py:1018-1020): recover eps from a predicted x0."""
        s = self.schedule
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        mean = (
            extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = extract(s.posterior_variance, t, x_t.ndim)
        log_var = extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    def apply_model(self, x_noisy, t, cond_context, *, context_kv=None,
                    emb_tables=None, deterministic=True):
        """Run the denoiser with already-encoded conditioning context.

        context_kv / emb_tables: hoisted step-invariant projections for
        sampling scans (inference.hoist_invariants); bypasses cond_context
        for the cross-attn K/V when given. Dense path only."""
        if self.split_input_params is not None and x_noisy.ndim == 4:
            assert context_kv is None and emb_tables is None, (
                "hoisted invariants are not supported on the split-input "
                "patched path"
            )
            return self._apply_model_patched(
                x_noisy, t, cond_context, deterministic=deterministic
            )
        return self._apply_model_dense(
            x_noisy, t, cond_context, context_kv=context_kv,
            emb_tables=emb_tables, deterministic=deterministic,
        )

    def _split_context(self, cond_context):
        """(c_concat, c_crossattn) lists from a raw context. 'hybrid' takes a
        dict {"c_concat": ..., "c_crossattn": ...} (each an array or list),
        mirroring the reference's dict-of-lists cond (ddpm.py:1030-1038);
        a single array routes per conditioning_key."""
        def aslist(v):
            if v is None:
                return None
            return list(v) if isinstance(v, (list, tuple)) else [v]

        if isinstance(cond_context, dict):
            return (
                aslist(cond_context.get("c_concat")),
                aslist(cond_context.get("c_crossattn")),
            )
        if self.conditioning_key == "hybrid":
            raise ValueError(
                "hybrid conditioning needs a dict context "
                '{"c_concat": ..., "c_crossattn": ...}'
            )
        if self.conditioning_key in ("crossattn", "adm"):
            return None, [cond_context]
        return [cond_context], None

    def _apply_model_dense(self, x_noisy, t, cond_context, *, context_kv=None,
                           emb_tables=None, deterministic=True):
        hoist = dict(context_kv=context_kv, emb_tables=emb_tables)
        if self.conditioning_key is None or cond_context is None:
            # unconditional, or the conditioning rides entirely in the
            # precomputed K/V (context_kv)
            return self.model(x_noisy, t, deterministic=deterministic, **hoist)
        cc, ca = self._split_context(cond_context)
        return self.model(
            x_noisy, t, c_concat=cc, c_crossattn=ca, deterministic=deterministic,
            **hoist,
        )

    def _apply_model_patched(self, x_noisy, t, cond_context, *, deterministic=True):
        """Denoise an overlapping crop grid and stitch (reference apply_model
        split_input branch, ddpm.py:923-1009). TPU-first: all L crops run as
        one [B*L, ...] batched UNet call instead of a Python loop; spatial
        conditioning (image/LR/segmentation concat) is unfolded with the same
        grid, token/class conditioning is tiled per crop."""
        p = dict(self.split_input_params)
        p["ks"], p["stride"] = clamp_patch_params(
            x_noisy.shape[1:3], tuple(p["ks"]), tuple(p["stride"])
        )
        b = x_noisy.shape[0]
        # Dispatch on the conditioning mode, not tensor shape: spatial
        # conditioning (image/LR/segmentation maps concatenated to the UNet
        # input, reference cond keys at ddpm.py:935-947) rides the concat
        # path and is unfolded with the same crop grid; token/class context
        # (crossattn/adm) is tiled per crop. A crossattn context that
        # coincidentally matched H,W must NOT be unfolded. For 'hybrid'
        # (dict context) each stream gets its own treatment.
        cc, ca = (None, None)
        if cond_context is not None:
            cc, ca = self._split_context(cond_context)
        if cc is not None:
            for m in cc:
                assert (
                    getattr(m, "ndim", 0) == 4
                    and m.shape[:3] == x_noisy.shape[:3]
                ), (
                    "concat conditioning must be a [B,H,W,C] map matching "
                    f"the input grid, got {getattr(m, 'shape', None)}"
                )
            cc_flat = [
                unfold2d(m, p["ks"], p["stride"]).reshape(
                    (-1,) + (p["ks"][0], p["ks"][1], m.shape[-1])
                )
                for m in cc
            ]

        def fn(crops):
            length = crops.shape[0] // b
            t_in = jnp.repeat(t, length)
            ctx = None
            if cond_context is not None:
                cc_r = cc_flat if cc is not None else None
                ca_r = (
                    [jnp.repeat(a, length, axis=0) for a in ca]
                    if ca is not None else None
                )
                ctx = {"c_concat": cc_r, "c_crossattn": ca_r}
            return self._apply_model_dense(
                crops, t_in, ctx, deterministic=deterministic
            )

        return patched_apply(fn, x_noisy, p)

    # ------------------------------------------------------------- losses
    def _pixel_loss(self, pred, target):
        if self.loss_type == "l1":
            return jnp.abs(target - pred)
        if self.loss_type == "l2":
            return jnp.square(target - pred)
        raise NotImplementedError(self.loss_type)

    def p_losses(self, x_start, cond_context, t, noise, *, deterministic=False):
        """Diffusion loss; cond_context is None or [B,...] or [2B,...] (CFG pair:
        first half negative, second half positive, reference ddpm.py:1040-1048)."""
        x_noisy = self.q_sample(x_start, t, noise)
        cfg = (
            cond_context is not None
            and self.unconditional_guidance_scale != 1.0
            and cond_context.shape[0] == 2 * x_start.shape[0]
        )
        if cfg:
            x_in = jnp.concatenate([x_noisy] * 2)
            t_in = jnp.concatenate([t] * 2)
            out = self.apply_model(x_in, t_in, cond_context, deterministic=deterministic)
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            model_output = e_uncond + self.unconditional_guidance_scale * (
                e_cond - e_uncond
            )
        else:
            model_output = self.apply_model(
                x_noisy, t, cond_context, deterministic=deterministic
            )

        target = noise if self.parameterization == "eps" else x_start
        loss_simple = jnp.mean(
            self._pixel_loss(model_output, target), axis=tuple(range(1, x_start.ndim))
        )
        logvar_t = jnp.take(self.logvar, t)
        loss = loss_simple / jnp.exp(logvar_t) + logvar_t
        loss = self.l_simple_weight * jnp.mean(loss)
        loss_vlb = jnp.mean(jnp.take(self.schedule.lvlb_weights, t) * loss_simple)
        total = loss + self.original_elbo_weight * loss_vlb
        metrics = {
            "loss_simple": jnp.mean(loss_simple),
            "loss_vlb": loss_vlb,
            "loss": total,
        }
        return total, metrics

    # ------------------------------------------------------------- train entry
    def training_loss(self, batch: Dict[str, Any], rng: jax.Array, *, train: bool = True):
        """Full EALDM training objective for one batch.

        batch: {"img": [B,H,W,3] target frames, "mixed": {...}} for the
        conditional model, or {"img": ...} for unconditional.
        """
        rngs = jax.random.split(rng, 4)
        # target frame(s): the DataModule normalizes to "img", but raw
        # reference-schema batches may use first_stage_key ("image", "jpg")
        x = batch.get("img", batch.get(self.first_stage_key))
        z = self.encode_first_stage(x, rng=rngs[0])
        z = self.get_first_stage_encoding(z)

        t = jax.random.randint(rngs[1], (z.shape[0],), 0, self.timesteps)
        noise = jax.random.normal(rngs[2], z.shape, z.dtype)

        cond_context = None
        if self.conditioning_key is not None and self.cond_stage_key == "mixed":
            mixed = batch["mixed"]
            if self.unconditional_guidance_scale != 1.0:
                # negative branch: random other-site image, env fusion off
                c_neg, c_pos = self.get_learned_conditioning_pair(
                    mixed, deterministic=not train
                )
                cond_context = jnp.concatenate([c_neg, c_pos], axis=0)
            else:
                cond_context = self.get_learned_conditioning(
                    mixed, fuse_env=True, deterministic=not train
                )
        elif self.conditioning_key is not None:
            cond_context = self.get_learned_conditioning(
                batch[self.cond_stage_key], deterministic=not train
            )

        if (
            self.shorten_cond_schedule
            and cond_context is not None
            and jnp.issubdtype(jnp.asarray(cond_context).dtype, jnp.floating)
        ):
            # noise the conditioning at the shortened schedule's timestep
            tc = jnp.take(self.cond_ids, t)
            c_noise = jax.random.normal(rngs[3], cond_context.shape)
            tc_full = (
                jnp.concatenate([tc, tc]) if cond_context.shape[0] == 2 * t.shape[0] else tc
            )
            cond_context = self.q_sample(cond_context, tc_full, c_noise)

        return self.p_losses(z, cond_context, t, noise, deterministic=not train)

    def __call__(self, batch, rng, *, train: bool = False):
        return self.training_loss(batch, rng, train=train)

    def full_init(self, batch, rng):
        """Init-time entry that touches EVERY submodule (training path plus
        first-stage decode/quantize), so one `model.init(...,
        method=model.full_init)` yields the complete parameter tree."""
        loss, metrics = self.training_loss(batch, rng, train=False)
        img = batch.get("img", batch.get(self.first_stage_key))
        z = self.encode_first_stage(img[:1], rng=rng)
        z = self.get_first_stage_encoding(z)
        self.decode_first_stage(z)  # touches quantizer + decoder params
        return loss, metrics


class DDPM(LatentDiffusion):
    """Pixel-space DDPM: identity first stage, no conditioning (API parity)."""

    first_stage_config: Optional[Dict[str, Any]] = None
    cond_stage_config: Any = "__is_unconditional__"
    unconditional_guidance_scale: float = 1.0


class Layout2ImgDiffusion(LatentDiffusion):
    """bbox-layout-conditioned LDM (reference ddpm.py:1472-1493 capability).

    The layout arrives as tokenized bbox sequences under `cond_stage_key`
    and is encoded by the configured cond encoder (BERT-style transformer);
    unused by the EALDM configs but part of the reference surface.
    """

    cond_stage_key: str = "coordinates_bbox"
    unconditional_guidance_scale: float = 1.0
