"""Full-composition training parity against the ACTUAL reference model.

Imports the reference `LatentDiffusion` (`/root/reference/ldm/models/
diffusion/ddpm.py`) with its real UNet, VQ first stage and STDiff UnetCond
cond tower (pl/taming/torchvision shimmed — none of the shims carry
numerics), imports EVERY weight into our flax model, and checks the entire
EALDM training-loss composition end to end on identical inputs/timesteps/
noise:

  frozen-VQ encode + scale_factor        (ddpm.py:655-658, 683-711)
  cond tower on BOTH CFG branches        (ddpm.py:878-895: negative =
                                          other-site image, fusion off)
  q_sample -> CFG combine (scale 2.0)    (ddpm.py:1040-1048, :442)
  loss_simple / logvar / lvlb weighting  (ddpm.py:1060-1076)

The module-level parity tests (test_torch_parity.py) pin each block; this
test pins the WIRING between them. Uses UnetCond(norm="frozen_bn") so the
reference's eval-mode BatchNorm running stats import exactly (the TPU
training default is GroupNorm — a documented intentional deviation).
"""
import copy
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _sd_numpy(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _ensure_module(name):
    if name in sys.modules:
        return sys.modules[name], False
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m, True


import contextlib


@contextlib.contextmanager
def _reference_shims():
    """Install numerics-free shims for the packages the reference imports
    but this env lacks (pytorch_lightning, taming, torchvision, omegaconf).
    Held open for the whole reference phase — the reference UNet ctor does a
    LAZY `from omegaconf.listconfig import ListConfig` at construction time
    — and removed afterwards (spec-less fake modules break transformers'
    find_spec probing in unrelated tests)."""
    created = []

    om, new = _ensure_module("omegaconf")
    if new:
        created.append("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.ListConfig = ListConfig
        sys.modules["omegaconf.listconfig"] = lc
        created.append("omegaconf.listconfig")

    if "taming" not in sys.modules:
        class VectorQuantizer2(torch.nn.Module):
            """Ctor-compatible stand-in; the training-loss path never calls
            it (VQModelInterface.encode stops at quant_conv,
            autoencoder.py:268-271)."""

            def __init__(self, n_e, e_dim, beta=0.25, **kw):
                super().__init__()
                self.embedding = torch.nn.Embedding(n_e, e_dim)

            def forward(self, z):  # pragma: no cover - not on the loss path
                raise NotImplementedError

        for name in ("taming", "taming.modules", "taming.modules.vqvae",
                     "taming.modules.vqvae.quantize"):
            m, new = _ensure_module(name)
            if new:
                created.append(name)
        sys.modules["taming.modules.vqvae.quantize"].VectorQuantizer2 = (
            VectorQuantizer2
        )

    pl, new = _ensure_module("pytorch_lightning")
    if new:
        created.append("pytorch_lightning")

        class _LightningModule(torch.nn.Module):
            @property
            def device(self):  # Lightning provides this on LightningModule
                return torch.device("cpu")

        pl.LightningModule = _LightningModule
        u, _ = _ensure_module("pytorch_lightning.utilities")
        d, _ = _ensure_module("pytorch_lightning.utilities.distributed")
        d.rank_zero_only = lambda f: f
        u.distributed = d
        pl.utilities = u
        created += ["pytorch_lightning.utilities",
                    "pytorch_lightning.utilities.distributed"]

    if "torchvision" not in sys.modules:
        class _TinyResnet(torch.nn.Module):
            """UnetCond builds resnet50(pretrained=True) only to have it
            immediately overwritten by the injected first stage
            (ddpm.py:535-536); children() just has to work."""

            def __init__(self):
                super().__init__()
                self.stem = torch.nn.Conv2d(3, 2048, 1)
                self.head = torch.nn.Linear(2048, 10)

        tv, _ = _ensure_module("torchvision")
        tvu, _ = _ensure_module("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        tv.models = types.SimpleNamespace(
            resnet50=lambda **k: _TinyResnet())
        created += ["torchvision", "torchvision.utils"]

    prev_current_device = torch.cuda.current_device
    torch.cuda.current_device = lambda: "cpu"
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        yield
    finally:
        torch.cuda.current_device = prev_current_device
        for name in created:
            sys.modules.pop(name, None)


# ------------------------------------------------------------- micro config
DD = dict(double_z=False, z_channels=4, resolution=64, in_channels=3,
          out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
          attn_resolutions=[], dropout=0.0)
UNET = dict(image_size=32, in_channels=4, out_channels=4, model_channels=32,
            attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
            num_head_channels=8, use_spatial_transformer=True,
            transformer_depth=1, context_dim=16)
COND_ARGS = dict(type="fourier", dequant="gauss", noise=0, noise_f_int=[],
                 noise_f=[], dims=6, lr=1, lin_lr=0.01,
                 f_manual=[1.84, 672], include_lin=True)
COND = dict(mid_dim=4, emb_dim=8, out_dim=16, w_dim=3, f_dim=1, t_dim=6,
            hidden_dim=8, num_layers=1, num_ws=1)
SCALE_FACTOR = 0.7
TIMESTEPS = 20


def _lstm_params(csd, prefix, template):
    """torch LSTM (gate order i,f,g,o) -> OptimizedLSTMCell param dict."""
    w_ih = csd[f"{prefix}.lstm.weight_ih_l0"]
    w_hh = csd[f"{prefix}.lstm.weight_hh_l0"]
    b_ih = csd[f"{prefix}.lstm.bias_ih_l0"]
    b_hh = csd[f"{prefix}.lstm.bias_hh_l0"]
    hdim = w_hh.shape[1]
    out = dict(template)
    for g, idx in {"i": 0, "f": 1, "g": 2, "o": 3}.items():
        sl = slice(idx * hdim, (idx + 1) * hdim)
        out[f"i{g}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{g}"] = {"kernel": jnp.asarray(w_hh[sl].T),
                        "bias": jnp.asarray(b_ih[sl] + b_hh[sl])}
    return out


def _import_cond_tower(sd, cp):
    """Map the reference UnetCond state_dict (prefix cond_stage_model.,
    skipping the injected .convs) onto our flax UnetCond params."""
    from ealdm_tpu.utils.torch_import import conv_to_flax

    csd = {k[len("cond_stage_model."):]: v for k, v in sd.items()
           if k.startswith("cond_stage_model.")
           and not k.startswith("cond_stage_model.convs.")}

    def lin(prefix):
        return {"kernel": jnp.asarray(csd[f"{prefix}.weight"].T),
                "bias": jnp.asarray(csd[f"{prefix}.bias"])}

    for name in ("w_mlp", "f_mlp"):
        cp[name]["lstm_0"] = _lstm_params(csd, name, cp[name]["lstm_0"])
        cp[name]["fc_0"] = lin(f"{name}.fc.0")
        cp[name]["fc_2"] = lin(f"{name}.fc.3")
    for name in ("wadain", "fadain", "tadain"):
        cp[name]["linear"] = lin(f"{name}.linear")
    cp["scaled_styles"]["c_to_scales_weight"] = jnp.asarray(
        csd["scaled_styles.c_to_scales.weight"])
    cp["conv_cat_0"] = {"kernel": conv_to_flax(csd["conv_cat.0.weight"]),
                        "bias": jnp.asarray(csd["conv_cat.0.bias"])}
    cp["conv_cat_norm"] = {"scale": jnp.asarray(csd["conv_cat.1.weight"]),
                           "bias": jnp.asarray(csd["conv_cat.1.bias"]),
                           "mean": jnp.asarray(csd["conv_cat.1.running_mean"]),
                           "var": jnp.asarray(csd["conv_cat.1.running_var"])}
    cp["conv_cat_3"] = {"kernel": conv_to_flax(csd["conv_cat.3.weight"]),
                        "bias": jnp.asarray(csd["conv_cat.3.bias"])}
    cp["out_0"] = lin("out_layer.1")
    cp["out_3"] = lin("out_layer.4")
    return cp


def _build_reference():
    from ldm.models.diffusion.ddpm import LatentDiffusion as LatentDiffusionRef
    from ealdm_tpu.utils.dnn import EasyDict

    torch.manual_seed(0)
    return LatentDiffusionRef(
        unet_config={"target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                     "params": dict(UNET)},
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {"embed_dim": 4, "n_embed": 16, "ddconfig": dict(DD),
                       "lossconfig": {"target": "torch.nn.Identity"}},
        },
        cond_stage_config={"target": "STDiff.models.UnetCond",
                           "params": dict(COND, cond_args=EasyDict(COND_ARGS),
                                          device="cpu")},
        cond_stage_key="mixed",
        cond_stage_trainable=True,
        conditioning_key="crossattn",
        scale_factor=SCALE_FACTOR,
        first_stage_key="img",
        image_size=32,
        channels=4,
        timesteps=TIMESTEPS,
        linear_start=0.0015,
        linear_end=0.0195,
        monitor=None,
    ).eval()


@pytest.fixture(scope="module")
def twin():
    """Reference LatentDiffusion + our flax model with every weight imported,
    plus shared pinned inputs and the reference CFG conditioning pair."""
    rng = np.random.RandomState(7)
    B = 2
    img = rng.randn(B, 64, 64, 3).astype(np.float32)
    img_rand = rng.randn(B, 64, 64, 3).astype(np.float32)
    flow = rng.randn(B, 1, 1).astype(np.float32)
    weather = rng.randn(B, 1, 3).astype(np.float32)
    tm = rng.rand(B, 1).astype(np.float32)

    with _reference_shims():
        ref = _build_reference()
        assert ref.unconditional_guidance_scale == 2.0  # hardcoded, ddpm.py:442
        sd = _sd_numpy(ref)
        mixed_ref = [
            _nchw(img), torch.from_numpy(flow), torch.from_numpy(weather),
            torch.from_numpy(tm), None, None, None, _nchw(img_rand),
        ]
        with torch.no_grad():
            # the fork's DDPM.get_input expects NCHW from the dataset
            # (the rearrange is commented out, ddpm.py:337)
            z_ref, c_raw = ref.get_input({"img": _nchw(img),
                                          "mixed": mixed_ref}, "img")
            assert c_raw is mixed_ref  # trainable cond passes through raw
            # reference forward() CFG-pair build (ddpm.py:884-893), minus
            # the internal torch.randint so t is pinned
            c_neg_in = copy.copy(c_raw)
            c_neg_in[0] = c_neg_in[-1]
            c_neg_in[-1] = None
            c_neg_ref = ref.get_learned_conditioning(c_neg_in).numpy()
            c_pos_ref = ref.get_learned_conditioning(c_raw).numpy()

    # ---------------------------------------------------------- our model
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.utils.torch_import import (
        import_state_dict, unet_key_map, vae_key_map,
    )

    model, _ = model_from_config({
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "unet_config": {"target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                            "params": dict(UNET)},
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {"embed_dim": 4, "n_embed": 16, "ddconfig": dict(DD)},
            },
            "cond_stage_config": {"target": "STDiff.models.UnetCond",
                                  "params": dict(COND, cond_args=dict(COND_ARGS),
                                                 norm="frozen_bn")},
            "cond_stage_key": "mixed",
            "cond_stage_trainable": True,
            "conditioning_key": "crossattn",
            "scale_factor": SCALE_FACTOR,
            "first_stage_key": "img",
            "image_size": 32,
            "channels": 4,
            "timesteps": TIMESTEPS,
            "linear_start": 0.0015,
            "linear_end": 0.0195,
        },
    })

    batch = {
        "img": jnp.asarray(img),
        "mixed": {"img": jnp.asarray(img), "img_random": jnp.asarray(img_rand),
                  "flow": jnp.asarray(flow), "weather": jnp.asarray(weather),
                  "time": jnp.asarray(tm)},
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, jax.random.PRNGKey(2), method=model.full_init,
    )
    p = jax.device_get(variables["params"])

    p["model"]["diffusion_model"], missing, _ = import_state_dict(
        sd, unet_key_map(UNET), p["model"]["diffusion_model"],
        torch_root="model.diffusion_model.",
    )
    # identity skips have no torch weights when in/out channels match
    assert all(m.endswith(".skip_connection") for m in missing), missing[:5]
    p["first_stage_model"], missing, _ = import_state_dict(
        sd, vae_key_map(DD, "both"), p["first_stage_model"],
        torch_root="first_stage_model.",
    )
    assert all(m.endswith(("nin_shortcut", "loss.weight")) for m in missing), missing[:5]
    p["cond_stage_model"] = _import_cond_tower(sd, p["cond_stage_model"])
    variables = {"params": p}
    return dict(ref=ref, model=model, variables=variables, batch=batch,
                img=img, z_ref=z_ref, c_neg_ref=c_neg_ref, c_pos_ref=c_pos_ref)


def test_full_training_loss_parity(twin, rng):
    ref, model, variables, batch = (
        twin["ref"], twin["model"], twin["variables"], twin["batch"])
    B = batch["img"].shape[0]
    t_np = np.array([3, 17], dtype=np.int64)
    noise = rng.randn(B, 32, 32, 4).astype(np.float32)
    z_ref, c_neg_ref, c_pos_ref = (
        twin["z_ref"], twin["c_neg_ref"], twin["c_pos_ref"])

    with _reference_shims(), torch.no_grad():
        cc_ref = torch.cat([torch.from_numpy(c_neg_ref),
                            torch.from_numpy(c_pos_ref)])
        loss_ref, ld_ref = ref.p_losses(
            z_ref, cc_ref, torch.from_numpy(t_np), noise=_nchw(noise))

    # ------------------------------------------------------- our loss path
    z = model.apply(variables, batch["img"], method=model.encode_first_stage)
    z = model.apply(variables, z, method=model.get_first_stage_encoding)
    np.testing.assert_allclose(
        np.asarray(z), np.transpose(z_ref.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-5,
    )

    c_neg, c_pos = model.apply(
        variables, batch["mixed"], method=model.get_learned_conditioning_pair,
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(c_pos), c_pos_ref, rtol=2e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(c_neg), c_neg_ref, rtol=2e-4, atol=3e-4)

    total, metrics = model.apply(
        variables, jnp.asarray(z),
        jnp.concatenate([c_neg, c_pos], axis=0),
        jnp.asarray(t_np), jnp.asarray(noise).reshape(B, 32, 32, 4),
        method=model.p_losses, deterministic=True,
    )
    np.testing.assert_allclose(
        float(metrics["loss_simple"]), float(ld_ref["val/loss_simple"]),
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        float(metrics["loss_vlb"]), float(ld_ref["val/loss_vlb"]), rtol=5e-4)
    np.testing.assert_allclose(float(total), float(loss_ref), rtol=5e-4)


def test_full_model_cfg_sampling_parity(twin):
    """Extends the composition parity to INFERENCE: the reference
    DDIMSampler over the full reference model with classifier-free guidance
    (`ddim.py:55-110,170-178`) + decode_first_stage, vs our jitted
    eps_fn/ddim_sample/decode path on the imported weights."""
    from ealdm_tpu.inference import make_eps_fn
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    ref, model, variables = twin["ref"], twin["model"], twin["variables"]
    B, steps, scale = 2, 5, 2.0
    rng = np.random.RandomState(11)
    x_T = rng.randn(B, 32, 32, 4).astype(np.float32)
    c_neg_ref, c_pos_ref = twin["c_neg_ref"], twin["c_pos_ref"]

    with _reference_shims():
        from ldm.models.diffusion.ddim import DDIMSampler as RefDDIMSampler

        class _CPUDDIM(RefDDIMSampler):
            def register_buffer(self, name, attr):  # reference pins cuda
                setattr(self, name, attr)

        sampler = _CPUDDIM(ref)
        with torch.no_grad():
            lat_ref, _ = sampler.sample(
                S=steps, batch_size=B, shape=(4, 32, 32),
                conditioning=torch.from_numpy(c_pos_ref), eta=0.0,
                verbose=False, x_T=_nchw(x_T),
                unconditional_guidance_scale=scale,
                unconditional_conditioning=torch.from_numpy(c_neg_ref),
            )
            img_ref = ref.decode_first_stage(
                lat_ref, force_not_quantize=True).numpy()

    sched = DiffusionSchedule.create(
        timesteps=TIMESTEPS, linear_start=0.0015, linear_end=0.0195)
    ddim = DDIMSchedule.create(sched, steps, eta=0.0)
    cfg = DDIMConfig(num_steps=steps, eta=0.0,
                     unconditional_guidance_scale=scale)
    eps_fn = make_eps_fn(model, variables)
    z = ddim_sample(
        eps_fn, jax.random.PRNGKey(0), (B, 32, 32, 4), ddim, cfg,
        cond=jnp.asarray(twin["c_pos_ref"]), uncond=jnp.asarray(c_neg_ref),
        x_T=jnp.asarray(x_T),
    )
    np.testing.assert_allclose(
        np.asarray(z), np.transpose(lat_ref.numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )
    img = model.apply(variables, jnp.asarray(z),
                      method=model.decode_first_stage, force_not_quantize=True)
    np.testing.assert_allclose(
        np.asarray(img), np.transpose(img_ref, (0, 2, 3, 1)),
        rtol=2e-3, atol=3e-3,
    )


def test_full_model_cfg_plms_sampling_parity(twin):
    """Same full-model twin through the PLMS sampler: reference PLMSSampler
    (Adams-Bashforth multistep, `plms.py:172-236`) with CFG vs our
    plms_sample on the imported weights."""
    from ealdm_tpu.inference import make_eps_fn
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, plms_sample

    ref, model, variables = twin["ref"], twin["model"], twin["variables"]
    B, steps, scale = 2, 5, 2.0
    rng = np.random.RandomState(13)
    x_T = rng.randn(B, 32, 32, 4).astype(np.float32)
    c_neg_ref, c_pos_ref = twin["c_neg_ref"], twin["c_pos_ref"]

    with _reference_shims():
        from ldm.models.diffusion.plms import PLMSSampler as RefPLMSSampler

        class _CPUPLMS(RefPLMSSampler):
            def register_buffer(self, name, attr):  # reference pins cuda
                setattr(self, name, attr)

        sampler = _CPUPLMS(ref)
        with torch.no_grad():
            lat_ref, _ = sampler.sample(
                S=steps, batch_size=B, shape=(4, 32, 32),
                conditioning=torch.from_numpy(c_pos_ref), eta=0.0,
                verbose=False, x_T=_nchw(x_T),
                unconditional_guidance_scale=scale,
                unconditional_conditioning=torch.from_numpy(c_neg_ref),
            )

    sched = DiffusionSchedule.create(
        timesteps=TIMESTEPS, linear_start=0.0015, linear_end=0.0195)
    ddim = DDIMSchedule.create(sched, steps, eta=0.0)
    cfg = DDIMConfig(num_steps=steps, eta=0.0,
                     unconditional_guidance_scale=scale)
    eps_fn = make_eps_fn(model, variables)
    z = plms_sample(
        eps_fn, jax.random.PRNGKey(0), (B, 32, 32, 4), ddim, cfg,
        cond=jnp.asarray(c_pos_ref), uncond=jnp.asarray(c_neg_ref),
        x_T=jnp.asarray(x_T),
    )
    np.testing.assert_allclose(
        np.asarray(z), np.transpose(lat_ref.numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )
