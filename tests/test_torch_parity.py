"""Weight-mapped output parity against the ACTUAL reference torch modules.

The reference lives at /root/reference (importable: torch+einops are in the
env). Each test constructs the torch module, exports its state_dict through
the ealdm_tpu.utils.torch_import key maps into the flax twin, and asserts
fp32 forward outputs match on fixed inputs. This cashes in the importer
machinery with real numerics, not just key-name round trips.

Parity targets:
  UNetModel                /root/reference/ldm/modules/diffusionmodules/openaimodel.py:443-742
  Encoder/Decoder          /root/reference/ldm/modules/diffusionmodules/model.py:368-568
  SpatialTransformer       /root/reference/ldm/modules/attention.py:218-261
  DDIMSampler trajectory   /root/reference/ldm/models/diffusion/ddim.py:164-204
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- make /root/reference importable (omegaconf is absent in this env; the
# reference only uses ListConfig in an isinstance check, so stub it).
if "omegaconf" not in sys.modules:
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    om.listconfig = lc
    om.ListConfig = ListConfig
    sys.modules["omegaconf"] = om
    sys.modules["omegaconf.listconfig"] = lc

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ealdm_tpu.utils import import_state_dict, unet_key_map, vae_key_map  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-4)


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(y_t: torch.Tensor) -> np.ndarray:
    return np.transpose(y_t.detach().cpu().numpy(), (0, 2, 3, 1))


UNET_SPATIAL_CFG = dict(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True, transformer_depth=1,
    context_dim=64,
)


def _build_unet_pair(cfg, rng, x, t, ctx=None, y=None):
    """Returns (torch_out_nhwc, flax_out) for an identically-weighted pair."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from ealdm_tpu.models import UNetModel

    torch.manual_seed(0)
    tm = TorchUNet(**cfg).eval()

    fm = UNetModel(**cfg)
    kwargs = {}
    if y is not None:
        kwargs["y"] = jnp.asarray(y)
    params = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx) if ctx is not None else None, **kwargs
    )["params"]
    params, missing, _ = import_state_dict(_sd_numpy(tm), unet_key_map(cfg), params)
    # identity skips (in_ch == out_ch) carry no torch weights; nothing else
    # may go unmapped
    assert all(m.endswith(".skip_connection") for m in missing), missing[:8]

    with torch.no_grad():
        out_t = tm(
            _nchw(x), torch.from_numpy(t),
            context=torch.from_numpy(ctx) if ctx is not None else None,
            y=torch.from_numpy(y) if y is not None else None,
        )
    out_f = fm.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx) if ctx is not None else None, **kwargs
    )
    return _to_nhwc(out_t), np.asarray(out_f)


def test_unet_spatial_transformer_output_parity(rng):
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([3, 17], dtype=np.int64)
    ctx = rng.randn(2, 3, 64).astype(np.float32)
    ref, ours = _build_unet_pair(UNET_SPATIAL_CFG, rng, x, t, ctx)
    np.testing.assert_allclose(ours, ref, **TOL)


def test_unet_qkv_attention_class_cond_parity(rng):
    cfg = dict(
        image_size=16, in_channels=3, out_channels=3, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=2, num_classes=5,
    )
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([0, 9], dtype=np.int64)
    y = np.array([1, 4], dtype=np.int64)
    ref, ours = _build_unet_pair(cfg, rng, x, t, y=y)
    np.testing.assert_allclose(ours, ref, **TOL)


def test_unet_scale_shift_resblock_updown_parity(rng):
    cfg = dict(
        image_size=16, in_channels=3, out_channels=3, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=2, use_scale_shift_norm=True, resblock_updown=True,
    )
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    t = np.array([5], dtype=np.int64)
    ref, ours = _build_unet_pair(cfg, rng, x, t)
    np.testing.assert_allclose(ours, ref, **TOL)


# ------------------------------------------------------------------ VAE
DD = dict(
    double_z=False, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
    dropout=0.0,
)


def test_vae_encoder_parity(rng):
    from ldm.modules.diffusionmodules.model import Encoder as TorchEncoder

    from ealdm_tpu.models.vae import Encoder, _ddkwargs

    torch.manual_seed(0)
    tm = TorchEncoder(**DD).eval()
    fm = Encoder(**_ddkwargs(DD))
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = {f"encoder.{k}": v for k, v in _sd_numpy(tm).items()}
    wrapped, missing, _ = import_state_dict(
        sd, vae_key_map(DD, "encoder"), {"encoder": params}
    )
    # quant/post_quant/quantize rules have no torch twin in a bare Encoder;
    # nin_shortcut is Identity (weightless) when in_ch == out_ch
    assert all(
        m.startswith(("quant_conv", "post_quant_conv", "quantize"))
        or m.endswith(".nin_shortcut")
        for m in missing
    ), missing
    with torch.no_grad():
        ref = _to_nhwc(tm(_nchw(x)))
    ours = np.asarray(fm.apply({"params": wrapped["encoder"]}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_vae_decoder_parity(rng):
    from ldm.modules.diffusionmodules.model import Decoder as TorchDecoder

    from ealdm_tpu.models.vae import Decoder, _ddkwargs

    torch.manual_seed(0)
    tm = TorchDecoder(**DD).eval()
    fm = Decoder(**_ddkwargs(DD, decoder=True))
    z = rng.randn(2, 16, 16, 4).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    sd = {f"decoder.{k}": v for k, v in _sd_numpy(tm).items()}
    wrapped, missing, _ = import_state_dict(
        sd, vae_key_map(DD, "decoder"), {"decoder": params}
    )
    assert all(
        m.startswith(("quant_conv", "post_quant_conv", "quantize"))
        or m.endswith(".nin_shortcut")
        for m in missing
    ), missing
    with torch.no_grad():
        ref = _to_nhwc(tm(_nchw(z)))
    ours = np.asarray(fm.apply({"params": wrapped["decoder"]}, jnp.asarray(z)))
    np.testing.assert_allclose(ours, ref, **TOL)


# --------------------------------------------------- SpatialTransformer
def test_spatial_transformer_parity(rng):
    from ldm.modules.attention import SpatialTransformer as TorchST

    from ealdm_tpu.models.layers import SpatialTransformer

    torch.manual_seed(0)
    C, heads, dim_head, ctx_dim = 32, 4, 8, 48
    tm = TorchST(C, heads, dim_head, depth=2, context_dim=ctx_dim).eval()
    fm = SpatialTransformer(heads, dim_head, depth=2)
    x = rng.randn(2, 8, 8, C).astype(np.float32)
    ctx = rng.randn(2, 5, ctx_dim).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))["params"]

    rules = [("norm", "norm", "norm"), ("proj_in", "proj_in", "conv"),
             ("proj_out", "proj_out", "conv")]
    for d in range(2):
        tb, fb = f"transformer_blocks.{d}", f"block_{d}"
        rules += [
            (f"{tb}.attn1.to_q", f"{fb}/attn1/to_q", "linear"),
            (f"{tb}.attn1.to_k", f"{fb}/attn1/to_k", "linear"),
            (f"{tb}.attn1.to_v", f"{fb}/attn1/to_v", "linear"),
            (f"{tb}.attn1.to_out.0", f"{fb}/attn1/to_out", "linear"),
            (f"{tb}.attn2.to_q", f"{fb}/attn2/to_q", "linear"),
            (f"{tb}.attn2.to_k", f"{fb}/attn2/to_k", "linear"),
            (f"{tb}.attn2.to_v", f"{fb}/attn2/to_v", "linear"),
            (f"{tb}.attn2.to_out.0", f"{fb}/attn2/to_out", "linear"),
            (f"{tb}.ff.net.0.proj", f"{fb}/ff/geglu/proj", "linear"),
            (f"{tb}.ff.net.2", f"{fb}/ff/out_proj", "linear"),
            (f"{tb}.norm1", f"{fb}/norm1", "norm"),
            (f"{tb}.norm2", f"{fb}/norm2", "norm"),
            (f"{tb}.norm3", f"{fb}/norm3", "norm"),
        ]
    params, missing, _ = import_state_dict(_sd_numpy(tm), rules, params)
    assert not missing, missing
    with torch.no_grad():
        ref = _to_nhwc(tm(_nchw(x), context=torch.from_numpy(ctx)))
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx)))
    np.testing.assert_allclose(ours, ref, **TOL)


# --------------------------------------------------- DDIM trajectory parity
class _CPUDDIMSampler:
    """Reference DDIMSampler with register_buffer forced onto CPU (the
    reference hardcodes .to('cuda'), ddim.py:19-22); everything else is the
    reference class untouched."""

    def __new__(cls, model):
        from ldm.models.diffusion.ddim import DDIMSampler

        class _Patched(DDIMSampler):
            def register_buffer(self, name, attr):
                if isinstance(attr, torch.Tensor):
                    attr = attr.to(torch.device("cpu"))
                setattr(self, name, attr)

        return _Patched(model)


class _StubLDM:
    """Minimal model surface the reference DDIMSampler touches."""

    def __init__(self, unet, schedule):
        self.unet = unet
        self.device = torch.device("cpu")
        self.num_timesteps = schedule.num_timesteps
        self.betas = torch.from_numpy(np.asarray(schedule.betas, np.float32))
        self.alphas_cumprod = torch.from_numpy(
            np.asarray(schedule.alphas_cumprod, np.float32)
        )
        self.alphas_cumprod_prev = torch.from_numpy(
            np.asarray(schedule.alphas_cumprod_prev, np.float32)
        )
        self.parameterization = "eps"

    def apply_model(self, x, t, c):
        return self.unet(x, t, context=c)


def test_ddim_trajectory_parity_vs_reference_sampler(rng):
    """5-step DDIM chain on an identically-weighted tiny UNet: the flax
    lax.scan sampler must reproduce the reference torch trajectory."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from ealdm_tpu.models import UNetModel
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=32,
    )
    torch.manual_seed(0)
    tm = TorchUNet(**cfg).eval()
    fm = UNetModel(**cfg)

    b, steps, T = 2, 5, 20
    x_T = rng.randn(b, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(b, 4, 32).astype(np.float32)

    params = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x_T), jnp.zeros((b,), jnp.int32),
        jnp.asarray(ctx)
    )["params"]
    params, missing, _ = import_state_dict(_sd_numpy(tm), unet_key_map(cfg), params)
    assert all(m.endswith(".skip_connection") for m in missing), missing[:8]

    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=0.0015, linear_end=0.0195
    )
    stub = _StubLDM(tm, sched)
    sampler = _CPUDDIMSampler(stub)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, 8, 8),
            conditioning=torch.from_numpy(np.transpose(ctx, (0, 1, 2)).copy()),
            eta=0.0, verbose=False, x_T=_nchw(x_T),
        )
    ref = _to_nhwc(ref_out)

    ddim = DDIMSchedule.create(sched, steps, eta=0.0)
    # reference subsets timesteps the same way; assert the tables line up
    np.testing.assert_array_equal(
        np.asarray(ddim.timesteps), np.asarray(sampler.ddim_timesteps)
    )
    np.testing.assert_allclose(
        np.asarray(ddim.alphas), sampler.ddim_alphas.numpy(), rtol=1e-6
    )

    def eps_fn(x, t, c):
        return fm.apply({"params": params}, x, t, c)

    ours = ddim_sample(
        eps_fn, jax.random.PRNGKey(1), (b, 8, 8, 4), ddim,
        DDIMConfig(num_steps=steps, eta=0.0), cond=jnp.asarray(ctx),
        x_T=jnp.asarray(x_T),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


# --------------------------------------------- BERT text trunk (x_transformer)
def test_text_transformer_parity_vs_reference_x_transformer(rng):
    """The BERTEmbedder trunk matches the reference's vendored lucidrains
    TransformerWrapper+Encoder (x_transformer.py:370-641) with mapped
    weights — upgrading the text path from shape contract to value parity."""
    from ldm.modules.x_transformer import Encoder as TorchEncoderLayers
    from ldm.modules.x_transformer import TransformerWrapper

    from ealdm_tpu.models.text_transformer import TextTransformer
    from ealdm_tpu.utils import text_transformer_key_map

    vocab, seq, dim, depth = 96, 12, 64, 2
    torch.manual_seed(0)
    tm = TransformerWrapper(
        num_tokens=vocab, max_seq_len=seq,
        attn_layers=TorchEncoderLayers(dim=dim, depth=depth),
    ).eval()

    fm = TextTransformer(vocab_size=vocab, max_len=seq, dim=dim, depth=depth)
    tokens = rng.randint(0, vocab, size=(2, seq)).astype(np.int64)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(tokens))["params"]
    params, missing, _ = import_state_dict(
        _sd_numpy(tm), text_transformer_key_map(depth), params
    )
    assert not missing, missing
    with torch.no_grad():
        ref = tm(torch.from_numpy(tokens), return_embeddings=True).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_plms_trajectory_parity_vs_reference_sampler(rng):
    """5-step PLMS chain (Adams-Bashforth multistep warmup through order 4,
    reference plms.py:172-236) on an identically-weighted tiny UNet: the
    flax lax.scan sampler must reproduce the reference torch trajectory."""
    from ldm.models.diffusion.plms import PLMSSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from ealdm_tpu.models import UNetModel
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig
    from ealdm_tpu.samplers.plms import plms_sample

    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=32,
    )
    torch.manual_seed(0)
    tm = TorchUNet(**cfg).eval()
    fm = UNetModel(**cfg)

    b, steps, T = 2, 5, 20
    x_T = rng.randn(b, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(b, 4, 32).astype(np.float32)

    params = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x_T), jnp.zeros((b,), jnp.int32),
        jnp.asarray(ctx)
    )["params"]
    params, missing, _ = import_state_dict(_sd_numpy(tm), unet_key_map(cfg), params)
    assert all(m.endswith(".skip_connection") for m in missing), missing[:8]

    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=0.0015, linear_end=0.0195
    )
    stub = _StubLDM(tm, sched)

    class _Patched(PLMSSampler):
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.to(torch.device("cpu"))
            setattr(self, name, attr)

    sampler = _Patched(stub)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, 8, 8),
            conditioning=torch.from_numpy(ctx.copy()),
            eta=0.0, verbose=False, x_T=_nchw(x_T),
        )
    ref = _to_nhwc(ref_out)

    ddim = DDIMSchedule.create(sched, steps, eta=0.0)

    def eps_fn(x, t, c):
        return fm.apply({"params": params}, x, t, c)

    ours = plms_sample(
        eps_fn, jax.random.PRNGKey(1), (b, 8, 8, 4), ddim,
        DDIMConfig(num_steps=steps, eta=0.0), cond=jnp.asarray(ctx),
        x_T=jnp.asarray(x_T),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_plms_masked_inpainting_parity_vs_reference_sampler(rng):
    """Masked PLMS inpainting (reference plms.py:147-150: per-step q_sample
    re-noising of the known region, mask==1 keeps it) on an identically-
    weighted tiny UNet. The q_sample noise is stochastic in both stacks, so
    the reference stub is fed the exact per-step noise sequence our scan
    draws (split(rng, steps) rows in scan order) — the trajectories must
    then coincide."""
    from ldm.models.diffusion.plms import PLMSSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from ealdm_tpu.models import UNetModel
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig
    from ealdm_tpu.samplers.plms import plms_sample

    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=32,
    )
    torch.manual_seed(0)
    tm = TorchUNet(**cfg).eval()
    fm = UNetModel(**cfg)

    b, steps, T = 2, 5, 20
    x_T = rng.randn(b, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(b, 4, 32).astype(np.float32)
    x0 = rng.randn(b, 8, 8, 4).astype(np.float32)
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[:, :4] = 1.0  # top half known

    params = fm.init(
        jax.random.PRNGKey(0), jnp.asarray(x_T), jnp.zeros((b,), jnp.int32),
        jnp.asarray(ctx)
    )["params"]
    params, missing, _ = import_state_dict(_sd_numpy(tm), unet_key_map(cfg), params)
    assert all(m.endswith(".skip_connection") for m in missing), missing[:8]

    sched = DiffusionSchedule.create(
        timesteps=T, linear_start=0.0015, linear_end=0.0195
    )

    # replicate plms_sample's per-step q_sample noise stream
    key = jax.random.PRNGKey(1)
    rng2, _init = jax.random.split(key)
    step_keys = jax.random.split(rng2, steps)
    noises = [np.asarray(jax.random.normal(k, (b, 8, 8, 4)), np.float32)
              for k in step_keys]

    class _MaskStub(_StubLDM):
        def __init__(self, unet, schedule, noise_stream):
            super().__init__(unet, schedule)
            self._noises = list(noise_stream)
            self._sqrt_acp = torch.from_numpy(
                np.asarray(schedule.sqrt_alphas_cumprod, np.float32))
            self._sqrt_1macp = torch.from_numpy(
                np.asarray(schedule.sqrt_one_minus_alphas_cumprod, np.float32))

        def q_sample(self, x_start, t, noise=None):
            noise = _nchw(self._noises.pop(0))
            a = self._sqrt_acp[t].view(-1, 1, 1, 1)
            s = self._sqrt_1macp[t].view(-1, 1, 1, 1)
            return a * x_start + s * noise

    class _Patched(PLMSSampler):
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.to(torch.device("cpu"))
            setattr(self, name, attr)

    stub = _MaskStub(tm, sched, noises)
    sampler = _Patched(stub)
    mask_nchw = torch.from_numpy(np.transpose(mask, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            S=steps, batch_size=b, shape=(4, 8, 8),
            conditioning=torch.from_numpy(ctx.copy()),
            eta=0.0, verbose=False, x_T=_nchw(x_T),
            mask=mask_nchw, x0=_nchw(x0),
        )
    ref = _to_nhwc(ref_out)
    assert not stub._noises, "reference consumed fewer q_sample draws than ours"

    ddim = DDIMSchedule.create(sched, steps, eta=0.0)

    def eps_fn(x, t, c):
        return fm.apply({"params": params}, x, t, c)

    ours = plms_sample(
        eps_fn, key, (b, 8, 8, 4), ddim,
        DDIMConfig(num_steps=steps, eta=0.0), cond=jnp.asarray(ctx),
        x_T=jnp.asarray(x_T), mask=jnp.asarray(mask), x0=jnp.asarray(x0),
        schedule=sched,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_vae_linear_attention_parity(rng):
    """LinAttnBlock (model.py:144-147 / attention.py:80-96) weight-mapped
    output parity: fused qkv split order, spatial softmax, einsum pair."""
    from ldm.modules.diffusionmodules.model import LinAttnBlock

    from ealdm_tpu.models.vae import VaeLinAttnBlock

    c = 16
    tm = LinAttnBlock(c).eval()
    x = rng.randn(2, 6, 5, c).astype(np.float32)

    fm = VaeLinAttnBlock()
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    sd = _sd_numpy(tm)
    params = {
        "to_qkv": {"kernel": np.transpose(sd["to_qkv.weight"], (2, 3, 1, 0))},
        "to_out": {
            "kernel": np.transpose(sd["to_out.weight"], (2, 3, 1, 0)),
            "bias": sd["to_out.bias"],
        },
    }
    with torch.no_grad():
        ref = _to_nhwc(tm(_nchw(x)))
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, **TOL)


@pytest.mark.parametrize(
    "flags",
    [
        dict(use_scalenorm=True),
        dict(use_rmsnorm=True),
        dict(use_rezero=True),
        dict(gate_residual=True),
        dict(ff_glu=True),
        dict(sandwich_coef=1),
        dict(position_infused_attn=True),
        dict(pre_norm=False),
        dict(residual_attn=True),
        dict(use_scalenorm=True, ff_glu=True, gate_residual=True),
    ],
    ids=lambda f: "+".join(f"{k}={v}" for k, v in f.items()),
)
def test_text_transformer_option_surface_parity(rng, flags):
    """The Encoder option surface (x_transformer.py:370-539: scalenorm /
    rmsnorm / rezero / GRU-gated residual / GEGLU / macaron / sandwich /
    position-infused attention / post-norm / residual attention) matches the
    reference with mapped weights, flag by flag."""
    from ldm.modules.x_transformer import Encoder as TorchEncoderLayers
    from ldm.modules.x_transformer import TransformerWrapper

    from ealdm_tpu.models.text_transformer import TextTransformer
    from ealdm_tpu.utils import text_transformer_key_map

    vocab, seq, dim, depth = 96, 12, 64, 2
    enc_flags = {k: v for k, v in flags.items() if k != "pre_norm"}
    torch.manual_seed(0)
    tm = TransformerWrapper(
        num_tokens=vocab, max_seq_len=seq,
        attn_layers=TorchEncoderLayers(dim=dim, depth=depth, **flags),
    ).eval()

    fm = TextTransformer(
        vocab_size=vocab, max_len=seq, dim=dim, depth=depth, **flags
    )
    tokens = rng.randint(0, vocab, size=(2, seq)).astype(np.int64)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(tokens))["params"]
    map_flags = {k: v for k, v in enc_flags.items() if k != "residual_attn"}
    params, missing, _ = import_state_dict(
        _sd_numpy(tm), text_transformer_key_map(depth, **map_flags), params
    )
    assert not missing, missing
    with torch.no_grad():
        ref = tm(torch.from_numpy(tokens), return_embeddings=True).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_text_transformer_macaron(rng):
    """Macaron mode. The reference's own macaron path is BROKEN (its Scale
    wrapper returns a tuple which `Residual.forward` cannot add — TypeError
    at x_transformer.py:115-123/476), so value parity is impossible; instead
    assert the reference crash (documenting the delta) and verify our wiring
    against a manual ('f','a','f') x 0.5-scaled composition of the same
    layer modules and params."""
    from ldm.modules.x_transformer import Encoder as TorchEncoderLayers
    from ldm.modules.x_transformer import TransformerWrapper

    import flax.linen as fnn

    from ealdm_tpu.models.text_transformer import (
        TextTransformer, XAttention, XFeedForward,
    )

    tm = TransformerWrapper(
        num_tokens=50, max_seq_len=8,
        attn_layers=TorchEncoderLayers(dim=32, depth=1, macaron=True),
    ).eval()
    with pytest.raises(TypeError):
        with torch.no_grad():
            tm(torch.zeros(1, 8, dtype=torch.long), return_embeddings=True)

    vocab, seq, dim = 50, 8, 32
    fm = TextTransformer(vocab_size=vocab, max_len=seq, dim=dim, depth=1,
                         macaron=True)
    assert TextTransformer.layer_types_for(2, macaron=True) == (
        "f", "a", "f", "f", "a", "f")
    tokens = rng.randint(0, vocab, size=(2, seq)).astype(np.int64)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(tokens))["params"]
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(tokens)))

    # manual composition with the same params
    p = params
    ln = lambda name, x: fnn.LayerNorm(epsilon=1e-5).apply(
        {"params": p[name]}, x)
    x = np.asarray(p["token_emb"]["embedding"])[tokens] + np.asarray(
        p["pos_emb"]["embedding"])[None, :seq]
    x = jnp.asarray(x)
    ff = lambda name, h: XFeedForward(dim).apply({"params": p[name]}, h)
    x = x + 0.5 * ff("layer_0_ff", ln("layer_0_ff_norm", x))
    x = x + XAttention(dim).apply(
        {"params": p["layer_0_attn"]}, ln("layer_0_attn_norm", x))
    x = x + 0.5 * ff("layer_1_ff", ln("layer_1_ff_norm", x))
    want = np.asarray(ln("norm", x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_text_transformer_export_roundtrip_new_kinds(rng):
    """export_state_dict handles the 'param' (scalar gains) and 'gru'
    (GRUCell weights) kinds: flax -> torch-layout -> flax round trip is
    exact for a scalenorm + GRU-gated model."""
    from ealdm_tpu.models.text_transformer import TextTransformer
    from ealdm_tpu.utils import text_transformer_key_map
    from ealdm_tpu.utils.torch_import import export_state_dict

    fm = TextTransformer(vocab_size=40, max_len=8, dim=32, depth=1,
                         use_scalenorm=True, gate_residual=True)
    tokens = rng.randint(0, 40, size=(2, 8)).astype(np.int64)
    params = fm.init(jax.random.PRNGKey(3), jnp.asarray(tokens))["params"]
    rules = text_transformer_key_map(1, use_scalenorm=True, gate_residual=True)
    sd = export_state_dict(params, rules)
    # every rule must have produced torch tensors (nothing silently dropped)
    assert any(k.endswith(".0.g") for k in sd), sorted(sd)[:8]
    assert any(k.endswith(".gru.weight_ih") for k in sd), sorted(sd)[:8]
    # round-trip: import back into a fresh init and compare forwards
    params2 = fm.init(jax.random.PRNGKey(9), jnp.asarray(tokens))["params"]
    params2, missing, _ = import_state_dict(sd, rules, params2)
    assert not missing, missing
    a = fm.apply({"params": params}, jnp.asarray(tokens))
    b = fm.apply({"params": params2}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_output_parity(rng, pool):
    """EncoderUNetModel (openaimodel.py:745-961) weight-mapped output parity
    for all four pooling heads. The attention head exercises the NEW
    QKVAttention split order (qkv-major, openaimodel.py:388-397) inside
    AttentionPool2d."""
    from ldm.modules.diffusionmodules.openaimodel import (
        EncoderUNetModel as TorchEncoderUNet,
    )

    from ealdm_tpu.models import EncoderUNetModel
    from ealdm_tpu.utils import encoder_unet_key_map

    cfg = dict(
        image_size=16, in_channels=3, model_channels=32, out_channels=5,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_head_channels=16, pool=pool,
    )
    torch.manual_seed(0)
    tm = TorchEncoderUNet(**cfg).eval()

    fm = EncoderUNetModel(**cfg)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([2, 11], dtype=np.int64)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))["params"]
    params, missing, _ = import_state_dict(
        _sd_numpy(tm), encoder_unet_key_map(cfg), params
    )
    assert all(m.endswith(".skip_connection") for m in missing), missing[:8]
    with torch.no_grad():
        ref = tm(_nchw(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, **TOL)


def _stdiff_models():
    """Import the reference STDiff.models with CPU-safe patches: its default
    args call torch.cuda.current_device() at import time, and it imports
    torchvision (absent). The torchvision stub is removed after import."""
    import sys
    import types

    torch.cuda.current_device = lambda: "cpu"
    created = []
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(resnet50=lambda **k: None)
        sys.modules["torchvision"] = tv
        created.append("torchvision")
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl
        created.append("pytorch_lightning")
    try:
        import STDiff.models as sm
    finally:
        for name in created:
            sys.modules.pop(name, None)
    return sm


def test_stdiff_cond_components_parity(rng):
    """Value parity for the STDiff conditioning components against the
    actual reference modules (STDiff/models.py): ConditioningTransform
    fourier features (:153-236), CondScale with w_affine + DC-init
    c_to_scales (:283-310), AdaIN (:363-381), TimeEmbeddings (:339-359)."""
    sm = _stdiff_models()

    from ealdm_tpu.models.stdiff import (
        AdaIN, CondScale, ConditioningTransform, day_year_time_embedding,
    )
    from ealdm_tpu.utils.dnn import EasyDict

    ca = EasyDict(type="fourier", dequant="gauss", noise=0, noise_f_int=[],
                  noise_f=[], dims=6, lr=1, lin_lr=0.01,
                  f_manual=[1.84, 672], include_lin=True)

    # --- ConditioningTransform (pure function, no weights)
    t_xf = sm.ConditioningTransform(cond_args=ca, num_ws=3).eval()
    f_xf = ConditioningTransform(dict(ca), num_ws=3)
    c = rng.rand(4, 1).astype(np.float32)
    with torch.no_grad():
        ref = t_xf(torch.from_numpy(c), broadcast=True).numpy()
    ours = np.asarray(f_xf(jnp.asarray(c), broadcast=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # --- CondScale (fourier branch + w_affine equalized FC)
    torch.manual_seed(0)
    t_cs = sm.CondScale(w_dim=5, c_dim=6, channels=8, cond_args=ca,
                        device="cpu").eval()
    f_cs = CondScale(channels=8, cond_args=dict(ca), w_dim=5)
    w_in = rng.randn(4, 5).astype(np.float32)
    c_in = np.asarray(ours[:, 0, :], np.float32)  # fourier feats [B, 6]
    params = f_cs.init(jax.random.PRNGKey(0), jnp.asarray(w_in), jnp.asarray(c_in))["params"]
    sd = _sd_numpy(t_cs)
    params = {
        "w_affine": {"weight": sd["w_affine.weight"], "bias": sd["w_affine.bias"]},
        "c_to_scales_weight": sd["c_to_scales.weight"],
    }
    with torch.no_grad():
        ref_s = t_cs(torch.from_numpy(w_in), torch.from_numpy(c_in)).numpy()
    ours_s = np.asarray(
        f_cs.apply({"params": params}, jnp.asarray(w_in), jnp.asarray(c_in))
    )
    np.testing.assert_allclose(ours_s, ref_s, rtol=1e-5, atol=1e-6)

    # --- AdaIN
    torch.manual_seed(1)
    t_ad = sm.AdaIN(in_dim=8, w_dim=6, device="cpu").eval()
    f_ad = AdaIN()
    x = rng.randn(2, 7, 5, 8).astype(np.float32)
    w = rng.randn(2, 6).astype(np.float32)
    sd = _sd_numpy(t_ad)
    ad_params = {
        "linear": {
            "kernel": np.transpose(sd["linear.weight"], (1, 0)),
            "bias": sd["linear.bias"],
        }
    }
    with torch.no_grad():
        ref_a = _to_nhwc(t_ad(_nchw(x), torch.from_numpy(w)))
    ours_a = np.asarray(f_ad.apply({"params": ad_params}, jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(ours_a, ref_a, rtol=1e-4, atol=1e-4)

    # --- TimeEmbeddings
    t_te = sm.TimeEmbeddings(dim=4)
    tt = rng.rand(5).astype(np.float32)
    with torch.no_grad():
        ref_t = t_te(torch.from_numpy(tt)).numpy()
    ours_t = np.asarray(day_year_time_embedding(jnp.asarray(tt)))
    np.testing.assert_allclose(ours_t.reshape(ref_t.shape), ref_t, rtol=1e-5, atol=1e-6)


def test_lr_scheduler_parity_vs_reference(rng):
    """All three reference LR schedulers (ldm/lr_scheduler.py:4-91) match
    our functional schedules value-for-value across warmup, cycles, and the
    verbosity-interval boundaries."""
    from ldm.lr_scheduler import (
        LambdaLinearScheduler,
        LambdaWarmUpCosineScheduler,
        LambdaWarmUpCosineScheduler2,
    )

    from ealdm_tpu.training.lr_scheduler import (
        warmup_cosine, warmup_cosine_cyclic, warmup_linear_cyclic,
    )

    steps = np.arange(0, 400, 7)

    ref1 = LambdaWarmUpCosineScheduler(
        warm_up_steps=50, lr_min=0.1, lr_max=1.0, lr_start=0.01,
        max_decay_steps=300, verbosity_interval=0,
    )
    ours1 = warmup_cosine(50, 0.1, 1.0, 0.01, 300)
    for n in steps:
        np.testing.assert_allclose(ours1(int(n)), ref1(int(n)), rtol=1e-6)

    kw = dict(warm_up_steps=[40, 20], f_min=[0.1, 0.05], f_max=[1.0, 0.5],
              f_start=[0.01, 0.02], cycle_lengths=[150, 250],
              verbosity_interval=0)
    ref2 = LambdaWarmUpCosineScheduler2(**kw)
    ours2 = warmup_cosine_cyclic([40, 20], [0.1, 0.05], [1.0, 0.5],
                                 [0.01, 0.02], [150, 250])
    ref3 = LambdaLinearScheduler(**kw)
    ours3 = warmup_linear_cyclic([40, 20], [0.1, 0.05], [1.0, 0.5],
                                 [0.01, 0.02], [150, 250])
    for n in steps:
        np.testing.assert_allclose(ours2(int(n)), ref2(int(n)), rtol=1e-6,
                                    err_msg=f"cosine2 at step {n}")
        np.testing.assert_allclose(ours3(int(n)), ref3(int(n)), rtol=1e-6,
                                    err_msg=f"linear at step {n}")
