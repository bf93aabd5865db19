"""notebook_helpers: get_cond / make_convolutional_sample / run parity paths
(reference notebook_helpers.py:52-268) at CPU-runnable scale."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import notebook_helpers as nh
from ealdm_tpu.models.ddpm import LatentDiffusion


def _tiny_sr_model():
    """SR pattern: concat LR conditioning through an Identity cond stage
    (models/ldm/bsr_sr/config.yaml semantics) at 32px scale."""
    return LatentDiffusion(
        unet_config=dict(
            image_size=16, in_channels=6, out_channels=3, model_channels=16,
            attention_resolutions=[8], num_res_blocks=1, channel_mult=[1, 2],
            num_head_channels=8,
        ),
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 3, "n_embed": 32,
                "ddconfig": dict(
                    double_z=False, z_channels=3, resolution=64, in_channels=3,
                    out_ch=3, ch=8, ch_mult=[1, 2, 4], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0,
                ),
            },
        },
        cond_stage_config={"target": "torch.nn.Identity"},
        conditioning_key="concat",
        cond_stage_key="LR_image",
        timesteps=20,
        unconditional_guidance_scale=1.0,
    )


@pytest.fixture
def lr_png(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "lr.png")
    Image.fromarray(img).save(p)
    return p


def test_get_cond_superresolution(lr_png):
    ex = nh.get_cond("superresolution", lr_png)
    assert ex["LR_image"].shape == (1, 16, 16, 3)
    assert ex["image"].shape == (1, 64, 64, 3)  # 4x upsample
    assert float(ex["LR_image"].min()) >= -1.0 and float(ex["LR_image"].max()) <= 1.0


def test_get_cond_class_conditional():
    ex = nh.get_cond("class_conditional", 7)
    assert ex["class_label"].shape == (1,)
    assert int(ex["class_label"][0]) == 7


def test_run_superresolution_tiny(lr_png):
    # LR image spatial size matches the latent grid (bsr_sr: 64^2 LR for the
    # f4 latent of a 256^2 target); here 16^2 LR, 64^2 target, f4-like VQ.
    model = _tiny_sr_model()
    batch = {"img": jnp.zeros((1, 64, 64, 3)), "LR_image": jnp.zeros((1, 16, 16, 3))}
    variables = nh._full_init(model, batch)
    logs = nh.run(model, variables, lr_png, task="superresolution", custom_steps=3)
    for k in ("input", "reconstruction", "sample", "time",
              "original_conditioning", "sample_noquant", "progressive_row"):
        assert k in logs, k
    assert logs["sample"].shape == (1, 64, 64, 3)
    assert np.isfinite(logs["sample"]).all()
    # the LR conditioning really reached the sampler (concat path)
    assert logs["original_conditioning"].shape == (1, 16, 16, 3)


def test_run_class_conditional_tiny():
    model = LatentDiffusion(
        unet_config=dict(
            image_size=8, in_channels=3, out_channels=3, model_channels=16,
            attention_resolutions=[1], num_res_blocks=1, channel_mult=[1],
            num_head_channels=8, use_spatial_transformer=True,
            transformer_depth=1, context_dim=16,
        ),
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 3, "n_embed": 32,
                "ddconfig": dict(
                    double_z=False, z_channels=3, resolution=16, in_channels=3,
                    out_ch=3, ch=8, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0,
                ),
            },
        },
        cond_stage_config={
            "target": "ldm.modules.encoders.modules.ClassEmbedder",
            "params": {"embed_dim": 16, "n_classes": 10},
        },
        conditioning_key="crossattn",
        cond_stage_key="class_label",
        timesteps=20,
        unconditional_guidance_scale=1.0,
    )
    batch = {"img": jnp.zeros((1, 16, 16, 3)),
             "class_label": jnp.zeros((1,), jnp.int32)}
    variables = nh._full_init(model, batch)
    logs = nh.run(model, variables, 3, task="class_conditional", custom_steps=3)
    assert logs["sample"].shape == (1, 16, 16, 3)
    assert "input" not in logs  # no source image in class-conditional mode
    assert np.isfinite(logs["sample"]).all()


def test_model_zoo_table_covers_reference_modes():
    assert set(nh.MODEL_ZOO) >= {"superresolution", "class_conditional"}


def test_class_conditional_notebook_cells_compile():
    """The committed notebook (twin of the reference
    `scripts/latent_imagenet_diffusion.ipynb`) has valid code cells whose
    ealdm imports all resolve."""
    import json

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nb = json.load(open(os.path.join(REPO, "scripts", "latent_imagenet_diffusion.ipynb")))
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 4
    for i, c in enumerate(code_cells):
        compile("".join(c["source"]), f"<cell {i}>", "exec")

    from ealdm_tpu.config import load_config, model_from_config  # noqa: F401
    from ealdm_tpu.inference import make_eps_fn  # noqa: F401
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule  # noqa: F401
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample  # noqa: F401

    cfg = load_config([os.path.join(REPO, "configs/latent-diffusion/cin256-v2.yaml")])
    # the notebook's CFG null class id 1000 is in range for this config
    assert cfg["model"]["params"]["cond_stage_config"]["params"]["n_classes"] == 1001
