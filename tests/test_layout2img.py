"""Layout-to-image: bbox tokenization, dataset, and end-to-end sampling
(reference Layout2ImgDiffusion, ddpm.py:1472-1493)."""
import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.data.layout import BBoxTokenizer, SyntheticLayoutDataset, render_layout


def test_bbox_tokenizer_roundtrip():
    tok = BBoxTokenizer(vocab_size=8192, n_classes=601, max_seq_len=92)
    boxes = [(5, 0.1, 0.2, 0.6, 0.9), (600, 0.0, 0.0, 1.0, 1.0)]
    ids = tok.encode(boxes)
    assert ids.shape == (92,)
    assert ids.max() < 8192
    back = tok.decode(ids)
    assert len(back) == 2
    for (c0, *xy0), (c1, *xy1) in zip(boxes, back):
        assert c0 == c1
        np.testing.assert_allclose(xy0, xy1, atol=1.0 / 255 + 1e-6)
    # padding fills with pad token
    assert (ids[10:] == tok.pad_id).all()


def test_bbox_tokenizer_truncates_to_max_objects():
    tok = BBoxTokenizer(max_seq_len=15)  # 3 objects max
    boxes = [(1, 0, 0, 1, 1)] * 10
    assert len(tok.decode(tok.encode(boxes))) == 3


def test_synthetic_layout_dataset_items():
    ds = SyntheticLayoutDataset(length=4, size=32, n_classes=601)
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    assert item["coordinates_bbox"].shape == (92,)
    # deterministic
    again = ds[0]
    np.testing.assert_array_equal(item["coordinates_bbox"], again["coordinates_bbox"])
    assert not np.array_equal(ds[1]["coordinates_bbox"], item["coordinates_bbox"])


def test_render_layout_marks_boxes():
    img = render_layout([(3, 0.25, 0.25, 0.75, 0.75)], size=16)
    assert img.shape == (16, 16, 3)
    assert not np.allclose(img[8, 8], 1.0)  # inside box: colored
    assert np.allclose(img[0, 0], 1.0)  # background white


def test_layout2img_end_to_end_tiny():
    """Full pipeline at tiny scale: layout tokens -> BERT context -> DDIM
    sample -> VQ decode, through the Layout2ImgDiffusion registry target."""
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    cfg = {
        "target": "ldm.models.diffusion.ddpm.Layout2ImgDiffusion",
        "params": {
            "linear_start": 0.0015, "linear_end": 0.0205, "timesteps": 20,
            "loss_type": "l1", "cond_stage_key": "coordinates_bbox",
            "conditioning_key": "crossattn", "cond_stage_trainable": True,
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": dict(
                    image_size=8, in_channels=4, out_channels=4,
                    model_channels=16, attention_resolutions=[1],
                    num_res_blocks=1, channel_mult=[1], num_head_channels=8,
                    use_spatial_transformer=True, transformer_depth=1,
                    context_dim=32,
                ),
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {
                    "embed_dim": 4, "n_embed": 32,
                    "ddconfig": dict(
                        double_z=False, z_channels=4, resolution=16,
                        in_channels=3, out_ch=3, ch=8, ch_mult=[1, 2],
                        num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                    ),
                },
            },
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.BERTEmbedder",
                "params": {"n_embed": 32, "n_layer": 1, "vocab_size": 8192,
                           "max_seq_len": 92},
            },
        },
    }
    model, _ = model_from_config(cfg)
    assert type(model).__name__ == "Layout2ImgDiffusion"
    assert model.cond_stage_key == "coordinates_bbox"

    ds = SyntheticLayoutDataset(length=2, size=16)
    batch = {
        "img": jnp.stack([jnp.asarray(ds[i]["image"]) for i in range(2)]),
        "coordinates_bbox": jnp.stack(
            [jnp.asarray(ds[i]["coordinates_bbox"]) for i in range(2)]
        ),
    }
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, rng,
                           method=model.full_init)
    loss, metrics = model.apply(variables, batch, rng, method=model.training_loss)
    assert np.isfinite(float(loss))

    ctx = model.apply(variables, batch["coordinates_bbox"],
                      method=model.get_learned_conditioning)
    assert ctx.shape == (2, 92, 32)

    sched = DiffusionSchedule.create(timesteps=20, linear_start=0.0015,
                                     linear_end=0.0205)
    ddim = DDIMSchedule.create(sched, 3, eta=0.0)

    def eps_fn(x, t, c):
        return model.apply(variables, x, t, c, method=model.apply_model)

    z = ddim_sample(eps_fn, jax.random.PRNGKey(1), (2, 8, 8, 4), ddim,
                    DDIMConfig(num_steps=3), cond=ctx)
    img = model.apply(variables, z, method=model.decode_first_stage)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_zoo_layout2img_spec_traces():
    """The full-size zoo architecture shape-traces with bbox token batches."""
    from ealdm_tpu import zoo

    model = zoo.build("ldm/layout2img-openimages256")
    tok = BBoxTokenizer()
    ids = jnp.asarray(tok.encode([(4, 0.1, 0.1, 0.5, 0.5)]))[None]
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)

    def init_fn(r):
        ctx_shape = jax.eval_shape(
            lambda: model.init(r, ids, method=lambda m, i: m.get_learned_conditioning(i))
        )
        return model.init(r, x, t,
                          jnp.zeros((1, 92, 512), jnp.float32),
                          method=model.apply_model)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert n > 100e6  # reference layout2img is a ~300M-param class


def test_log_images_bbox_plot_and_conditioned_samples():
    """log_images for a layout model renders the bbox_image plot and feeds
    the bbox context into the sample pass (reference Layout2ImgDiffusion
    log_images, ddpm.py:1480-1493)."""
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.inference import log_images

    cfg = {
        "target": "ldm.models.diffusion.ddpm.Layout2ImgDiffusion",
        "params": {
            "timesteps": 20, "cond_stage_key": "coordinates_bbox",
            "conditioning_key": "crossattn", "cond_stage_trainable": True,
            "unet_config": {
                "target": "x.UNetModel",
                "params": dict(
                    image_size=8, in_channels=4, out_channels=4,
                    model_channels=16, attention_resolutions=[1],
                    num_res_blocks=1, channel_mult=[1], num_head_channels=8,
                    use_spatial_transformer=True, transformer_depth=1,
                    context_dim=32,
                ),
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {
                    "embed_dim": 4, "n_embed": 32,
                    "ddconfig": dict(
                        double_z=False, z_channels=4, resolution=16,
                        in_channels=3, out_ch=3, ch=8, ch_mult=[1, 2],
                        num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                    ),
                },
            },
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.BERTEmbedder",
                "params": {"n_embed": 32, "n_layer": 1, "vocab_size": 8192,
                           "max_seq_len": 92},
            },
        },
    }
    model, _ = model_from_config(cfg)
    ds = SyntheticLayoutDataset(length=2, size=16)
    batch = {
        "img": jnp.stack([jnp.asarray(ds[i]["image"]) for i in range(2)]),
        "coordinates_bbox": jnp.stack(
            [jnp.asarray(ds[i]["coordinates_bbox"]) for i in range(2)]
        ),
    }
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, rng,
                           method=model.full_init)
    logs = log_images(model, variables, batch, rng, n=2, steps=2,
                      quantize_denoised=False)
    assert logs["bbox_image"].shape == (2, 16, 16, 3)
    assert logs["samples"].shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(logs["samples"])).all()
