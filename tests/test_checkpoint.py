"""Checkpointing + torch key-map round trips and coverage."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.models import UNetModel
from ealdm_tpu.models.vae import VQModel
from ealdm_tpu.utils import (
    export_state_dict,
    import_state_dict,
    unet_key_map,
    vae_key_map,
)


def _flat_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _roundtrip(params, rules):
    sd = export_state_dict(params, rules)
    params2, missing, loaded = import_state_dict(sd, rules, params)
    for (p1, v1), (p2, v2) in zip(_flat_paths(params), _flat_paths(params2)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), err_msg=str(p1))
    return sd


def test_unet_spatial_transformer_keymap_roundtrip_and_coverage():
    cfg = dict(
        image_size=8, in_channels=4, model_channels=16, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=8, use_spatial_transformer=True, transformer_depth=1,
        context_dim=32,
    )
    m = UNetModel(**cfg)
    x = jnp.zeros((1, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0]), jnp.ones((1, 4, 32)))[
        "params"
    ]
    rules = unet_key_map(cfg)
    sd = _roundtrip(params, rules)
    # coverage: every flax leaf is exported (no orphan params)
    exported_prefixes = {fp for _, fp, _ in rules}
    for path, _ in _flat_paths(params):
        prefix = "/".join(path[:-1])
        assert prefix in exported_prefixes, f"unmapped param {path}"
    # torch-side names look like the reference layout
    assert any(k.startswith("input_blocks.0.0.weight") for k in sd)
    assert any("transformer_blocks.0.attn2.to_k.weight" in k for k in sd)
    assert "out.2.weight" in sd


def test_unet_qkv_attention_keymap_roundtrip():
    cfg = dict(
        image_size=8, in_channels=3, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=2,
    )
    m = UNetModel(**cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.array([0]))[
        "params"
    ]
    rules = unet_key_map(cfg)
    sd = _roundtrip(params, rules)
    # qkv conv1d layout: (3C, C, 1)
    qkv_keys = [k for k in sd if k.endswith("qkv.weight")]
    assert qkv_keys and sd[qkv_keys[0]].ndim == 3


def test_vae_keymap_roundtrip():
    dd = dict(
        double_z=False, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=16, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
        dropout=0.0,
    )
    m = VQModel(ddconfig=dd, n_embed=32, embed_dim=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    rules = vae_key_map(dd)
    sd = _roundtrip(params, rules)
    assert "encoder.down.0.block.0.conv1.weight" in sd
    assert "decoder.up.1.upsample.conv.weight" in sd
    assert "quantize.embedding.weight" in sd
    for path, _ in _flat_paths(params):
        prefix = "/".join(path[:-1])
        assert prefix in {fp for _, fp, _ in rules}, f"unmapped param {path}"


def test_orbax_checkpoint_roundtrip(tmp_path):
    from ealdm_tpu.models.ddpm import DDPM
    from ealdm_tpu.training import init_train_state
    from ealdm_tpu.training.checkpoint import CheckpointManager

    model = DDPM(
        unet_config=dict(
            image_size=8, in_channels=3, model_channels=8, out_channels=3,
            num_res_blocks=1, attention_resolutions=[], channel_mult=[1],
            num_heads=1,
        ),
        timesteps=10,
    )
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 0.1}
    state, _ = init_train_state(model, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2, monitor="val/loss")
    mgr.save(0, state, metrics={"val/loss": 1.0})
    mgr.save(1, state, metrics={"val/loss": 0.5})
    assert mgr.latest_step() == 1
    restored = mgr.restore(jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(restored.params["model"]["diffusion_model"]["conv_in"]["kernel"]),
        np.asarray(state.params["model"]["diffusion_model"]["conv_in"]["kernel"]),
    )
    # last.ckpt path restores too
    last = mgr.restore_last(jax.tree_util.tree_map(jnp.zeros_like, state))
    assert int(last.step) == int(state.step)
    mgr.close()
