"""Model zoo: every entry builds; representative entries run a forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu import zoo


def test_zoo_names_complete():
    names = zoo.names()
    assert len([n for n in names if n.startswith("first_stage_models/")]) == 9
    assert len([n for n in names if n.startswith("ldm/")]) == 11


@pytest.mark.parametrize("name", zoo.names())
def test_zoo_builds(name):
    m = zoo.build(name)
    assert m is not None


def test_zoo_vq_f4_forward():
    m = zoo.build("first_stage_models/vq-f4")
    x = jnp.zeros((1, 32, 32, 3))  # reduced-res forward (arch is res-agnostic)
    params = m.init(jax.random.PRNGKey(0), x)
    dec, diff, idx = m.apply(params, x)
    assert dec.shape == (1, 32, 32, 3)
    assert idx.shape == (1, 8, 8)  # f4: two downsamples


def test_zoo_kl_f8_latent_shape():
    m = zoo.build("first_stage_models/kl-f8")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    post = m.apply(params, x, method=m.encode)
    assert post.mean.shape == (1, 8, 8, 4)  # f8


def test_zoo_cin256_spec():
    s = zoo.spec("ldm/cin256")
    assert s["unet"]["context_dim"] == 512
    assert s["first_stage"] == "vq-f8"
    m = zoo.build("ldm/cin256")
    assert m.conditioning_key == "crossattn"
    assert m.unet_config["model_channels"] == 256
