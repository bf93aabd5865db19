"""Every mirrored reference config loads and shape-traces end to end.

For each YAML under configs/ (reference-schema mirrors of
/root/reference/configs/**), build the model via the `target:` registry and
jax.eval_shape the FULL init (training loss + first-stage decode) on a
synthetic batch — structural validation of every architecture without
spending FLOPs (the 1.45B txt2img config traces in seconds but could never
init on the 1-core CPU host).
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.config import load_config, model_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "*", "*.yaml"))
)
CONFIGS = [c for c in CONFIGS if os.sep + "smoke" + os.sep not in c]


def _reference_twin(path: str) -> str:
    rel = os.path.relpath(path, REPO)
    return os.path.join("/root/reference", rel)


def test_every_reference_config_is_mirrored():
    """Inverse coverage: each /root/reference/configs/** file has a repo twin."""
    ref = sorted(
        glob.glob("/root/reference/configs/*/*.yaml")
    )
    missing = [
        r for r in ref
        if not os.path.exists(os.path.join(REPO, os.path.relpath(r, "/root/reference")))
    ]
    assert not missing, missing


def _synth_batch(cfg: dict, rng: np.random.RandomState):
    p = cfg["model"].get("params", {})
    res = p.get("first_stage_config", {}).get("params", {}).get(
        "ddconfig", {}
    ).get("resolution", 256)
    batch = {"img": jnp.asarray(rng.randn(1, res, res, 3), jnp.float32)}
    key = p.get("cond_stage_key")
    if p.get("conditioning_key") is None or key is None:
        return batch
    if key == "mixed":
        batch["mixed"] = {
            "img": batch["img"],
            "img_random": batch["img"],
            "flow": jnp.zeros((1, 1, 1), jnp.float32),
            "weather": jnp.zeros((1, 1, 16), jnp.float32),
            "time": jnp.zeros((1, 1), jnp.float32),
        }
    elif key == "class_label":
        batch["class_label"] = jnp.zeros((1,), jnp.int32)
    elif key == "caption":
        batch["caption"] = jnp.zeros((1, 77), jnp.int32)  # token ids
    else:
        # passthrough conditioning (e.g. RDM 'nix' CLIP embeddings)
        ctx_dim = p["unet_config"]["params"].get("context_dim", 512)
        batch[key] = jnp.zeros((1, 4, ctx_dim), jnp.float32)
    return batch


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(c) for c in CONFIGS])
def test_config_shape_traces(path, rng):
    cfg = load_config([path])
    target = cfg["model"]["target"]
    if "autoencoder" in target:
        # first-stage training configs: trace encode->decode roundtrip
        from ealdm_tpu.config import instantiate_from_config

        model = instantiate_from_config(
            {
                "target": target,
                "params": {
                    k: v
                    for k, v in cfg["model"]["params"].items()
                    if k in ("ddconfig", "embed_dim", "n_embed")
                },
            }
        )
        res = cfg["model"]["params"]["ddconfig"]["resolution"]
        x = jnp.zeros((1, res, res, 3), jnp.float32)

        def init_fn(r):
            return model.init({"params": r, "dropout": r, "gaussian": r}, x, r)

        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
        assert n > 1_000_000, n
        return

    model, base_lr = model_from_config(cfg["model"])
    assert base_lr > 0
    batch = _synth_batch(cfg, rng)

    def init_fn(r):
        return model.init({"params": r, "dropout": r}, batch, r, method=model.full_init)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert n_params > 1_000_000, n_params


def test_txt2img_1p4b_param_count():
    """The 1p4B eval config must actually trace out to ~1.4B params
    (reference model-zoo scale), proving the mirror is architecture-true."""
    path = os.path.join(REPO, "configs", "latent-diffusion", "txt2img-1p4B-eval.yaml")
    cfg = load_config([path])
    model, _ = model_from_config(cfg["model"])
    batch = _synth_batch(cfg, np.random.RandomState(0))

    def init_fn(r):
        return model.init({"params": r, "dropout": r}, batch, r, method=model.full_init)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes["params"]))
    assert 1.2e9 < n < 1.7e9, n
