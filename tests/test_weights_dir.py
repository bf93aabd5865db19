"""On-disk pretrained-weight loading (EALDM_WEIGHTS_DIR, ealdm_tpu.weights).

The reference *downloads* its eval trunks at runtime
(`third_stage_model.py:26-27,281`, `contperceptual.py:4`); this framework
loads the same checkpoints from local files. These tests exercise the FULL
file round-trip — synthetic state_dicts written to disk with torch.save /
np.savez, then loaded through the same code paths `third_stage.py` uses —
so the on-disk machinery is always covered even though real pretrained
weights cannot exist in a zero-egress environment. A final skip-if-absent
test runs the identical path against real checkpoints when a deployment
provides EALDM_WEIGHTS_DIR.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))

from test_eval_trunks import TInceptionV3, TLPIPS, randomize_  # noqa: E402

from ealdm_tpu.weights import (  # noqa: E402
    CANONICAL_FILES,
    find_weights,
    load_lpips_params,
    load_state_dict_file,
)


# ------------------------------------------------------- file format decode
def test_load_state_dict_file_formats(tmp_path):
    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)

    # npz archive
    p_npz = str(tmp_path / "w.npz")
    np.savez(p_npz, **{"lin.weight": w})
    got = load_state_dict_file(p_npz)
    np.testing.assert_array_equal(got["lin.weight"], w)

    # plain torch state_dict
    p_pt = str(tmp_path / "w.pth")
    torch.save({"lin.weight": torch.from_numpy(w)}, p_pt)
    np.testing.assert_array_equal(
        load_state_dict_file(p_pt)["lin.weight"].numpy(), w)

    # Lightning-style {"state_dict": ...} wrapper
    p_lit = str(tmp_path / "lit.ckpt")
    torch.save({"state_dict": {"lin.weight": torch.from_numpy(w)},
                "epoch": 3, "global_step": 7}, p_lit)
    np.testing.assert_array_equal(
        load_state_dict_file(p_lit)["lin.weight"].numpy(), w)

    # TorchScript archive (the format OpenAI's clip.load ships)
    mod = torch.nn.Linear(3, 4, bias=False)
    with torch.no_grad():
        mod.weight.copy_(torch.from_numpy(w))
    p_jit = str(tmp_path / "scripted.pt")
    torch.jit.save(torch.jit.script(mod), p_jit)
    got = load_state_dict_file(p_jit)
    np.testing.assert_array_equal(got["weight"].numpy(), w)


def test_find_weights_canonical_order(tmp_path, monkeypatch):
    monkeypatch.delenv("EALDM_WEIGHTS_DIR", raising=False)
    assert find_weights("inception") is None
    d = tmp_path / "weights"
    d.mkdir()
    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(d))
    assert find_weights("inception") is None
    (d / "inception.pth").write_bytes(b"")
    (d / CANONICAL_FILES["inception"][0]).write_bytes(b"")
    # first canonical name wins
    assert find_weights("inception") == str(d / CANONICAL_FILES["inception"][0])


# ------------------------------------- third_stage FID trunk: env-dir path
def test_fid_trunk_loads_from_weights_dir(tmp_path, monkeypatch):
    """ThirdStageModel._fid_feats auto-installs a torchvision-named
    InceptionV3 checkpoint FILE found via $EALDM_WEIGHTS_DIR, matching the
    torch twin's features — the full disk round-trip of the path the
    reference serves with torchmetrics' downloaded FID weights."""
    from test_third_stage import _FakeDiffusion

    from ealdm_tpu.third_stage import ThirdStageModel

    twin = randomize_(TInceptionV3())
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(twin.state_dict(), str(d / "pt_inception-2015-12-05.pth"))
    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(d))

    model = ThirdStageModel(_FakeDiffusion(), {"params": {}},
                            clip_image_size=32)
    # 299^2 input: the trunk's resize-to-299 is a no-op on both sides, so
    # the comparison isolates the on-disk weight install
    img = np.random.RandomState(0).rand(1, 299, 299, 3).astype(np.float32)
    got = np.asarray(model._fid_feats(jnp.asarray(img) * 2.0 - 1.0))
    with torch.no_grad():
        ref = twin(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# --------------------------------------- CLIP scorer: on-disk checkpoint
def _tiny_openai_clip_sd(rng, width=8, heads=2, layers=1, vocab=64, ctx=16,
                         embed=8, patch=8, image=16):
    """OpenAI-`clip`-named state_dict at reduced geometry (the import map
    is shape-agnostic; full-geometry parity is covered by
    test_eval_trunks.test_clip_import_parity)."""
    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.05)

    sd = {
        "token_embedding.weight": t(vocab, width),
        "positional_embedding": t(ctx, width),
        "ln_final.weight": t(width), "ln_final.bias": t(width),
        "text_projection": t(width, embed),
        "visual.conv1.weight": t(width, 3, patch, patch),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t((image // patch) ** 2 + 1, width),
        "visual.ln_pre.weight": t(width), "visual.ln_pre.bias": t(width),
        "visual.ln_post.weight": t(width), "visual.ln_post.bias": t(width),
        "visual.proj": t(width, embed),
    }
    for tower in ("transformer", "visual.transformer"):
        for i in range(layers):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = t(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = t(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = t(width, width)
            sd[f"{p}.attn.out_proj.bias"] = t(width)
            sd[f"{p}.ln_1.weight"] = t(width)
            sd[f"{p}.ln_1.bias"] = t(width)
            sd[f"{p}.ln_2.weight"] = t(width)
            sd[f"{p}.ln_2.bias"] = t(width)
            sd[f"{p}.mlp.c_fc.weight"] = t(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = t(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = t(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = t(width)
    return sd


def test_clip_scorer_loads_checkpoint_file(tmp_path, monkeypatch):
    """CLIPZeroShot.load_clip_weights consumes a checkpoint FILE located by
    find_weights — the on-disk variant of third_stage's clip_scorer path."""
    from ealdm_tpu.third_stage import CLIPZeroShot

    d = tmp_path / "weights"
    d.mkdir()
    sd = _tiny_openai_clip_sd(np.random.RandomState(3))
    torch.save(sd, str(d / "clip.pth"))
    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(d))

    kw = dict(width=8, n_layer=1, n_heads=2)
    scorer = CLIPZeroShot(
        embed_dim=8, image_size=16,
        text_kwargs=dict(vocab_size=64, max_seq_len=16, **kw),
        image_kwargs=dict(patch_size=8, **kw),
    )
    before = np.asarray(scorer.class_embeddings).copy()
    path = find_weights("clip")
    assert path == str(d / "clip.pth")
    scorer.load_clip_weights(load_state_dict_file(path))
    after = np.asarray(scorer.class_embeddings)
    assert not np.allclose(before, after)  # file weights took effect
    # loaded token embedding table is the file's, verbatim
    emb = scorer._text_params["params"]["model"]["token_embedding"]["embedding"]
    np.testing.assert_allclose(
        np.asarray(emb), sd["token_embedding.weight"].numpy(), atol=1e-6)
    imgs = np.random.RandomState(4).rand(2, 16, 16, 3).astype(np.float32)
    logits = scorer.logits(imgs * 2.0 - 1.0)
    assert logits.shape == (2, len(scorer.class_names))
    assert np.isfinite(logits).all()


# ------------------------------------------------------------ LPIPS file
def test_lpips_loads_from_weights_dir(tmp_path, monkeypatch):
    from ealdm_tpu.losses.lpips import LPIPS

    twin = randomize_(TLPIPS())
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(twin.state_dict(), str(d / "vgg_lpips.pth"))
    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(d))

    rng = np.random.RandomState(2)
    x = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    y = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    net = LPIPS()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = load_lpips_params(params)
    got = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        ref = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(y).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    # without a weights dir the init params pass through unchanged
    monkeypatch.delenv("EALDM_WEIGHTS_DIR")
    p2 = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    assert load_lpips_params(p2) is p2


def test_weights_dir_warns_on_nonexistent(tmp_path, monkeypatch):
    """A SET but nonexistent EALDM_WEIGHTS_DIR is a typo'd deployment —
    warn loudly instead of silently running every trunk random-init."""
    from ealdm_tpu.weights import weights_dir

    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(tmp_path / "missing"))
    with pytest.warns(UserWarning, match="NOT be loaded"):
        assert weights_dir() is None
    monkeypatch.delenv("EALDM_WEIGHTS_DIR")
    assert weights_dir() is None  # unset: silent


def test_load_fid_weights_before_forward(monkeypatch):
    """load_fid_weights on a fresh model must not run a forward pass to
    build the trunk (the old lazy-build path compiled a throwaway 8x8
    program); installed weights drive the first real forward."""
    from test_third_stage import _FakeDiffusion

    from ealdm_tpu.third_stage import ThirdStageModel

    monkeypatch.delenv("EALDM_WEIGHTS_DIR", raising=False)
    twin = randomize_(TInceptionV3())
    model = ThirdStageModel(_FakeDiffusion(), {"params": {}},
                            clip_image_size=32)
    model.load_fid_weights(twin.state_dict())  # no forward yet
    img = np.random.RandomState(1).rand(1, 299, 299, 3).astype(np.float32)
    got = np.asarray(model._fid_feats(jnp.asarray(img) * 2.0 - 1.0))
    with torch.no_grad():
        ref = twin(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_vae_trainer_autoinstalls_lpips(tmp_path, monkeypatch):
    """init_vae_train_state picks up vgg_lpips.pth from $EALDM_WEIGHTS_DIR —
    the trainer-side counterpart of the reference's runtime LPIPS download
    (contperceptual.py:4)."""
    from ealdm_tpu.losses import LPIPSWithDiscriminator
    from ealdm_tpu.models.vae import AutoencoderKL
    from ealdm_tpu.training import init_vae_train_state

    twin = randomize_(TLPIPS())
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(twin.state_dict(), str(d / "vgg_lpips.pth"))

    tiny_dd = dict(
        double_z=True, z_channels=2, resolution=32, in_channels=3, out_ch=3,
        ch=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    vae = AutoencoderKL(ddconfig=tiny_dd, embed_dim=2)
    loss_mod = LPIPSWithDiscriminator(
        disc_start=0, kl_weight=1e-6, disc_weight=0.5, disc_num_layers=1,
        perceptual_weight=1.0,
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)

    monkeypatch.delenv("EALDM_WEIGHTS_DIR", raising=False)
    state_rand, _, _ = init_vae_train_state(
        vae, loss_mod, jax.random.PRNGKey(0), x, learning_rate=1e-3)
    monkeypatch.setenv("EALDM_WEIGHTS_DIR", str(d))
    state_file, _, _ = init_vae_train_state(
        vae, loss_mod, jax.random.PRNGKey(0), x, learning_rate=1e-3)

    p_rand = state_rand.loss_params["perceptual"]
    p_file = state_file.loss_params["perceptual"]
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(p_rand)[0]),
        np.asarray(jax.tree_util.tree_leaves(p_file)[0]),
    )
    # one installed tensor verbatim from the file
    got = np.asarray(p_file["vgg"]["conv0_0"]["kernel"])
    ref = twin.state_dict()["net.slice1.0.weight"].numpy()
    np.testing.assert_allclose(
        got, np.transpose(ref, (2, 3, 1, 0)), atol=1e-6)


# ------------------------------------------------- real weights (optional)
@pytest.mark.skipif(
    not os.environ.get("EALDM_WEIGHTS_DIR")
    or not os.path.isdir(os.environ.get("EALDM_WEIGHTS_DIR", "")),
    reason="EALDM_WEIGHTS_DIR not provided (zero-egress CI)",
)
def test_real_pretrained_weights_load():
    """Deployment check: whatever real checkpoints the provided directory
    holds load through the exact auto-install paths and produce finite
    features. Skipped when no weights directory exists."""
    from test_third_stage import _FakeDiffusion

    from ealdm_tpu.third_stage import CLIPZeroShot, ThirdStageModel

    ran = []
    if find_weights("inception"):
        model = ThirdStageModel(_FakeDiffusion(), {"params": {}},
                                clip_image_size=32)
        feats = np.asarray(
            model._fid_feats(jnp.zeros((1, 96, 96, 3), jnp.float32)))
        assert feats.shape == (1, 2048) and np.isfinite(feats).all()
        ran.append("inception")
    if find_weights("clip"):
        scorer = CLIPZeroShot()
        scorer.load_clip_weights(load_state_dict_file(find_weights("clip")))
        logits = scorer.logits(np.zeros((1, 224, 224, 3), np.float32))
        assert np.isfinite(logits).all()
        ran.append("clip")
    if find_weights("lpips"):
        from ealdm_tpu.losses.lpips import LPIPS

        net = LPIPS()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = load_lpips_params(net.init(jax.random.PRNGKey(0), x, x))
        assert np.isfinite(np.asarray(net.apply(params, x, x))).all()
        ran.append("lpips")
    assert ran, "weights dir set but no canonical checkpoint found"
