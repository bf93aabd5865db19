"""Secondary components: EncoderUNet, classifier, VAE extras, util helpers."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.models import EncoderUNetModel, NoisyLatentImageClassifier, ResNet50
from ealdm_tpu.models.vae_extras import (
    LatentRescaler,
    LinearAttention,
    MergedRescaleDecoder,
    MergedRescaleEncoder,
    SimpleDecoder,
    SpatialSelfAttention,
    UpsampleDecoder,
    Upsampler,
)
from ealdm_tpu.util import count_params, ismap, isimage, log_txt_as_img, mean_flat


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial"])
def test_encoder_unet_pools(pool):
    m = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=8, out_channels=5,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_head_channels=4, pool=pool,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 5])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 5)


def test_noisy_latent_classifier():
    m = NoisyLatentImageClassifier(
        classifier_config=dict(
            image_size=8, in_channels=4, model_channels=8, num_res_blocks=1,
            attention_resolutions=[], channel_mult=[1], num_head_channels=4,
        ),
        num_classes=7,
        diffusion_timesteps=50,
    )
    z = jnp.ones((2, 8, 8, 4)) * 0.1
    labels = jnp.array([1, 4])
    params = m.init(
        {"params": jax.random.PRNGKey(0)}, z, labels, jax.random.PRNGKey(1)
    )
    loss, metrics = m.apply(params, z, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    # guidance gradient has latent shape
    g = m.classifier_gradient(
        params["params"], z, jnp.array([10, 20]), jnp.array([0, 1])
    )
    assert g.shape == z.shape


def test_resnet50_features():
    m = ResNet50()
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert feats.shape == (1, 2, 2, 2048)
    pooled = m.apply(params, x, pool=True)
    assert pooled.shape == (1, 2048)


def test_vae_extras_shapes(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    sd = SimpleDecoder(out_channels=3)
    p = sd.init(jax.random.PRNGKey(0), x)
    assert sd.apply(p, x).shape == (1, 16, 16, 3)

    ud = UpsampleDecoder(out_channels=3, ch=8, num_res_blocks=1, ch_mult=(2, 2))
    p = ud.init(jax.random.PRNGKey(0), x)
    assert ud.apply(p, x).shape == (1, 16, 16, 3)

    lr = LatentRescaler(factor=2.0, mid_channels=16, out_channels=4)
    p = lr.init(jax.random.PRNGKey(0), x)
    assert lr.apply(p, x).shape == (1, 16, 16, 4)

    la = LinearAttention()
    p = la.init(jax.random.PRNGKey(0), x)
    assert la.apply(p, x).shape == x.shape

    ssa = SpatialSelfAttention()
    p = ssa.init(jax.random.PRNGKey(0), x)
    assert ssa.apply(p, x).shape == x.shape


def test_merged_rescale_and_upsampler_shapes(rng):
    """model.py:692-761 composites: encoder+rescaler, rescaler+decoder,
    and the log2-ladder Upsampler."""
    img = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    enc = MergedRescaleEncoder(
        ch=8, out_ch=4, resolution=16, num_res_blocks=1,
        attn_resolutions=(), ch_mult=(1, 2), rescale_factor=1.0,
    )
    p = enc.init(jax.random.PRNGKey(0), img)
    z = enc.apply(p, img)
    assert z.shape == (1, 8, 8, 4)

    dec = MergedRescaleDecoder(
        z_channels=4, out_ch=3, resolution=16, num_res_blocks=1,
        attn_resolutions=(), ch=8, ch_mult=(1, 2), rescale_factor=1.0,
    )
    p = dec.init(jax.random.PRNGKey(0), z)
    out = dec.apply(p, z)
    assert out.shape == (1, 16, 16, 3)

    ups = Upsampler(in_size=8, out_size=16, in_channels=4, out_channels=3)
    zz = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    p = ups.init(jax.random.PRNGKey(0), zz)
    out = ups.apply(p, zz)
    assert out.shape == (1, 16, 16, 3)


def test_util_helpers():
    imgs = log_txt_as_img((64, 64), ["hello world", "a river"])
    assert imgs.shape == (2, 64, 64, 3)
    assert ismap(np.zeros((1, 4, 4, 8))) and not ismap(np.zeros((1, 4, 4, 3)))
    assert isimage(np.zeros((1, 4, 4, 3))) and not isimage(np.zeros((1, 4, 4, 5)))
    assert float(mean_flat(jnp.ones((2, 3, 4)))[0]) == 1.0
    n = count_params({"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}})
    assert n == 10


def test_parallel_data_prefetch():
    from ealdm_tpu.util import parallel_data_prefetch

    out = parallel_data_prefetch(lambda x: x * 2, list(range(10)), n_proc=3,
                                 target_data_type="list")
    assert out == [x * 2 for x in range(10)]
    arr = parallel_data_prefetch(lambda x: x + 1, np.arange(5), n_proc=2)
    np.testing.assert_array_equal(arr, np.arange(5) + 1)


def test_compute_top_k_matches_reference_semantics():
    """compute_top_k (classifier.py:150-155): label within k highest logits."""
    from ealdm_tpu.models.classifier import compute_top_k

    logits = jnp.asarray([
        [0.1, 0.9, 0.5, 0.2],   # top1 = 1, top2 = {1, 2}
        [0.8, 0.1, 0.2, 0.7],   # top1 = 0, top2 = {0, 3}
    ])
    labels = jnp.asarray([1, 3])
    assert float(compute_top_k(logits, labels, 1)) == 0.5
    assert float(compute_top_k(logits, labels, 2)) == 1.0
    np.testing.assert_array_equal(
        np.asarray(compute_top_k(logits, labels, 2, "none")), [1.0, 1.0]
    )


def test_noisy_accuracy_sweep():
    """Per-timestep acc sweep (classifier.py:203-218) over the t grid."""
    m = NoisyLatentImageClassifier(
        classifier_config=dict(
            image_size=8, in_channels=4, model_channels=8, num_res_blocks=1,
            attention_resolutions=[], channel_mult=[1], num_head_channels=4,
        ),
        num_classes=7,
        diffusion_timesteps=50,
    )
    z = jnp.ones((2, 8, 8, 4)) * 0.1
    labels = jnp.array([1, 4])
    params = m.init(
        {"params": jax.random.PRNGKey(0)}, z, labels, jax.random.PRNGKey(1)
    )
    noise = jax.random.normal(jax.random.PRNGKey(3), z.shape)
    out = m.apply(params, z, labels, noise, log_every_t=10,
                  method=m.noisy_accuracy)
    assert out["t"].shape == (5,)
    assert out["acc@1"].shape == (5,)
    assert np.all(np.asarray(out["acc@5"]) >= np.asarray(out["acc@1"]) - 1e-6)


def test_hybrid_conditioner():
    """HybridConditioner (diffusionmodules/util.py:251-261) builds both
    sub-conditioners from configs and emits the hybrid context dict."""
    from ealdm_tpu.models.encoders import HybridConditioner

    m = HybridConditioner(
        c_concat_config={
            "target": "ldm.modules.encoders.modules.SpatialRescaler",
            "params": {"n_stages": 1, "out_channels": 4, "in_channels": 3},
        },
        c_crossattn_config={
            "target": "ldm.modules.encoders.modules.ClassEmbedder",
            "params": {"embed_dim": 16, "n_classes": 10},
        },
    )
    img = jnp.ones((2, 16, 16, 3))
    cls = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), img, cls)
    out = m.apply(params, img, cls)
    assert set(out) == {"c_concat", "c_crossattn"}
    assert out["c_concat"][0].shape == (2, 8, 8, 4)
    assert out["c_crossattn"][0].shape[0] == 2


def test_profiled_function_decorator():
    """profiled_function labels the call in profiler traces and is
    transparent to the result (reference torch_utils/misc.py:100-106)."""
    from ealdm_tpu.misc import profiled_function

    import jax.numpy as jnp

    @profiled_function
    def double(x):
        return x * 2

    assert double.__name__ == "double"
    assert float(double(jnp.asarray(3.0))) == 6.0


def test_hinge_d_loss_with_exemplar_weights_matches_reference_formula():
    """Weighted hinge loss matches the reference torch formula
    (vqperceptual.py:11-18) on the same tensors."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ealdm_tpu.losses import hinge_d_loss_with_exemplar_weights

    rng = np.random.RandomState(0)
    lr = rng.randn(4, 1, 6, 6).astype(np.float32)
    lf = rng.randn(4, 1, 6, 6).astype(np.float32)
    w = rng.rand(4).astype(np.float32)

    tlr, tlf, tw = map(torch.from_numpy, (lr, lf, w))
    loss_real = torch.mean(F.relu(1.0 - tlr), dim=[1, 2, 3])
    loss_fake = torch.mean(F.relu(1.0 + tlf), dim=[1, 2, 3])
    ref = 0.5 * ((tw * loss_real).sum() / tw.sum()
                 + (tw * loss_fake).sum() / tw.sum())

    ours = hinge_d_loss_with_exemplar_weights(
        jnp.asarray(lr), jnp.asarray(lf), jnp.asarray(w))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_betas_for_alpha_bar_matches_reference():
    import math
    import sys

    import numpy as np

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.modules.diffusionmodules.util import (
        betas_for_alpha_bar as ref_fn,
    )

    from ealdm_tpu.ops.schedules import betas_for_alpha_bar

    abar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    ref = np.asarray(ref_fn(50, abar))
    ours = betas_for_alpha_bar(50, abar)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_augment_img_matches_reference_modes():
    import numpy as np

    from ealdm_tpu.data.degradation import augment_img

    rng = np.random.RandomState(0)
    img = rng.rand(5, 7, 3).astype(np.float32)
    # reference utils_image.py:380-398 formulas, written out
    ref = {
        0: img, 1: np.flipud(np.rot90(img)), 2: np.flipud(img),
        3: np.rot90(img, k=3), 4: np.flipud(np.rot90(img, k=2)),
        5: np.rot90(img), 6: np.rot90(img, k=2),
        7: np.flipud(np.rot90(img, k=3)),
    }
    for mode, want in ref.items():
        np.testing.assert_array_equal(augment_img(img, mode), want)


def test_transposed_upsample_shape_matches_torch():
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")

    from ealdm_tpu.models.layers import TransposedUpsample

    m = TransposedUpsample(out_channels=6, ks=5)
    x = jnp.zeros((2, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    ref = torch.nn.ConvTranspose2d(4, 6, kernel_size=5, stride=2)(
        torch.zeros(2, 4, 8, 8))
    assert y.shape == (2, ref.shape[2], ref.shape[3], 6)


def test_notebook_cond_selection_helpers(tmp_path):
    # other parity tests put /root/reference first on sys.path, which
    # shadows OUR top-level notebook_helpers — pin the repo copy
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = sys.modules.get("notebook_helpers")
    if mod is not None and not str(mod.__file__).startswith(repo):
        del sys.modules["notebook_helpers"]
    if sys.path[0] != repo:
        sys.path.insert(0, repo)
    import notebook_helpers as nh
    assert str(nh.__file__).startswith(repo)

    root = str(tmp_path / "example_conditioning")
    p = nh.get_custom_cond("text_conditional", "A cake with cream!", root=root)
    assert open(p).read() == "A cake with cream!"
    # path characters in the prompt must not escape the target directory
    p_evil = nh.get_custom_cond("text_conditional", "a/b\\c ../x", root=root)
    assert os.path.dirname(p_evil) == os.path.join(root, "text_conditional")
    assert open(p_evil).read() == "a/b\\c ../x"
    path, files = nh.get_cond_options("text_conditional", root=root)
    assert files and path.endswith("text_conditional")
    sel = nh.select_cond_path("text_conditional", index=0, root=root)
    assert sel == os.path.join(path, files[0])

    import numpy as np
    from PIL import Image

    img_src = tmp_path / "img.png"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(img_src)
    p2 = nh.get_custom_cond("superresolution", str(img_src), root=root)
    assert nh.visualize_cond_img(p2).size == (4, 4)
