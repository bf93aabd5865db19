"""int8-im2col experiment: per-shape speed vs direct bf16 conv on the real
chip, and output MSE of one flagship CFG denoiser call under
set_conv_impl("int8") vs bf16 on fixed inputs. End-to-end img/s comes from
`python bench.py --conv-impl int8`; verdict recorded in docs/PERF.md."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ealdm_tpu.ops.im2col_int8 import int8_im2col_conv  # noqa: E402
from ealdm_tpu.ops.winograd import set_conv_impl  # noqa: E402

K = 30


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timeit_looped(op, x, w, flops, tag):
    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = op(c, w)
            return c + (y.ravel()[0]).astype(c.dtype) * 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    out = loop(x, w); _ = float(jnp.sum(out.ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(x, w)
    _ = float(jnp.sum(out.ravel()[:4]))
    dt = (time.perf_counter() - t0) / (3 * K)
    print(f"{tag:28s}: {dt*1e3:7.3f} ms ({flops/dt/1e12:5.1f} direct-TF/s-eq)")
    return dt


def main():
    rng = np.random.RandomState(0)
    for (H, C, B) in ((32, 256, 16), (16, 512, 16), (8, 1024, 16)):
        x = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, C) / np.sqrt(9 * C), jnp.bfloat16)
        fl = 2 * B * H * H * 9 * C * C
        print(f"--- {H}^2 x {C}ch, B={B}")
        timeit_looped(direct, x, w, fl, "direct bf16 conv")
        timeit_looped(lambda a, b: int8_im2col_conv(a, b), x, w, fl,
                      "int8 im2col")
        ref = np.asarray(direct(x, w), np.float32)
        got = np.asarray(int8_im2col_conv(x, w), np.float32)
        err = np.abs(got - ref).mean() / np.abs(ref).mean()
        print(f"   rel-err int8 vs bf16 direct: {err:.2e}")

    # one flagship denoiser call: output MSE int8 vs bf16
    from ealdm_tpu.models.ddpm import DiffusionWrapper
    from __graft_entry__ import FLAGSHIP_UNET

    model = DiffusionWrapper(FLAGSHIP_UNET, "crossattn", dtype=jnp.bfloat16)
    b = 4
    x = jnp.asarray(rng.randn(b, 32, 32, 4), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (b,)), jnp.int32)
    ctx = jnp.asarray(rng.randn(b, 4, 512), jnp.float32)
    params = jax.jit(lambda r: model.init(r, x, t, c_crossattn=[ctx]))(
        jax.random.PRNGKey(0))
    # the UNet zero-inits its output conv (reference zero_module) -> a
    # fresh model outputs exactly 0; fill every param so the comparison
    # exercises real signal.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (0.05 * jax.random.normal(k, l.shape, jnp.float32)).astype(l.dtype)
        for k, l in zip(keys, leaves)
    ])
    fn = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c_crossattn=[c]))
    ref = np.asarray(fn(params, x, t, ctx), np.float32)
    set_conv_impl("int8")
    try:
        got = np.asarray(
            jax.jit(lambda p, x, t, c: model.apply(
                p, x, t, c_crossattn=[c]))(params, x, t, ctx), np.float32)
    finally:
        set_conv_impl("xla")
    mse = float(np.mean((got - ref) ** 2))
    rel = float(np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-12))
    print(f"denoiser output: mse={mse:.3e} rel-err={rel:.3e}")


if __name__ == "__main__":
    main()
