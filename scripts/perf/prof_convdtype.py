"""Conv variants: accumulation dtype, flax-style vs explicit, batch scaling."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

K = 50


def timeit_looped(make_op, x, w, flops, tag):
    op = make_op

    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = op(c, w)
            return c + (y.ravel()[0]).astype(c.dtype) * 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    out = loop(x, w)
    _ = float(jnp.sum(out.ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(x, w)
    _ = float(jnp.sum(out.ravel()[:4]))
    dt = (time.perf_counter() - t0) / (3 * K)
    print(f"{tag:44s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")


def conv(x, w, pe=None):
    kw = {} if pe is None else {"preferred_element_type": pe}
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw
    )


for B in (16, 32):
    x = jnp.ones((B, 32, 32, 256), jnp.bfloat16)
    w = jnp.ones((3, 3, 256, 256), jnp.bfloat16) * 1e-3
    fl = 2 * B * 1024 * 9 * 256 * 256
    timeit_looped(lambda c, w: conv(c, w).astype(jnp.bfloat16),
                  x, w, fl, f"B{B} 32^2 256 bf16 acc-default")
    timeit_looped(lambda c, w: conv(c, w, jnp.float32).astype(jnp.bfloat16),
                  x, w, fl, f"B{B} 32^2 256 bf16 acc-f32")
    # fp32 weights like flax default params + bf16 compute cast
    w32 = w.astype(jnp.float32)
    timeit_looped(lambda c, w: conv(c, w.astype(jnp.bfloat16)).astype(jnp.bfloat16),
                  x, w32, fl, f"B{B} 32^2 256 w-f32-cast")

# im2col-as-matmul equivalent for 32^2 256->256
B = 16
x = jnp.ones((B * 1024, 9 * 256), jnp.bfloat16)
w = jnp.ones((9 * 256, 256), jnp.bfloat16) * 1e-3
fl = 2 * B * 1024 * 9 * 256 * 256
timeit_looped(lambda c, w: (c @ w).astype(jnp.bfloat16).repeat(9, -1)[:, : 9 * 256],
              x, w, fl, "B16 im2col-matmul16384x2304x256+expand")

# pure matmul same flops/shape
timeit_looped(lambda c, w: (c @ w), x, w, fl, "B16 matmul 16384x2304x256 (bf16 out)")
