"""Per-shape microbenchmarks: XLA conv efficiency vs matmul peak."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import ealdm_tpu

ealdm_tpu.enable_inference_optimizations()


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8]))
    return (time.perf_counter() - t0) / iters


B = 16


def conv_bench(H, Cin, Cout, k=3):
    x = jnp.ones((B, H, H, Cin), jnp.bfloat16)
    w = jnp.ones((k, k, Cin, Cout), jnp.bfloat16)
    f = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    )
    dt = timeit(f, x, w)
    flops = 2 * B * H * H * k * k * Cin * Cout
    print(f"conv {H:3d}^2 {Cin:4d}->{Cout:4d} k{k}: {dt*1e3:7.3f} ms  "
          f"{flops/dt/1e12:6.1f} TF/s")
    return dt


def mm_bench(M, K, N):
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
    dt = timeit(f, a, b)
    print(f"mm {M}x{K}x{N}: {dt*1e3:7.3f} ms  {2*M*K*N/dt/1e12:6.1f} TF/s")


print("=== matmuls (peak probes)")
mm_bench(8192, 8192, 8192)
mm_bench(16384, 256, 256)
mm_bench(16384, 512, 512)
mm_bench(1024, 2048, 1024)

print("=== UNet conv shapes (B=16)")
conv_bench(32, 256, 256)
conv_bench(32, 512, 256)   # up-path concat skip
conv_bench(16, 512, 512)
conv_bench(16, 1024, 512)
conv_bench(8, 1024, 1024)
conv_bench(8, 2048, 1024)
conv_bench(32, 4, 256)     # conv_in (K=36 pad)

print("=== attention (level-0 self-attn building blocks)")
# flash kernel as used
from ealdm_tpu.ops.attention import flash_attention

q = jnp.ones((16, 8, 1024, 32), jnp.bfloat16)
f = jax.jit(lambda q: flash_attention(q, q, q))
dt = timeit(f, q)
fl = 2 * 128 * 1024 * 1024 * 32 * 2
print(f"flash [16,8,1024,32]: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s")
# dense reference: batched matmul scores + AV
def dense(q):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, q).astype(jnp.bfloat16)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", p, q)
f2 = jax.jit(dense)
dt = timeit(f2, q)
print(f"dense [16,8,1024,32]: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s")
