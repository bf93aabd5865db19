"""Winograd F(2,3) / F(4,3) prototypes in pure XLA vs direct conv: speed + error."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

K = 30

# ---- F(2x2, 3x3): output tile 2, input tile 4
BT2 = np.array([
    [1, 0, -1, 0],
    [0, 1, 1, 0],
    [0, -1, 1, 0],
    [0, 1, 0, -1],
], np.float32)
G2 = np.array([
    [1, 0, 0],
    [0.5, 0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0, 0, 1],
], np.float32)
AT2 = np.array([
    [1, 1, 1, 0],
    [0, 1, -1, -1],
], np.float32)

# ---- F(4x4, 3x3): output tile 4, input tile 6
BT4 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
G4 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
AT4 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)


def winograd_conv(x, w, m, BT, G, AT, mm_dtype=jnp.bfloat16):
    """x: [N,H,W,Cin] bf16, w: [3,3,Cin,Cout]. SAME padding, stride 1."""
    r = BT.shape[0]  # input tile
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    tiles_h, tiles_w = H // m, W // m
    # pad H+2 borders for SAME; tiles overlap by r-m
    xp = jnp.pad(x, ((0, 0), (1, r - m - 1 + 1), (1, r - m - 1 + 1), (0, 0)))
    # gather overlapping tiles: [N, th, tw, r, r, Cin]
    idx_h = (jnp.arange(tiles_h) * m)[:, None] + jnp.arange(r)[None, :]
    idx_w = (jnp.arange(tiles_w) * m)[:, None] + jnp.arange(r)[None, :]
    t = xp[:, idx_h][:, :, :, idx_w]  # [N, th, r, tw, r, C]
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))  # [N, th, tw, r, r, C]
    tf = t.astype(jnp.float32)
    BTj = jnp.asarray(BT)
    # V = BT @ X @ B over the (r, r) dims
    V = jnp.einsum("ij,nthjkc->nthikc", BTj, tf)
    V = jnp.einsum("nthikc,kl->nthilc", V, BTj.T)  # [N,th,tw,r,r,C]
    V = V.reshape(N * tiles_h * tiles_w, r * r, Cin).astype(mm_dtype)

    wf = w.astype(jnp.float32)
    Gj = jnp.asarray(G)
    U = jnp.einsum("ij,jkcd->ikcd", Gj, wf)  # over kernel h
    U = jnp.einsum("ikcd,kl->ilcd", U, Gj.T)  # [r,r,Cin,Cout]
    U = U.reshape(r * r, Cin, Cout).astype(mm_dtype)

    # 36 (or 16) batched matmuls
    Y = jnp.einsum("npc,pcd->npd", V, U, preferred_element_type=jnp.float32)
    Y = Y.reshape(N, tiles_h, tiles_w, r, r, Cout)
    ATj = jnp.asarray(AT)
    y = jnp.einsum("ij,nthjkc->nthikc", ATj, Y)
    y = jnp.einsum("nthikc,kl->nthilc", y, ATj.T)  # [N,th,tw,m,m,Cout]
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(N, H, W, Cout)
    return y.astype(x.dtype)


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


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
    print(f"{tag:34s}: {dt*1e3:7.3f} ms  ({flops/dt/1e12:5.1f} direct-TF/s-equiv)")
    return dt


rng = np.random.RandomState(0)
for (H, C, B) in ((32, 256, 16), (16, 512, 16), (8, 1024, 16)):
    x = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) / np.sqrt(9 * C), jnp.bfloat16)
    fl = 2 * B * H * H * 9 * C * C
    print(f"--- {H}^2 x {C}ch, B={B}")
    td = timeit_looped(direct, x, w, fl, "direct conv")
    t2 = timeit_looped(partial(winograd_conv, m=2, BT=BT2, G=G2, AT=AT2), x, w, fl, "winograd F(2,3)")
    t4 = timeit_looped(partial(winograd_conv, m=4, BT=BT4, G=G4, AT=AT4), x, w, fl, "winograd F(4,3)")
    # numerics vs fp64
    x64 = np.asarray(x, np.float64)
    w64 = np.asarray(w, np.float64)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x64), jnp.asarray(w64), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    scale = np.abs(ref).mean()
    for name, fn in (("direct", direct),
                     ("F(2,3)", partial(winograd_conv, m=2, BT=BT2, G=G2, AT=AT2)),
                     ("F(4,3)", partial(winograd_conv, m=4, BT=BT4, G=G4, AT=AT4))):
        got = np.asarray(jax.jit(fn)(x, w), np.float64)
        err = np.abs(got - ref).mean() / scale
        print(f"   err {name}: {err:.2e}")
