"""Scaled-dot-product attention for the UNet / VAE attention blocks.

Parity targets: `CrossAttention` (`/root/reference/ldm/modules/attention.py:
152-193`), `QKVAttentionLegacy` (`openaimodel.py:352-372`, the fp16-stable
"scale both q and k by ch^-1/4" trick) and the VAE `AttnBlock`
(`diffusionmodules/model.py:150-203`).

Default path: one batched einsum chain with fp32 softmax — at <=32x32=1024
latent tokens the whole score matrix fits comfortably in VMEM and XLA's
fusion is at the MXU roofline already.  A Pallas flash (blockwise, online
softmax) kernel is provided for larger token counts (64^2+), selected
automatically by sequence length.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["sdpa", "flash_attention", "flash_attention_packed",
           "set_attention_impl", "attention_impl"]

# Global attention implementation: "dense" (default), "flash" (fused
# Pallas kernel with a rematerialized dense backward — grad-safe), or
# "flash_packed" (flash whose q/k/v stay in the projection's native
# [B, N, H*D] layout with head split/merge done by kernel indexing —
# kills the [b,s,h,d]<->[b,h,s,d] HBM transposes the device trace named
# as the largest data-formatting cost, docs/PERF.md round 5). Measured
# on v5e: flash at >=256 tokens cuts the 256ch UNet step ~30% (the
# HBM-materialized score tensors dominate the attention cost). Dense stays
# the default for exact fp32 training parity (flash fwd is MXU-precision).
_ATTN_IMPL = "dense"


def set_attention_impl(mode: str):
    global _ATTN_IMPL
    assert mode in ("dense", "flash", "flash_packed")
    _ATTN_IMPL = mode


def attention_impl() -> str:
    return _ATTN_IMPL


def sdpa(q, k, v, scale=None):
    """Attention over [B, H, Nq, D] x [B, H, Nk, D] -> [B, H, Nq, D].

    Softmax statistics in fp32; the q/k pre-scaling by scale^0.5 mirrors the
    reference's fp16-stability trick and is exact in fp32.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ss = math.sqrt(scale)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * ss, k * ss, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (blockwise, online softmax) for long token counts.
# ---------------------------------------------------------------------------

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_k):
    """Online-softmax attention over a [G, block_q, d] query tile against
    the full [G, seq_k, d] k/v kept in VMEM. G > 1 batches several (batch,
    head) pairs per invocation — measured ~30% faster than per-head grid
    launches on v5e for the UNet's (1024 tokens, d=32) attention. G == 1
    uses 2D dots (the batched form lowers poorly at batch 1)."""
    g = q_ref.shape[0]
    num_kb = seq_k // block_k

    if g == 1:
        q = q_ref[0].astype(jnp.float32) * scale
        block_q, d = q.shape

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        return

    q = q_ref[...].astype(jnp.float32) * scale
    _, block_q, d = q.shape

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[:, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[:, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [G, block_q, block_k]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((g, block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((g, block_q, 1), jnp.float32)
    acc0 = jnp.zeros((g, block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pick_blocks(bh, nq, nk, d, itemsize, budget=13 * 1024 * 1024):
    """Largest (head_block G, block_q, block_k) fitting the VMEM budget.

    The kernel keeps the FULL [G, nk, d] k/v in VMEM (the UNet/VAE sequences
    are short); block_k tiles the inner loop's score buffer. All grid inputs
    (q/out AND k/v) are modelled double-buffered (grid pipelining). Larger G
    amortizes kernel-launch overhead (~30% measured at d=32/n=1024)."""

    def est(g, bq, bk):
        # Calibrated against Mosaic's reported scoped-vmem demand on v5e
        # ((g,bq,bk)=(8,128,1024) @ nk=1024,d=32 -> 18.81M; (8,512,128) ->
        # 20.52M). The two non-obvious terms: the [G,bq,1] online-softmax
        # carriers (m/l/alpha, ~6 live) are lane-padded to 128, and ~2.5
        # score-sized fp32 buffers stay live through the inner-loop dot.
        kv_in = 2 * 2 * g * nk * d * itemsize   # double-buffered k,v tiles
        qo_in = 2 * 2 * g * bq * d * itemsize   # double-buffered q,out tiles
        f32_state = 2 * g * bq * d * 4          # q cast + acc
        scalars = 6 * g * bq * 128 * 4          # m/l/alpha, lane-padded
        f32_kv = 2 * g * bk * d * 4             # per-block k,v casts
        scores = int(2.5 * g * bq * bk) * 4     # live score-sized buffers
        return kv_in + qo_in + f32_state + scalars + f32_kv + scores

    # Preference order, measured on v5e (256ch UNet, n=1024, d=32):
    # big block_k first (fewer inner iterations / bigger MXU dots dominate:
    # bk 1024->128 cost -22% end-to-end), then head-batching G, then bq.
    for bk in (1024, 512, 256, 128):
        if bk > nk or nk % bk:
            continue
        for g in (8, 4, 2, 1):
            if bh % g:
                continue
            for bq in (512, 256, 128):
                if bq > nq or nq % bq:
                    continue
                if est(g, bq, bk) <= budget:
                    return g, bq, bk
    return 1, min(nq, 128), min(nk, 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale=None, block_q=None, block_k=None, head_block=None):
    """Fused attention with a rematerialized backward.

    Forward: the Pallas kernel (scores never touch HBM). Backward: recompute
    through the dense formulation under jax.vjp — no score residuals are
    saved, so this is also the memory-efficient choice for training.
    q/k/v: [B, H, N, D] with N a multiple of the (auto-picked) blocks.
    """
    return _flash_forward(q, k, v, scale, block_q, block_k, head_block)


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, head_block):
    out = _flash_forward(q, k, v, scale, block_q, block_k, head_block)
    return out, (q, k, v)


def _flash_vjp_bwd(scale, block_q, block_k, head_block, res, g):
    q, k, v = res
    _, pullback = jax.vjp(lambda q_, k_, v_: sdpa(q_, k_, v_, scale), q, k, v)
    return pullback(g)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "head_block"))
def _flash_forward(q, k, v, scale=None, block_q=None, block_k=None, head_block=None):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    g_auto, bq_auto, bk_auto = _pick_blocks(bh, nq, nk, d, q.dtype.itemsize)
    g = head_block or g_auto
    block_q = min(block_q or bq_auto, nq)
    block_k = min(block_k or bk_auto, nk)
    assert nq % block_q == 0 and nk % block_k == 0 and bh % g == 0

    qf = q.reshape(bh, nq, d)
    kf = k.reshape(bh, nk, d)
    vf = v.reshape(bh, nk, d)

    def call(qc, kc, vc):
        rows = qc.shape[0]
        return pl.pallas_call(
            functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_k=nk),
            out_shape=jax.ShapeDtypeStruct((rows, nq, d), q.dtype),
            grid=(rows // g, nq // block_q),
            in_specs=[
                pl.BlockSpec((g, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (g, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        )(qc, kc, vc)

    # Large operands get staged whole into scoped VMEM by the TPU compiler
    # (~16MB/core): at bh*max(nq,nk)*d*itemsize beyond ~12MB that staging
    # OOMs, so split the (batch*head) axis into independent pallas_calls.
    # Each chunk is a multiple of G; single-chunk inputs are unaffected.
    row_bytes = max(nq, nk) * d * q.dtype.itemsize
    max_rows = max(g, int(12 * 1024 * 1024 / (row_bytes * 1.25)) // g * g)
    if bh <= max_rows:
        out = call(qf, kf, vf)
    else:
        n_chunks = -(-bh // max_rows)
        chunk = -(-bh // n_chunks // g) * g
        outs = [
            call(qf[s : s + chunk], kf[s : s + chunk], vf[s : s + chunk])
            for s in range(0, bh, chunk)
        ]
        out = jnp.concatenate(outs, axis=0)
    return out.reshape(b, h, nq, d)


# ---------------------------------------------------------------------------
# Packed-layout flash attention: q/k/v in the projection-native [B, N, H*D].
# ---------------------------------------------------------------------------
#
# Motivation (round-5 device trace, docs/PERF.md): the standard flash path
# receives q/k/v as [B, H, N, D], which the UNet produces from Dense outputs
# via reshape+transpose — XLA materializes that as HBM layout copies
# ([b,s,h,d]->{3,1,2,0} physical, 43.5 ms/run = ~1 ms/step at b24s6), plus a
# matching merge transpose on the output. Here the kernel reads the Dense
# output layout DIRECTLY: block over (batch, q-rows), keep all heads' columns
# in the tile (contiguous lanes), and slice each head's 32-lane strip inside
# VMEM. Split/merge become kernel indexing; no HBM re-layout exists.


def _flash_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads,
                         block_k, seq_k):
    """Online-softmax attention on packed tiles.

    q_ref: [1, block_q, H*D]; k_ref/v_ref: [1, seq_k, H*D] (full keys in
    VMEM — UNet sequences are short); o_ref: [1, block_q, H*D]. Per head,
    a d-strip of 32 lanes is statically sliced and attended independently;
    the per-head results are concatenated in VMEM and stored as ONE
    full-width tile (a d=32 lane-slice *store* is the op most likely to
    trip Mosaic's lane-alignment rules on real hardware — reads of
    unaligned strips lower to in-VMEM relayouts, which is the point).
    """
    d = q_ref.shape[-1] // heads
    num_kb = seq_k // block_k

    outs = []
    for hh in range(heads):
        q = q_ref[0, :, hh * d:(hh + 1) * d].astype(jnp.float32) * scale
        block_q = q.shape[0]

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k),
                      hh * d:(hh + 1) * d].astype(jnp.float32)
            v = v_ref[0, pl.ds(i * block_k, block_k),
                      hh * d:(hh + 1) * d].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        outs.append((acc / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_packed(q, k, v, heads, scale=None, block_q=None,
                           block_k=None):
    """Fused attention on packed [B, Nq, H*D] q / [B, Nk, H*D] k,v.

    Numerics identical to flash_attention on the split layout (same dots,
    same online softmax); backward rematerializes through dense sdpa like
    flash_attention. Returns [B, Nq, H*D] — feed straight into to_out."""
    return _flash_packed_forward(q, k, v, heads, scale, block_q, block_k)


def _packed_vjp_fwd(q, k, v, heads, scale, block_q, block_k):
    return _flash_packed_forward(q, k, v, heads, scale, block_q, block_k), (q, k, v)


def _packed_vjp_bwd(heads, scale, block_q, block_k, res, g):
    q, k, v = res

    def dense(q_, k_, v_):
        b, n, hd = q_.shape
        m = k_.shape[1]
        d = hd // heads
        qs = q_.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        ks = k_.reshape(b, m, heads, d).transpose(0, 2, 1, 3)
        vs = v_.reshape(b, m, heads, d).transpose(0, 2, 1, 3)
        o = sdpa(qs, ks, vs, scale)
        return o.transpose(0, 2, 1, 3).reshape(b, n, hd)

    _, pullback = jax.vjp(dense, q, k, v)
    return pullback(g)


flash_attention_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "block_q",
                                             "block_k", "interpret"))
def _flash_packed_forward(q, k, v, heads, scale=None, block_q=None,
                          block_k=None, interpret=False):
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    assert hd == heads * d
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # VMEM budget: full k/v tiles [1, nk, hd] live double-buffered.
    if block_q is None:
        block_q = min(nq, 512)
        while nq % block_q:
            block_q //= 2
    if block_k is None:
        block_k = min(nk, 1024)
        while nk % block_k:
            block_k //= 2

    return pl.pallas_call(
        functools.partial(_flash_packed_kernel, scale=scale, heads=heads,
                          block_k=block_k, seq_k=nk),
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        grid=(b, nq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v)


def tiny_ctx_attention_packed(q, k, v, heads, scale=None):
    """Cross-attention against a TINY context without re-laying-out q.

    q: [B, N, H*D] (projection-native packing, head-major columns);
    k/v: [B, M, H*D] with small M (the LDM cross-attn context is 4 tokens).

    Round-5 formatting experiment (docs/PERF.md): the dense per-head einsum
    makes XLA copy the big q to a seq-minor layout inside the DDIM scan
    (~0.5 ms/step at b24s6). Here the per-head dots become two plain matmuls
    against BLOCK-DIAGONAL K/V ([H*D, H*M] / [H*M, H*D]): q is consumed in
    its native layout, the h x h cross-head blocks are structurally zero, so
    the result is exactly per-head attention. The h-fold FLOP waste is
    negligible at M<=16 (the matmuls are ~1% of a UNet step). The block-diag
    builds are step-constant when k/v are hoisted (XLA LICM hoists them out
    of the scan, measured in round 4)."""
    b, n, hd = q.shape
    m = k.shape[1]
    d = hd // heads
    assert hd == heads * d
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    eye = jnp.eye(heads, dtype=q.dtype)
    kr = k.reshape(b, m, heads, d)
    vr = v.reshape(b, m, heads, d)
    # K_bd[(g,d'), (h,m')] nonzero only at g == h: exact per-head logits
    kbd = jnp.einsum("bmhd,gh->bgdhm", kr, eye).reshape(b, hd, heads * m)
    vbd = jnp.einsum("bmhd,gh->bgmhd", vr, eye).reshape(b, heads * m, hd)
    logits = jnp.einsum(
        "bnk,bkj->bnj", q * scale, kbd, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(
        logits.reshape(b, n, heads, m).astype(jnp.float32), axis=-1
    ).reshape(b, n, heads * m).astype(v.dtype)
    return jnp.einsum(
        "bnj,bjk->bnk", w, vbd, preferred_element_type=jnp.float32
    ).astype(v.dtype)
