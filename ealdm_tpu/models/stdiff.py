"""STDiff environment-conditioning tower, TPU-native flax (NHWC).

Parity target: `/root/reference/STDiff/models.py`:
  UnetCond (411-539)            -> UnetCond
  ConditioningTransform (140-236) -> ConditioningTransform
  CondScale (283-309)           -> CondScale
  FullyConnectedLayer (239-276) -> EqualizedDense (uses the fused bias_act op)
  WeatherLSTM (312-336)         -> EnvLSTM (lax.scan over time)
  AdaIN (362-377)               -> AdaIN
  TimeEmbeddings (339-359)      -> day_year_time_embedding
  parse_noises / calendar units (90-109) -> parse_noises

Behaviour notes reproduced deliberately:
  * The image branch runs through the FROZEN first-stage VQ encoder (injected
    by LatentDiffusion, reference `ddpm.py:535-536` / used at `models.py:515`);
    here the encoder features are an explicit input `img_feat`, keeping the
    tower a pure function (no cross-module mutation).
  * The negative/unconditional branch (`mixed[-1] is None`, `models.py:517`)
    skips the AdaIN fusion entirely; here that is the static flag `fuse_env`
    so both branches compile to static graphs (no pytree-shape switching).
  * CondScale's near-DC initialisation (weights*1e-6, col0+1, `models.py:293`).
  * The LSTM head FC is applied over all timesteps reshaped (B*T, hidden).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import bias_act
from ..ops.norms import instance_norm_2d

Dtype = jnp.dtype


# -------------------------------------------------------------- calendar noise
def _frames_per(unit: str, n_frames: float, n_days: float) -> float:
    per_day = n_frames / n_days
    return {
        "hour": per_day / 24,
        "day": per_day,
        "week": per_day * 7,
        "month": per_day * (365.25 / 12),
        "year": per_day * 365.25,
    }[unit]


def parse_noises(noises, n_frames=None, n_days=None):
    """Convert entries like '2.5years' to frame-delta sigmas."""
    out = []
    for n in noises:
        if isinstance(n, (int, float)):
            out.append(float(n))
            continue
        for unit in ("hour", "day", "week", "month", "year"):
            if unit in n:
                out.append(_frames_per(unit, n_frames, n_days) * float(n.split(unit)[0]))
                break
        else:
            raise ValueError(f"unknown noise scale: {n}")
    return out


def day_year_time_embedding(time: jnp.ndarray) -> jnp.ndarray:
    """sin/cos of daily + yearly cycles: [B] -> [B, 4]."""
    f0 = 1.0
    f1 = f0 / 365.25
    two_pi = 2 * math.pi
    return jnp.stack(
        [
            jnp.sin(two_pi * f0 * time),
            jnp.cos(two_pi * f0 * time),
            jnp.sin(two_pi * f1 * time),
            jnp.cos(two_pi * f1 * time),
        ],
        axis=1,
    )


# -------------------------------------------------------------- cond transform
class ConditioningTransform:
    """Cyclic Fourier features of (scaled) capture time; stateless/pure.

    cond_args keys (reference YAML `cond_args`): type, dequant, noise,
    noise_f_int, noise_f, dims, lr, lin_lr, f_manual, include_lin, t_delta.
    """

    def __init__(self, cond_args: Dict[str, Any], num_ws: int = 1, add_noise: bool = False):
        self.cond_args = dict(cond_args)
        self.num_ws = num_ws
        self.add_noise = add_noise
        self.explicit_lin = bool(self.cond_args.get("include_lin", False))
        self.freqs = self._frequencies()
        self.num_f = len(self.freqs)

    def _frequencies(self) -> np.ndarray:
        if self.cond_args.get("type") not in ("fourier", "f_concat"):
            return np.zeros((0,), np.float32)
        freqs = list(self.cond_args.get("f_manual", []))
        if self.explicit_lin:
            freqs = [-1.0] + freqs
        return np.sort(np.asarray(freqs, dtype=np.float32))

    def _noised(self, c: jnp.ndarray, rng: Optional[jax.Array], training: bool):
        if not (training and self.add_noise and rng is not None):
            return c
        ca = self.cond_args
        keys = jax.random.split(rng, 3)
        # global gaussian noise in frame deltas
        if ca.get("noise"):
            c = c + float(ca["noise"]) * float(ca.get("t_delta", 1.0)) * jax.random.normal(
                keys[0], c.shape, c.dtype
            )
        # integer jumps at given frequencies
        if ca.get("noise_f_int"):
            tuples = [t for t in ca["noise_f_int"] if t]
            if tuples:
                scales = jnp.asarray([s for s, _ in tuples], jnp.float32)
                ifreqs = jnp.asarray([1.0 / f for _, f in tuples], jnp.float32)
                jumps = ifreqs * jnp.round(
                    scales * jax.random.normal(keys[1], c.shape + (len(tuples),))
                )
                c = c + jnp.sum(jumps, axis=-1)
        # per-frequency gaussian noise (broadcasts over trailing freq dim)
        if ca.get("type") in ("fourier", "f_concat") and ca.get("noise_f"):
            s = jnp.asarray(parse_noises(ca["noise_f"]), jnp.float32)
            c = c + s * float(ca.get("t_delta", 1.0)) * jax.random.normal(
                keys[2], c.shape[:-1] + (self.num_f,), jnp.float32
            )
        return c

    def __call__(
        self,
        c: jnp.ndarray,
        broadcast: bool = True,
        rng: Optional[jax.Array] = None,
        training: bool = False,
    ) -> jnp.ndarray:
        """c: [B, 1] (global) or [B, #freq] -> [B, num_ws, dims] fourier feats."""
        ca = self.cond_args
        c = self._noised(c, rng, training)
        if ca.get("type") in ("fourier", "f_concat"):
            freqs = jnp.asarray(self.freqs)
            angles = 2 * np.pi * freqs * c  # [B, num_f] via broadcast
            cos = jnp.cos(angles)
            sin = jnp.sin(angles)
            if self.explicit_lin:
                # frequency -1 slot becomes the explicit linear term
                cos = cos.at[..., 0].set(1.0)
                sin = sin.at[..., 0].set(float(ca.get("lin_lr", 1e-2)) * c[..., 0])
            c = jnp.stack([cos, sin], axis=-1).reshape(*c.shape[:-1], -1)
        if broadcast and c.ndim == 2:
            c = jnp.repeat(c[:, None, :], self.num_ws, axis=1)
        return c


# -------------------------------------------------------------- equalized FC
class EqualizedDense(nn.Module):
    """StyleGAN-style FC: unit-normal weights scaled at runtime by
    lr_multiplier/sqrt(fan_in); activation through the fused bias_act op."""

    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init_value: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            lambda rng: jax.random.normal(rng, (self.features, in_features))
            / self.lr_multiplier,
        )
        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        b = (
            self.param(
                "bias",
                lambda rng: jnp.full((self.features,), self.bias_init_value, jnp.float32),
            )
            if self.use_bias
            else None
        )
        y = x @ (w.astype(x.dtype).T * weight_gain)
        if b is not None and self.lr_multiplier != 1:
            b = b * self.lr_multiplier
        if self.activation == "linear":
            return y + b.astype(y.dtype) if b is not None else y
        return bias_act(y, b, act=self.activation)


class CondScale(nn.Module):
    """Fourier features -> per-channel style scales (near-DC init)."""

    channels: int
    cond_args: Dict[str, Any]
    w_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, w=None, c=None):
        styles = None
        if self.w_dim is not None and w is not None:
            styles = EqualizedDense(
                self.channels, bias_init_value=1.0, name="w_affine", dtype=self.dtype
            )(w)
        if self.cond_args.get("type") == "fourier":
            c_dim = c.shape[-1]

            def dc_init(rng):
                w0 = jax.random.normal(rng, (self.channels, c_dim)) * 1e-6
                return w0.at[:, 0].add(1.0)

            w_scales = self.param("c_to_scales_weight", dc_init)
            gain = float(self.cond_args.get("lr", 1)) / math.sqrt(c_dim)
            scales = c @ (w_scales.astype(c.dtype).T * gain)
            styles = styles * scales if styles is not None else scales
        return styles


# -------------------------------------------------------------- env LSTM
class EnvLSTM(nn.Module):
    """LSTM over an env time-series + 2-layer FC head on every step.

    The recurrence is a `flax.linen.scan` over time (compiles to one fused
    lax.scan); input [B, T, D] -> output [B*T, emb] (reference reshapes all
    steps through the head, `STDiff/models.py:330-335`).
    """

    hidden_size: int
    output_size: int
    num_layers: int = 1
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, t, d = x.shape
        h = x.astype(self.dtype)
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{layer}")
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, h.shape[-1]))
            scanner = nn.scan(
                lambda cell, carry, xt: cell(carry, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            carry, h = scanner(cell, carry, h)
        h = h.reshape(b * t, self.hidden_size)
        h = nn.relu(nn.Dense(self.output_size, name="fc_0", dtype=self.dtype)(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.output_size, name="fc_2", dtype=self.dtype)(h)


class ConvBlock(nn.Module):
    """conv-norm-relu x2 + stride-2 transform (reference ConvBlock,
    STDiff/models.py:380-396; GroupNorm for the SPMD-hostile BatchNorm)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=_norm_groups(self.out_ch), name="norm1")(x))
        x = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2", dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=_norm_groups(self.out_ch), name="norm2")(x))
        return nn.Conv(
            self.out_ch, (4, 4), strides=(2, 2), padding=1, name="transform",
            dtype=self.dtype,
        )(x)


class AdaIN(nn.Module):
    """InstanceNorm + style-conditioned (1+gamma)*x + beta."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        c = x.shape[-1]
        x = instance_norm_2d(x)
        h = nn.Dense(2 * c, name="linear", dtype=self.dtype)(w)
        gamma, beta = jnp.split(h, 2, axis=-1)
        return x * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


def _norm_groups(c: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if c % g == 0:
            return g
    return 1


# -------------------------------------------------------------- the tower
class UnetCond(nn.Module):
    """Environment-aware conditioning tower -> cross-attention context.

    Inputs are the encoded previous-frame features plus env series; output is
    a [B, mid_dim, out_dim] context consumed by the UNet cross-attention.

    `fuse_env=False` is the negative/unconditional branch: AdaIN fusion is
    skipped and the raw image features go straight to the out head.
    """

    mid_dim: int = 4          # channels of the injected VQ-encoder features
    emb_dim: int = 128
    out_dim: int = 512
    w_dim: int = 16           # weather feature dim
    f_dim: int = 1            # flow feature dim
    t_dim: int = 6            # fourier dims of the time features
    hidden_dim: int = 1024
    num_layers: int = 1
    num_ws: int = 1
    cond_args: Dict[str, Any] = None
    # conv_cat normalization: "group" (TPU-first default, see below) or
    # "frozen_bn" (eval-mode BatchNorm with imported running stats — exact
    # reference numerics for torch weight import / parity testing)
    norm: str = "group"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        img_feat: jnp.ndarray,   # [B, h, w, mid_dim] frozen-VQ-encoded prev frame
        flow: jnp.ndarray,       # [B, T, f_dim]
        weather: jnp.ndarray,    # [B, T, w_dim]
        time: jnp.ndarray,       # [B, 1] scaled capture time
        fuse_env: bool = True,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cond_args = self.cond_args or {
            "type": "fourier", "dims": self.t_dim, "f_manual": [], "include_lin": True,
            "lin_lr": 0.01, "lr": 1,
        }
        xform = ConditioningTransform(cond_args, num_ws=self.num_ws)
        cs = xform(time.astype(jnp.float32), broadcast=True)
        c0 = cs[:, 0, :]

        h = img_feat
        if fuse_env:
            t_style = CondScale(
                self.emb_dim, cond_args, name="scaled_styles", dtype=self.dtype
            )(c=c0)
            f_emb = EnvLSTM(
                self.hidden_dim, self.emb_dim, self.num_layers, name="f_mlp",
                dtype=self.dtype,
            )(flow.astype(self.dtype), deterministic=deterministic)
            w_emb = EnvLSTM(
                self.hidden_dim, self.emb_dim, self.num_layers, name="w_mlp",
                dtype=self.dtype,
            )(weather.astype(self.dtype), deterministic=deterministic)

            w_style = AdaIN(name="wadain", dtype=self.dtype)(h, w_emb)
            f_style = AdaIN(name="fadain", dtype=self.dtype)(h, f_emb)
            ts_style = AdaIN(name="tadain", dtype=self.dtype)(h, t_style)

            combined = jnp.concatenate([h, w_style, f_style, ts_style], axis=-1)
            combined = nn.Conv(self.mid_dim, (3, 3), padding=1, name="conv_cat_0", dtype=self.dtype)(combined)
            # TPU-first deviation: the reference's BatchNorm2d here
            # (`STDiff/models.py:476`) carries running stats that would need
            # cross-replica sync under SPMD; GroupNorm is stateless with the
            # same normalize-then-affine role. Documented, intentional.
            # norm="frozen_bn" keeps exact reference eval numerics for
            # torch-weight import (running stats become plain params).
            if self.norm == "frozen_bn":
                from .resnet import FrozenBatchNorm

                combined = FrozenBatchNorm(self.mid_dim, name="conv_cat_norm")(combined)
            else:
                combined = nn.GroupNorm(
                    num_groups=_norm_groups(self.mid_dim), name="conv_cat_norm"
                )(combined)
            combined = nn.relu(combined)
            combined = nn.Conv(self.mid_dim, (3, 3), padding=1, name="conv_cat_3", dtype=self.dtype)(combined)
            h = combined + h

        # out head: per-channel token MLP  [B, hw] per channel -> out_dim
        b, fh, fw, c = h.shape
        tokens = h.transpose(0, 3, 1, 2).reshape(b, c, fh * fw)
        tokens = nn.relu(nn.Dense(self.mid_dim * fh * fw, name="out_0", dtype=self.dtype)(tokens))
        tokens = nn.Dropout(0.1, deterministic=deterministic)(tokens)
        context = nn.Dense(self.out_dim, name="out_3", dtype=self.dtype)(tokens)
        return context  # [B, mid_dim, out_dim]
