"""Torch checkpoint <-> flax param tree key mapping.

Enables loading the reference's Lightning checkpoints (UNet, VQ/KL
autoencoders, full LatentDiffusion `state_dict`s — the format written by
`/root/reference/main.py` ModelCheckpoint and consumed by `init_from_ckpt`,
`ddpm.py:188-204`) into this framework's flax modules for output-parity
testing, and exporting back.

Tensor conventions translated:
  torch Conv2d  OIHW  <->  flax Conv HWIO kernel
  torch Linear  (out, in) <-> flax Dense (in, out) kernel
  torch Conv1d  (out, in, 1) <-> flax Dense (in, out) (qkv/proj in AttnBlock)
  GroupNorm/LayerNorm weight/bias <-> scale/bias
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------------- utils
def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def to_numpy(v: Any) -> np.ndarray:
    """torch tensor or array-like -> np.ndarray (detached, on host)."""
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def tree_put(tree: Dict, path: Sequence[str], value: Any) -> None:
    """Insert `value` at the nested `path` in a param dict, creating nodes."""
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def conv_to_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# ------------------------------------------------------------- UNet key map
def unet_key_map(cfg: Dict) -> List[Tuple[str, str, str]]:
    """[(torch_prefix, flax_prefix, kind)] for a UNetModel config.

    kind in {'conv','linear','norm','embed','qkv'} controls the transform.
    Reproduces the sequential input/output_blocks indexing of the reference
    ctor (`openaimodel.py:516-692`).
    """
    ch_mult = list(cfg.get("channel_mult", (1, 2, 4, 8)))
    nrb = cfg["num_res_blocks"]
    attn_res = set(cfg["attention_resolutions"])
    spatial = cfg.get("use_spatial_transformer", False)
    resblock_updown = cfg.get("resblock_updown", False)

    rules: List[Tuple[str, str, str]] = []

    def res_rules(tp: str, fp: str):
        rules.extend([
            (f"{tp}.in_layers.0", f"{fp}/in_norm", "norm"),
            (f"{tp}.in_layers.2", f"{fp}/in_conv", "conv"),
            (f"{tp}.emb_layers.1", f"{fp}/emb_proj", "linear"),
            (f"{tp}.out_layers.0", f"{fp}/out_norm", "norm"),
            (f"{tp}.out_layers.3", f"{fp}/out_conv", "conv"),
            (f"{tp}.skip_connection", f"{fp}/skip", "conv"),
        ])

    def attn_rules(tp: str, fp: str):
        if spatial:
            rules.extend([
                (f"{tp}.norm", f"{fp}/norm", "norm"),
                (f"{tp}.proj_in", f"{fp}/proj_in", "conv"),
                (f"{tp}.proj_out", f"{fp}/proj_out", "conv"),
            ])
            depth = cfg.get("transformer_depth", 1)
            for d in range(depth):
                tb = f"{tp}.transformer_blocks.{d}"
                fb = f"{fp}/block_{d}"
                rules.extend([
                    (f"{tb}.attn1.to_q", f"{fb}/attn1/to_q", "linear"),
                    (f"{tb}.attn1.to_k", f"{fb}/attn1/to_k", "linear"),
                    (f"{tb}.attn1.to_v", f"{fb}/attn1/to_v", "linear"),
                    (f"{tb}.attn1.to_out.0", f"{fb}/attn1/to_out", "linear"),
                    (f"{tb}.attn2.to_q", f"{fb}/attn2/to_q", "linear"),
                    (f"{tb}.attn2.to_k", f"{fb}/attn2/to_k", "linear"),
                    (f"{tb}.attn2.to_v", f"{fb}/attn2/to_v", "linear"),
                    (f"{tb}.attn2.to_out.0", f"{fb}/attn2/to_out", "linear"),
                    (f"{tb}.ff.net.0.proj", f"{fb}/ff/geglu/proj", "linear"),
                    (f"{tb}.ff.net.2", f"{fb}/ff/out_proj", "linear"),
                    (f"{tb}.norm1", f"{fb}/norm1", "norm"),
                    (f"{tb}.norm2", f"{fb}/norm2", "norm"),
                    (f"{tb}.norm3", f"{fb}/norm3", "norm"),
                ])
        else:
            rules.extend([
                (f"{tp}.norm", f"{fp}/norm", "norm"),
                (f"{tp}.qkv", f"{fp}/qkv", "qkv"),
                (f"{tp}.proj_out", f"{fp}/proj_out", "qkv"),
            ])

    rules.append(("time_embed.0", "time_embed_0", "linear"))
    rules.append(("time_embed.2", "time_embed_2", "linear"))
    if cfg.get("num_classes") is not None:
        rules.append(("label_emb", "label_emb", "embed"))
    rules.append(("input_blocks.0.0", "conv_in", "conv"))

    idx = 1
    ds = 1
    for level in range(len(ch_mult)):
        for i in range(nrb):
            res_rules(f"input_blocks.{idx}.0", f"down_{level}_{i}_res")
            if ds in attn_res:
                attn_rules(f"input_blocks.{idx}.1", f"down_{level}_{i}_attn")
            idx += 1
        if level != len(ch_mult) - 1:
            if resblock_updown:
                res_rules(f"input_blocks.{idx}.0", f"down_{level}_downres")
            else:
                rules.append(
                    (f"input_blocks.{idx}.0.op", f"down_{level}_down/op", "conv")
                )
            idx += 1
            ds *= 2

    res_rules("middle_block.0", "mid_res1")
    attn_rules("middle_block.1", "mid_attn")
    res_rules("middle_block.2", "mid_res2")

    idx = 0
    for level in reversed(range(len(ch_mult))):
        for i in range(nrb + 1):
            res_rules(f"output_blocks.{idx}.0", f"up_{level}_{i}_res")
            li = 1
            if ds in attn_res:
                attn_rules(f"output_blocks.{idx}.{li}", f"up_{level}_{i}_attn")
                li += 1
            if level and i == nrb:
                if resblock_updown:
                    res_rules(f"output_blocks.{idx}.{li}", f"up_{level}_upres")
                else:
                    rules.append(
                        (f"output_blocks.{idx}.{li}.conv", f"up_{level}_up/conv", "conv")
                    )
                ds //= 2
            idx += 1

    rules.append(("out.0", "out_norm", "norm"))
    rules.append(("out.2", "out_conv", "conv"))
    return rules


def encoder_unet_key_map(cfg: Dict) -> List[Tuple[str, str, str]]:
    """[(torch_prefix, flax_prefix, kind)] for an EncoderUNetModel config
    (reference ctor `openaimodel.py:745-922`): UNet down path + middle block
    + one of the four pooling heads (adaptive / attention / spatial /
    spatial_v2)."""
    ch_mult = list(cfg.get("channel_mult", (1, 2, 4, 8)))
    nrb = cfg["num_res_blocks"]
    attn_res = set(cfg["attention_resolutions"])
    resblock_updown = cfg.get("resblock_updown", False)
    pool = cfg.get("pool", "adaptive")

    rules: List[Tuple[str, str, str]] = [
        ("time_embed.0", "time_embed_0", "linear"),
        ("time_embed.2", "time_embed_2", "linear"),
        ("input_blocks.0.0", "conv_in", "conv"),
    ]

    def res_rules(tp: str, fp: str):
        rules.extend([
            (f"{tp}.in_layers.0", f"{fp}/in_norm", "norm"),
            (f"{tp}.in_layers.2", f"{fp}/in_conv", "conv"),
            (f"{tp}.emb_layers.1", f"{fp}/emb_proj", "linear"),
            (f"{tp}.out_layers.0", f"{fp}/out_norm", "norm"),
            (f"{tp}.out_layers.3", f"{fp}/out_conv", "conv"),
            (f"{tp}.skip_connection", f"{fp}/skip", "conv"),
        ])

    def attn_rules(tp: str, fp: str):
        rules.extend([
            (f"{tp}.norm", f"{fp}/norm", "norm"),
            (f"{tp}.qkv", f"{fp}/qkv", "qkv"),
            (f"{tp}.proj_out", f"{fp}/proj_out", "qkv"),
        ])

    idx = 1
    ds = 1
    for level in range(len(ch_mult)):
        for i in range(nrb):
            res_rules(f"input_blocks.{idx}.0", f"down_{level}_{i}_res")
            if ds in attn_res:
                attn_rules(f"input_blocks.{idx}.1", f"down_{level}_{i}_attn")
            idx += 1
        if level != len(ch_mult) - 1:
            if resblock_updown:
                res_rules(f"input_blocks.{idx}.0", f"down_{level}_downres")
            else:
                rules.append(
                    (f"input_blocks.{idx}.0.op", f"down_{level}_down/op", "conv")
                )
            idx += 1
            ds *= 2

    res_rules("middle_block.0", "mid_res1")
    attn_rules("middle_block.1", "mid_attn")
    res_rules("middle_block.2", "mid_res2")

    if pool == "adaptive":
        rules += [
            ("out.0", "out_norm", "norm"),
            ("out.3", "out", "conv1x1_dense"),
        ]
    elif pool == "attention":
        rules += [
            ("out.0", "out_norm", "norm"),
            ("out.2.positional_embedding", "out_pool/positional_embedding",
             "param_t"),
            ("out.2.qkv_proj", "out_pool/qkv_proj", "qkv"),
            ("out.2.c_proj", "out_pool/c_proj", "qkv"),
        ]
    elif pool == "spatial":
        rules += [
            ("out.0", "out_0", "linear"),
            ("out.2", "out_1", "linear"),
        ]
    elif pool == "spatial_v2":
        rules += [
            ("out.0", "out_0", "linear"),
            ("out.1", "out_norm", "norm"),
            ("out.3", "out_1", "linear"),
        ]
    else:
        raise NotImplementedError(pool)
    return rules


# -------------------------------------------------------------- VAE key map
def vae_key_map(ddconfig: Dict, which: str = "both") -> List[Tuple[str, str, str]]:
    ch_mult = list(ddconfig["ch_mult"])
    nrb = ddconfig["num_res_blocks"]
    attn_res = set(ddconfig.get("attn_resolutions", ()))
    resolution = ddconfig["resolution"]
    rules: List[Tuple[str, str, str]] = []

    def block_rules(tp, fp):
        rules.extend([
            (f"{tp}.norm1", f"{fp}/norm1", "norm"),
            (f"{tp}.conv1", f"{fp}/conv1", "conv"),
            (f"{tp}.norm2", f"{fp}/norm2", "norm"),
            (f"{tp}.conv2", f"{fp}/conv2", "conv"),
            (f"{tp}.nin_shortcut", f"{fp}/nin_shortcut", "conv"),
        ])

    def attn_rules(tp, fp):
        rules.extend([
            (f"{tp}.norm", f"{fp}/norm", "norm"),
            (f"{tp}.q", f"{fp}/q", "conv"),
            (f"{tp}.k", f"{fp}/k", "conv"),
            (f"{tp}.v", f"{fp}/v", "conv"),
            (f"{tp}.proj_out", f"{fp}/proj_out", "conv"),
        ])

    if which in ("both", "encoder"):
        e = "encoder"
        rules.append((f"{e}.conv_in", f"{e}/conv_in", "conv"))
        curr = resolution
        for l in range(len(ch_mult)):
            for m in range(nrb):
                block_rules(f"{e}.down.{l}.block.{m}", f"{e}/down_{l}_block_{m}")
                if curr in attn_res:
                    attn_rules(f"{e}.down.{l}.attn.{m}", f"{e}/down_{l}_attn_{m}")
            if l != len(ch_mult) - 1:
                rules.append(
                    (f"{e}.down.{l}.downsample.conv", f"{e}/down_{l}_downsample/conv", "conv")
                )
                curr //= 2
        block_rules(f"{e}.mid.block_1", f"{e}/mid_block_1")
        attn_rules(f"{e}.mid.attn_1", f"{e}/mid_attn_1")
        block_rules(f"{e}.mid.block_2", f"{e}/mid_block_2")
        rules.append((f"{e}.norm_out", f"{e}/norm_out", "norm"))
        rules.append((f"{e}.conv_out", f"{e}/conv_out", "conv"))

    if which in ("both", "decoder"):
        d = "decoder"
        curr = resolution // 2 ** (len(ch_mult) - 1)
        rules.append((f"{d}.conv_in", f"{d}/conv_in", "conv"))
        block_rules(f"{d}.mid.block_1", f"{d}/mid_block_1")
        attn_rules(f"{d}.mid.attn_1", f"{d}/mid_attn_1")
        block_rules(f"{d}.mid.block_2", f"{d}/mid_block_2")
        for l in reversed(range(len(ch_mult))):
            for m in range(nrb + 1):
                block_rules(f"{d}.up.{l}.block.{m}", f"{d}/up_{l}_block_{m}")
                if curr in attn_res:
                    attn_rules(f"{d}.up.{l}.attn.{m}", f"{d}/up_{l}_attn_{m}")
            if l != 0:
                rules.append(
                    (f"{d}.up.{l}.upsample.conv", f"{d}/up_{l}_upsample/conv", "conv")
                )
                curr *= 2
        rules.append((f"{d}.norm_out", f"{d}/norm_out", "norm"))
        rules.append((f"{d}.conv_out", f"{d}/conv_out", "conv"))

    rules.append(("quant_conv", "quant_conv", "conv"))
    rules.append(("post_quant_conv", "post_quant_conv", "conv"))
    rules.append(("quantize.embedding", "quantize", "vq_embed"))
    return rules


# -------------------------------------------------- text transformer key map
def text_transformer_key_map(
    depth: int,
    torch_root: str = "",
    flax_root: str = "",
    *,
    use_scalenorm: bool = False,
    use_rmsnorm: bool = False,
    use_rezero: bool = False,
    gate_residual: bool = False,
    ff_glu: bool = False,
    macaron: bool = False,
    sandwich_coef: "Optional[int]" = None,
    position_infused_attn: bool = False,
) -> List[Tuple[str, str, str]]:
    """Key map for the BERTEmbedder text trunk: reference TransformerWrapper
    + Encoder attn_layers (`x_transformer.py:370-641`, layers ModuleList of
    [norm, block, residual] triples) onto
    models.text_transformer.TextTransformer, covering the Encoder option
    surface (scalenorm/rmsnorm/rezero/GRU gating/GEGLU/macaron/sandwich/
    position-infused)."""
    from ..models.text_transformer import TextTransformer

    t = torch_root
    f = flax_root
    rules: List[Tuple[str, str, str]] = [
        (f"{t}token_emb", f"{f}token_emb", "embed"),
        (f"{t}norm", f"{f}norm", "norm"),
    ]
    if not position_infused_attn:
        rules.append((f"{t}pos_emb.emb", f"{f}pos_emb", "embed"))

    scalar_norm = use_scalenorm or use_rmsnorm
    layer_types = TextTransformer.layer_types_for(depth, macaron, sandwich_coef)
    a_idx = f_idx = 0
    for j, lt in enumerate(layer_types):
        base = f"{t}attn_layers.layers.{j}"
        if lt == "a":
            fl = f"{f}layer_{a_idx}_attn"
            a_idx += 1
            # Rezero wraps the attention block: params live under .1.fn
            blk = f"{base}.1.fn" if use_rezero else f"{base}.1"
            if not use_rezero:
                rules.append(
                    (f"{base}.0.g", f"{fl}_norm/g", "param")
                    if scalar_norm
                    else (f"{base}.0", f"{fl}_norm", "norm")
                )
            else:
                rules.append((f"{base}.1.g", f"{fl}_rezero/g", "param"))
            rules += [
                (f"{blk}.to_q", f"{fl}/to_q", "linear"),
                (f"{blk}.to_k", f"{fl}/to_k", "linear"),
                (f"{blk}.to_v", f"{fl}/to_v", "linear"),
                (f"{blk}.to_out", f"{fl}/to_out", "linear"),
            ]
        else:
            fl = f"{f}layer_{f_idx}_ff"
            f_idx += 1
            # macaron wraps every ff in Scale(0.5, fn): params under .1.fn
            blk = f"{base}.1.fn" if macaron else f"{base}.1"
            if not use_rezero:
                rules.append(
                    (f"{base}.0.g", f"{fl}_norm/g", "param")
                    if scalar_norm
                    else (f"{base}.0", f"{fl}_norm", "norm")
                )
            ff_in = f"{blk}.net.0.proj" if ff_glu else f"{blk}.net.0.0"
            rules += [
                (ff_in, f"{fl}/ff_in", "linear"),
                (f"{blk}.net.2", f"{fl}/ff_out", "linear"),
            ]
        if gate_residual:
            rules.append((f"{base}.2.gru", f"{fl}_gate", "gru"))
    return rules


# ----------------------------------------------------------------- importer
def import_state_dict(
    state_dict: Dict[str, np.ndarray],
    rules: Sequence[Tuple[str, str, str]],
    params: Dict,
    torch_root: str = "",
    strict: bool = False,
) -> Tuple[Dict, List[str], List[str]]:
    """Apply mapping rules onto a flax param tree. Returns
    (new_params, missing_torch_keys, loaded_flax_prefixes)."""
    flat = _flatten(params)
    loaded, missing = [], []
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    for tp, fp, kind in rules:
        tkey = f"{torch_root}{tp}"
        fpath = tuple(fp.split("/"))
        if kind == "vq_embed":
            w = sd.get(f"{tkey}.weight")
            if w is None:
                missing.append(tkey)
                continue
            flat[fpath + ("embedding",)] = w
            loaded.append(fp)
            continue
        if kind == "param":
            # raw tensor at the full torch key -> the exact flax leaf
            w = sd.get(tkey)
            if w is None:
                missing.append(tkey)
                continue
            flat[fpath] = w
            loaded.append(fp)
            continue
        if kind == "param_t":
            # raw 2D tensor, transposed (e.g. AttentionPool2d's [C, N+1]
            # positional embedding -> flax [N+1, C])
            w = sd.get(tkey)
            if w is None:
                missing.append(tkey)
                continue
            flat[fpath] = np.transpose(w, (1, 0))
            loaded.append(fp)
            continue
        if kind == "gru":
            # torch GRUCell: weight_ih/weight_hh [3*dim, dim] stacked (r,z,n)
            # -> two flax Dense layers gru_ih / gru_hh
            ok = True
            for suffix, dense in (("ih", "gru_ih"), ("hh", "gru_hh")):
                w = sd.get(f"{tkey}.weight_{suffix}")
                b = sd.get(f"{tkey}.bias_{suffix}")
                if w is None:
                    missing.append(f"{tkey}.weight_{suffix}")
                    ok = False
                    continue
                flat[fpath + (dense, "kernel")] = linear_to_flax(w)
                if b is not None:
                    flat[fpath + (dense, "bias")] = b
            if ok:
                loaded.append(fp)
            continue
        w = sd.get(f"{tkey}.weight")
        b = sd.get(f"{tkey}.bias")
        if w is None and b is None:
            missing.append(tkey)
            continue
        if kind == "conv":
            if w is not None and fpath + ("kernel",) in flat:
                flat[fpath + ("kernel",)] = conv_to_flax(w)
            if b is not None and fpath + ("bias",) in flat:
                flat[fpath + ("bias",)] = b
        elif kind == "linear":
            if w is not None:
                flat[fpath + ("kernel",)] = linear_to_flax(w)
            if b is not None:
                flat[fpath + ("bias",)] = b
        elif kind == "qkv":
            # torch Conv1d (out, in, 1) -> Dense (in, out)
            if w is not None:
                flat[fpath + ("kernel",)] = linear_to_flax(w[..., 0])
            if b is not None:
                flat[fpath + ("bias",)] = b
        elif kind == "conv1x1_dense":
            # torch Conv2d (out, in, 1, 1) -> Dense (in, out)
            if w is not None:
                flat[fpath + ("kernel",)] = linear_to_flax(w[..., 0, 0])
            if b is not None:
                flat[fpath + ("bias",)] = b
        elif kind == "norm":
            if w is not None:
                flat[fpath + ("scale",)] = w
            if b is not None:
                flat[fpath + ("bias",)] = b
        elif kind == "embed":
            flat[fpath + ("embedding",)] = w
        loaded.append(fp)

    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]} (+{len(missing)-10})")
    return _unflatten(flat), missing, loaded


def export_state_dict(
    params: Dict, rules: Sequence[Tuple[str, str, str]], torch_root: str = ""
) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> torch-layout state_dict."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for tp, fp, kind in rules:
        fpath = tuple(fp.split("/"))
        tkey = f"{torch_root}{tp}"
        if kind == "vq_embed":
            if fpath + ("embedding",) in flat:
                out[f"{tkey}.weight"] = np.asarray(flat[fpath + ("embedding",)])
            continue
        if kind == "param":
            if fpath in flat:
                out[tkey] = np.asarray(flat[fpath])
            continue
        if kind == "gru":
            for suffix, dense in (("ih", "gru_ih"), ("hh", "gru_hh")):
                kk = flat.get(fpath + (dense, "kernel"))
                bb = flat.get(fpath + (dense, "bias"))
                if kk is not None:
                    # flax [in, 3d] -> torch [3d, in]
                    out[f"{tkey}.weight_{suffix}"] = np.transpose(
                        np.asarray(kk), (1, 0)
                    )
                if bb is not None:
                    out[f"{tkey}.bias_{suffix}"] = np.asarray(bb)
            continue
        k = flat.get(fpath + ("kernel",))
        s = flat.get(fpath + ("scale",))
        b = flat.get(fpath + ("bias",))
        e = flat.get(fpath + ("embedding",))
        if kind == "conv" and k is not None:
            out[f"{tkey}.weight"] = conv_to_torch(np.asarray(k))
        elif kind == "linear" and k is not None:
            out[f"{tkey}.weight"] = np.asarray(k).T
        elif kind == "qkv" and k is not None:
            out[f"{tkey}.weight"] = np.asarray(k).T[..., None]
        elif kind == "norm" and s is not None:
            out[f"{tkey}.weight"] = np.asarray(s)
        elif kind == "embed" and e is not None:
            out[f"{tkey}.weight"] = np.asarray(e)
        if b is not None:
            out[f"{tkey}.bias"] = np.asarray(b)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .ckpt/.pt file into numpy (CPU torch available)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
