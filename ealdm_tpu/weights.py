"""On-disk pretrained weights for the eval trunks (EALDM_WEIGHTS_DIR).

The reference downloads its evaluation networks at runtime — the FID
InceptionV3 and CLIP scorer inside the third stage
(`/root/reference/STDiff/third_stage_model.py:26-27,281`) and the taming
VGG-LPIPS checkpoint (`/root/reference/ldm/modules/losses/contperceptual.py:4`).
This framework runs in environments without egress, so the same weights
arrive as local *files* instead: point ``EALDM_WEIGHTS_DIR`` at a directory
holding any of the canonical checkpoints below and the trunks load them
automatically through the exact import maps that are oracle-tested in
``tests/test_eval_trunks.py``.

Canonical filenames searched per trunk (first hit wins):

* ``inception`` — ``pt_inception-2015-12-05.pth``, ``inception.pth``,
  ``inception.pt``, ``inception.npz`` (torchvision ``inception_v3`` naming,
  as used by torchmetrics' FrechetInceptionDistance).
* ``clip`` — ``ViT-B-32.pt``, ``clip_vit_b32.pt``, ``clip.pth``,
  ``clip.pt``, ``clip.npz`` (OpenAI ``clip`` or HF ``CLIPModel`` naming;
  TorchScript archives from ``clip.load`` are unwrapped).
* ``lpips`` — ``vgg_lpips.pth``, ``vgg.pth``, ``lpips.pth``, ``lpips.npz``
  (taming ``vgg_lpips`` or raw torchvision VGG16 naming).

``load_state_dict_file`` is the single file decoder: ``.npz`` archives load
dependency-free; anything else goes through ``torch.load`` (plain and
Lightning-wrapped state_dicts) with a ``torch.jit.load`` fallback for
TorchScript archives.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

ENV_VAR = "EALDM_WEIGHTS_DIR"

CANONICAL_FILES: Dict[str, tuple] = {
    "inception": ("pt_inception-2015-12-05.pth", "inception.pth",
                  "inception.pt", "inception.npz"),
    "clip": ("ViT-B-32.pt", "clip_vit_b32.pt", "clip.pth", "clip.pt",
             "clip.npz"),
    "lpips": ("vgg_lpips.pth", "vgg.pth", "lpips.pth", "lpips.npz"),
}


def weights_dir() -> Optional[str]:
    """The configured weights directory, or None when unset.

    A *set but nonexistent* directory is almost certainly a typo'd
    deployment — warn loudly instead of silently degrading every eval
    trunk to random init."""
    d = os.environ.get(ENV_VAR)
    if not d:
        return None
    if not os.path.isdir(d):
        import warnings

        warnings.warn(
            f"{ENV_VAR}={d!r} is not a directory; eval-trunk weights will "
            f"NOT be loaded (FID/CLIP/LPIPS run random-init)",
            stacklevel=2,
        )
        return None
    return d


def find_weights(kind: str, directory: Optional[str] = None) -> Optional[str]:
    """Path of the first canonical ``kind`` checkpoint in ``directory``
    (default: $EALDM_WEIGHTS_DIR), or None."""
    d = directory or weights_dir()
    if d is None:
        return None
    for name in CANONICAL_FILES[kind]:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def load_state_dict_file(path: str) -> Dict:
    """Decode a checkpoint file into a flat ``{name: tensor}`` state_dict.

    Handles ``.npz`` archives, plain/torch-pickled state_dicts, Lightning
    ``{"state_dict": ...}`` wrappers, and TorchScript archives (the format
    OpenAI's ``clip.load`` downloads)."""
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    import torch

    # Only safe decoders: weights_only=True pickles and TorchScript archives
    # (the format OpenAI's clip.load downloads).  We deliberately never fall
    # back to torch.load(weights_only=False) — that executes arbitrary pickle
    # code from whatever file sits in $EALDM_WEIGHTS_DIR.  A checkpoint that
    # genuinely needs full unpickling must be re-saved as a plain state_dict.
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as pickle_err:
        try:
            obj = torch.jit.load(path, map_location="cpu")
        except Exception as jit_err:
            raise ValueError(
                f"{path}: not decodable as a weights-only pickle "
                f"({pickle_err}) nor as a TorchScript archive ({jit_err}). "
                "If this is a full-object torch checkpoint, re-save it as a "
                "plain state_dict; weights_only=False loading is not "
                "supported (arbitrary code execution risk)."
            ) from jit_err
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and not any(
        hasattr(v, "shape") for v in obj.values() if not isinstance(v, dict)
    ):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: decoded to {type(obj)!r}, not a state_dict")
    return obj


def load_lpips_params(init_params, path: Optional[str] = None):
    """LPIPS params with the on-disk VGG/lin weights installed, or the
    given init unchanged when no checkpoint is available.

    ``init_params`` is the flax param tree of :class:`~ealdm_tpu.losses.LPIPS`
    (the ``{"params": ...}`` variables dict or its inner tree)."""
    p = path or find_weights("lpips")
    if p is None:
        return init_params
    from .losses.lpips import load_torch_lpips_weights

    sd = load_state_dict_file(p)
    if isinstance(init_params, dict) and "params" in init_params:
        return {**init_params,
                "params": load_torch_lpips_weights(init_params["params"], sd)}
    return load_torch_lpips_weights(init_params, sd)
