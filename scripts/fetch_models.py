#!/usr/bin/env python
"""Materialize the model zoo under models/ — the zero-egress counterpart of
the reference's `scripts/download_first_stages.sh` / `download_models.sh`
(which wget+unzip config.yaml/model.ckpt pairs from ommer-lab.com into
`models/first_stage_models/*` and `models/ldm/*`).

This environment has no network egress, so for every zoo entry this script

1. writes `models/<name>/config.yaml` in the reference's config schema
   (generated from `ealdm_tpu.zoo`, the architecture registry), and
2. if a checkpoint for the entry exists in the local cache directory
   (`$EALDM_CACHE_DIR` or ~/.cache/ealdm — e.g. `vq-f8.ckpt` or
   `ldm_cin256.ckpt`, torch OR orbax format), links/copies it to
   `models/<name>/model.ckpt` for the CLIs to load.

Usage:
    python scripts/fetch_models.py                 # all entries
    python scripts/fetch_models.py ldm/cin256 ...  # specific entries
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ealdm_tpu import zoo  # noqa: E402


def reference_config(name: str) -> dict:
    """Reference-schema `{model: {target, params}}` dict for a zoo entry."""
    kind, _, short = name.partition("/")
    if kind == "first_stage_models":
        # standalone stubs carry the TRAINABLE autoencoder form
        return {"model": {"base_learning_rate": 4.5e-6,
                          **zoo._fs_train_config(short)}}
    z = zoo.spec(name)
    fs = zoo._fs_config(z["first_stage"])
    # LDM stubs carry the frozen first stage with a no-op loss (the reference
    # VQModel ctor requires `lossconfig`; stubs use torch.nn.Identity or
    # contperceptual.DummyLoss)
    fs = {"target": fs["target"],
          "params": dict(fs["params"], lossconfig={
              "target": z.get("fs_loss", "torch.nn.Identity")})}
    params = {
        "linear_start": z["ls"],
        "linear_end": z["le"],
        "num_timesteps_cond": z.get("ntc"),
        "log_every_t": z.get("let", 100),
        "timesteps": 1000,
        "loss_type": z.get("loss_type"),
        "first_stage_key": "image",
        "image_size": z["unet"]["image_size"],
        # `channels` is the LATENT channel count (= first-stage embed_dim);
        # concat models' UNet in_channels additionally include the
        # concatenated conditioning planes.
        "channels": fs["params"]["embed_dim"],
        "monitor": z.get("monitor"),
        "unet_config": {
            "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": z["unet"],
        },
        "first_stage_config": fs,
        "cond_stage_config": z.get("cond", "__is_unconditional__"),
    }
    if "trainable" in z:
        params["cond_stage_trainable"] = z["trainable"]
    if z.get("scale_by_std"):
        params["scale_by_std"] = True
    if "sched" in z:
        params["scheduler_config"] = z["sched"]
    for k in ("num_timesteps_cond", "loss_type", "monitor"):
        if params[k] is None:
            del params[k]
    for k in ("conditioning_key", "cond_stage_key"):
        if k in z:
            params[k] = z[k]
    # some reference stubs carry a vestigial cond_stage_key alongside an
    # unconditional/first-stage cond config (e.g. lsun_churches256: "image")
    if "stub_key" in z:
        params["cond_stage_key"] = z["stub_key"]
    return {"model": {"base_learning_rate": z.get("base_lr", 1e-6),
                      "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
                      "params": params}}


def cache_candidates(name: str, cache_dir: str):
    kind, _, short = name.partition("/")
    stems = [short, name.replace("/", "_"), f"ldm_{short}" if kind == "ldm" else short]
    for stem in dict.fromkeys(stems):
        for ext in (".ckpt", ".pt", ".pth", ".orbax"):
            yield os.path.join(cache_dir, stem + ext)


def fetch(name: str, models_root: str, cache_dir: str) -> str:
    out_dir = os.path.join(models_root, name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(reference_config(name), f, sort_keys=False)
    for cand in cache_candidates(name, cache_dir):
        if os.path.exists(cand):
            dst = os.path.join(out_dir, "model.ckpt")
            if not os.path.exists(dst):
                try:
                    os.link(cand, dst)
                except OSError:
                    shutil.copy2(cand, dst)
            return f"{name}: config.yaml + model.ckpt (from {cand})"
    return f"{name}: config.yaml (no checkpoint in cache; architecture buildable via ealdm_tpu.zoo.build)"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="zoo entries (default: all)")
    ap.add_argument("--models-root", default="models")
    ap.add_argument("--cache-dir",
                    default=os.environ.get(
                        "EALDM_CACHE_DIR",
                        os.path.expanduser("~/.cache/ealdm")))
    ap.add_argument("--group", choices=["first_stages", "ldm", "all"],
                    default="all")
    args = ap.parse_args(argv)
    names = args.names or [
        n for n in zoo.names()
        if args.group == "all"
        or (args.group == "first_stages") == n.startswith("first_stage_models/")
    ]
    for n in names:
        print(fetch(n, args.models_root, args.cache_dir))


if __name__ == "__main__":
    main()
