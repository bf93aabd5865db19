"""Config system: YAML merge + `target:` registry.

Parity target: the reference's OmegaConf + `instantiate_from_config` pipeline
(`/root/reference/ldm/util.py:78-93`, merge at `main.py:570-572`): left-to-
right deep-merged YAML files, `nested.key=value` dotlist overrides, and every
component expressed as `{target: dotted.path, params: {...}}`.

The registry maps the reference's dotted class paths (so its YAML configs
work verbatim) AND this package's own paths to the TPU-native classes.
"""
from __future__ import annotations

import copy
import importlib
from typing import Any, Dict, List, Sequence

import yaml


# --------------------------------------------------------------------- merge
def deep_merge(base: Dict, override: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str) -> Any:
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if isinstance(v, str):
        # YAML 1.1 misses bare scientific notation like '5e-4'
        try:
            return float(v)
        except ValueError:
            return v
    return v


def apply_dotlist(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """Apply `a.b.c=value` overrides (the reference CLI's trailing args)."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        assert "=" in item, f"override '{item}' is not key=value"
        key, value = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg


def load_config(paths: Sequence[str], overrides: Sequence[str] = ()) -> Dict:
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    return apply_dotlist(cfg, overrides)


# ------------------------------------------------------------------ registry
# reference dotted path (suffix)  ->  "module:attr" in this package
_REGISTRY = {
    # diffusion models
    "ldm.models.diffusion.ddpm.LatentDiffusion": "ealdm_tpu.models.ddpm:LatentDiffusion",
    "ldm.models.diffusion.ddpm.DDPM": "ealdm_tpu.models.ddpm:DDPM",
    "ldm.models.diffusion.ddpm.Layout2ImgDiffusion": "ealdm_tpu.models.ddpm:Layout2ImgDiffusion",
    # first stages
    "ldm.models.autoencoder.VQModelInterface": "ealdm_tpu.models.vae:VQModel",
    "ldm.models.autoencoder.VQModel": "ealdm_tpu.models.vae:VQModel",
    "ldm.models.autoencoder.AutoencoderKL": "ealdm_tpu.models.vae:AutoencoderKL",
    "ldm.models.autoencoder.IdentityFirstStage": "ealdm_tpu.models.vae:IdentityFirstStage",
    "STDiff.models.IdentityAutoEncoder": "ealdm_tpu.models.vae:IdentityFirstStage",
    # denoiser
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": "ealdm_tpu.models.unet:UNetModel",
    # conditioning
    "STDiff.models.UnetCond": "ealdm_tpu.models.stdiff:UnetCond",
    "ldm.modules.encoders.modules.ClassEmbedder": "ealdm_tpu.models.encoders:ClassEmbedder",
    "ldm.modules.encoders.modules.BERTEmbedder": "ealdm_tpu.models.encoders:BERTEmbedder",
    "ldm.modules.encoders.modules.TransformerEmbedder": "ealdm_tpu.models.encoders:TransformerEmbedder",
    "ldm.modules.encoders.modules.SpatialRescaler": "ealdm_tpu.models.encoders:SpatialRescaler",
    "ldm.modules.encoders.modules.FrozenCLIPTextEmbedder": "ealdm_tpu.models.encoders:FrozenCLIPTextEmbedder",
    "ldm.modules.encoders.modules.FrozenClipImageEmbedder": "ealdm_tpu.models.encoders:FrozenClipImageEmbedder",
    # schedulers
    "ldm.lr_scheduler.LambdaLinearScheduler": "ealdm_tpu.training.lr_scheduler:build_scheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler": "ealdm_tpu.training.lr_scheduler:build_scheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2": "ealdm_tpu.training.lr_scheduler:build_scheduler",
    # losses
    "ldm.modules.losses.LPIPSWithDiscriminator": "ealdm_tpu.losses.contperceptual:LPIPSWithDiscriminator",
    "ldm.modules.losses.contperceptual.LPIPSWithDiscriminator": "ealdm_tpu.losses.contperceptual:LPIPSWithDiscriminator",
    "taming.modules.losses.vqperceptual.VQLPIPSWithDiscriminator": "ealdm_tpu.losses.vqperceptual:VQLPIPSWithDiscriminator",
    "ldm.modules.losses.vqperceptual.VQLPIPSWithDiscriminator": "ealdm_tpu.losses.vqperceptual:VQLPIPSWithDiscriminator",
    "torch.nn.Identity": "ealdm_tpu.config:_identity",
    # data layer
    "main.DataModuleFromConfig": "ealdm_tpu.data.pipeline:DataModule",
    "STDiff.dataset_wlbl.ImageNetVidDataset": "ealdm_tpu.data.stdiff:StreamCameraDataset",
    "STDiff.dataset.ImageNetVidDataset": "ealdm_tpu.data.stdiff:StreamCameraDataset",
    "STDiff.third_stage_dataset.ThirdStageDataset": "ealdm_tpu.data.third_stage:ThirdStageDataset",
    "ldm.data.lsun.LSUNChurchesTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.lsun.LSUNChurchesValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.lsun.LSUNBedroomsTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.lsun.LSUNBedroomsValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.lsun.LSUNCatsTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.lsun.LSUNCatsValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.imagenet.ImageNetSRTrain": "ealdm_tpu.data.images:ImageSRDataset",
    "ldm.data.imagenet.ImageNetSRValidation": "ealdm_tpu.data.images:ImageSRDataset",
    "ldm.data.imagenet.ImageNetTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "ldm.data.imagenet.ImageNetValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    "taming.data.faceshq.CelebAHQTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "taming.data.faceshq.CelebAHQValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    "taming.data.faceshq.FFHQTrain": "ealdm_tpu.data.images:ImageFolderDataset",
    "taming.data.faceshq.FFHQValidation": "ealdm_tpu.data.images:ImageFolderDataset",
    # layout-to-image (reference OpenImages bbox ETL is download-based;
    # mapped to the in-repo synthetic layout dataset, data/layout.py)
    "ldm.data.openimages.OpenImagesBBoxTrain": "ealdm_tpu.data.layout:SyntheticLayoutDataset",
    "ldm.data.openimages.OpenImagesBBoxValidation": "ealdm_tpu.data.layout:SyntheticLayoutDataset",
}


def _identity(*args, **kwargs):
    return None


def resolve_target(target: str):
    """Resolve a reference or native dotted path to a class/callable."""
    if target in _REGISTRY:
        mod, attr = _REGISTRY[target].split(":")
        return getattr(importlib.import_module(mod), attr)
    # native path: ealdm_tpu.x.y:Z or ealdm_tpu.x.y.Z
    if ":" in target:
        mod, attr = target.split(":")
        return getattr(importlib.import_module(mod), attr)
    module, _, attr = target.rpartition(".")
    try:
        return getattr(importlib.import_module(module), attr)
    except (ImportError, AttributeError) as e:
        raise ValueError(f"cannot resolve target '{target}'") from e


def get_obj_from_str(string: str):
    """Reference-API alias for resolve_target."""
    return resolve_target(string)


def instantiate_from_config(config: Dict, **extra):
    """Build the object described by {target, params} (reference semantics).

    Model classes are flax modules — construction returns the module
    definition (pure); parameter init happens at the call site with rngs.
    """
    if config in ("__is_first_stage__", "__is_unconditional__"):
        return config
    if "target" not in config:
        raise KeyError("expected a 'target' key in config")
    cls = resolve_target(config["target"])
    params = dict(config.get("params", {}))
    params.update(extra)
    return cls(**params) if params or callable(cls) else cls()


# ------------------------------------------------------------------ model cfg
_LD_KEYS = {
    "timesteps", "beta_schedule", "linear_start", "linear_end", "cosine_s",
    "v_posterior", "parameterization", "loss_type", "conditioning_key",
    "first_stage_key", "cond_stage_key", "cond_stage_trainable", "scale_factor",
    "learn_logvar", "logvar_init", "l_simple_weight", "original_elbo_weight",
    "split_input_params",
}


def model_from_config(model_cfg: Dict, dtype=None):
    """Build the top-level diffusion model flax module from `config.model`.

    Returns (module, base_learning_rate). Non-architectural Lightning-era
    keys (monitor, ckpt_path, image_size bookkeeping, ...) are accepted and
    ignored, so reference YAMLs load unchanged.
    """
    import jax.numpy as jnp

    from .models.ddpm import DDPM, LatentDiffusion, Layout2ImgDiffusion

    params = dict(model_cfg.get("params", {}))
    base_lr = model_cfg.get("base_learning_rate", 1e-6)
    target = model_cfg.get("target", "ldm.models.diffusion.ddpm.LatentDiffusion")

    kwargs: Dict[str, Any] = {k: params[k] for k in _LD_KEYS if k in params}
    kwargs["unet_config"] = dict(params["unet_config"].get("params", {}))
    if "first_stage_config" in params:
        fsc = params["first_stage_config"]
        kwargs["first_stage_config"] = (
            fsc if isinstance(fsc, str) else dict(fsc)
        )
    if "cond_stage_config" in params:
        csc = params["cond_stage_config"]
        kwargs["cond_stage_config"] = csc if isinstance(csc, str) else dict(csc)
    if dtype is not None:
        kwargs["dtype"] = dtype

    if target.endswith("Layout2ImgDiffusion"):
        cls = Layout2ImgDiffusion
    elif target.endswith("LatentDiffusion"):
        cls = LatentDiffusion
    else:
        cls = DDPM
    return cls(**kwargs), base_lr
