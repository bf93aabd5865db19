"""Utilities: torch checkpoint interop, misc helpers."""

from .torch_import import (
    export_state_dict,
    import_state_dict,
    load_torch_checkpoint,
    encoder_unet_key_map,
    text_transformer_key_map,
    unet_key_map,
    vae_key_map,
)

__all__ = [
    "export_state_dict",
    "import_state_dict",
    "load_torch_checkpoint",
    "encoder_unet_key_map",
    "text_transformer_key_map",
    "unet_key_map",
    "vae_key_map",
]
