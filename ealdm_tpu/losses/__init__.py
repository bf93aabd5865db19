"""Losses: LPIPS, PatchGAN discriminator, VAE GAN objectives."""

from .contperceptual import LPIPSWithDiscriminator, adaptive_d_weight
from .discriminator import NLayerDiscriminator
from .gan import (adopt_weight, hinge_d_loss,
                  hinge_d_loss_with_exemplar_weights, measure_perplexity,
                  vanilla_d_loss)
from .lpips import LPIPS, VGG16Features, load_torch_lpips_weights
from .vqperceptual import VQLPIPSWithDiscriminator

__all__ = [
    "LPIPS",
    "VGG16Features",
    "load_torch_lpips_weights",
    "NLayerDiscriminator",
    "LPIPSWithDiscriminator",
    "VQLPIPSWithDiscriminator",
    "adaptive_d_weight",
    "adopt_weight",
    "hinge_d_loss",
    "hinge_d_loss_with_exemplar_weights",
    "vanilla_d_loss",
    "measure_perplexity",
]
