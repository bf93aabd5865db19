"""Model definitions: UNet denoiser, first-stage autoencoders, diffusion
cores, STDiff conditioning tower, conditioning encoders."""

from .classifier import NoisyLatentImageClassifier
from .ddpm import (
    DDPM,
    DiffusionWrapper,
    LatentDiffusion,
    Layout2ImgDiffusion,
    build_first_stage,
    build_unet,
)
from .resnet import ResNet50
from .unet import AttentionPool2d, EncoderUNetModel
from .distributions import DiagonalGaussian, normal_kl
from .quantize import VectorQuantizer
from .stdiff import AdaIN, CondScale, ConditioningTransform, EnvLSTM, EqualizedDense, UnetCond
from .unet import UNetModel
from .vae import (
    AutoencoderKL,
    Decoder,
    Encoder,
    IdentityFirstStage,
    VQModel,
)
from .encoders import BERTEmbedder, ClassEmbedder, SpatialRescaler, TransformerEmbedder

__all__ = [
    "DDPM",
    "DiffusionWrapper",
    "LatentDiffusion",
    "Layout2ImgDiffusion",
    "NoisyLatentImageClassifier",
    "ResNet50",
    "AttentionPool2d",
    "EncoderUNetModel",
    "build_first_stage",
    "build_unet",
    "DiagonalGaussian",
    "normal_kl",
    "VectorQuantizer",
    "AdaIN",
    "CondScale",
    "ConditioningTransform",
    "EnvLSTM",
    "EqualizedDense",
    "UnetCond",
    "UNetModel",
    "AutoencoderKL",
    "Decoder",
    "Encoder",
    "IdentityFirstStage",
    "VQModel",
    "BERTEmbedder",
    "ClassEmbedder",
    "SpatialRescaler",
    "TransformerEmbedder",
]
