"""Samplers compiled as single lax.scan programs (DDIM / PLMS / ancestral)."""

from .ddim import DDIMConfig, ancestral_sample, ddim_sample, ddim_step
from .plms import plms_sample

__all__ = ["DDIMConfig", "ddim_sample", "ddim_step", "ancestral_sample", "plms_sample"]
