"""ealdm-tpu: TPU-native Environment-Aware Latent Diffusion framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capability surface of
`NasrinKalanat/Environment-Aware_Latent_Diffusion_Model` (a CompVis
latent-diffusion fork). See SURVEY.md at the repo root for the structural
analysis of the reference and the mapping of every component.

Layout:
  ops/       pure math + fused kernels (schedules, bias_act, upfirdn2d, attention)
  models/    flax.linen model definitions (UNet, VAE, VQ, STDiff cond tower, DDPM)
  samplers/  DDIM / PLMS / ancestral samplers compiled as single lax.scan programs
  losses/    LPIPS, PatchGAN discriminator, VAE GAN losses
  parallel/  mesh + sharding helpers (pjit data/model parallelism over ICI)
  training/  train loops, EMA, LR schedules, checkpointing, callbacks
  data/      host-side ETL -> fixed-shape device batches
  config     YAML config system with a registry mapping the reference's
             `target:` dotted paths to the TPU-native classes
"""

__version__ = "0.1.0"


def enable_inference_optimizations():
    """Turn on the inference-only fast paths (not differentiable / reduced
    stats precision): fused Pallas flash attention + native-dtype norm
    statistics. Call before tracing sampling programs; training keeps the
    fp32/dense defaults. Measured: +~33% end-to-end on 256^2 DDIM-50 (v5e).
    """
    from .ops.attention import set_attention_impl
    from .ops.norms import set_norm_stats_precision

    set_attention_impl("flash")
    set_norm_stats_precision("native")
