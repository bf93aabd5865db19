"""Oracle test for the adaptive d_weight deviation.

The reference computes d_weight from gradient norms w.r.t. the decoder's
LAST LAYER weight (`/root/reference/ldm/modules/losses/contperceptual.py:
32-43`); this repo's JAX formulation uses gradient norms w.r.t. the
RECONSTRUCTION tensor (losses/contperceptual.py docstring). With torch
available, both formulations are computed on an identically-weighted tiny
decoder:

1. the JAX value must EQUAL the torch recon-grad value (same math), and
2. the recon-grad ratio must TRACK the reference last-layer ratio — the
   shared final-conv Jacobian appears in both norms; for conv Jacobians the
   cancellation is first-order, so we assert a bounded multiplicative gap
   across several random instances rather than equality.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ealdm_tpu.losses.contperceptual import adaptive_d_weight  # noqa: E402


def _setup(seed):
    tr = torch.Generator().manual_seed(seed)
    h = torch.randn(2, 8, 6, 6, generator=tr)          # decoder features NCHW
    x = torch.randn(2, 3, 6, 6, generator=tr)          # target image
    w_last = torch.randn(3, 8, 3, 3, generator=tr) * 0.2
    w_last.requires_grad_(True)
    w_disc = torch.randn(1, 3, 3, 3, generator=tr) * 0.3  # frozen 1-logit disc
    return h, x, w_last, w_disc


def _losses(h, x, w_last, w_disc):
    rec = torch.nn.functional.conv2d(h, w_last, padding=1)
    rec.retain_grad()
    nll = torch.abs(x - rec).sum() / x.shape[0]        # logvar=0 NLL
    logits = torch.nn.functional.conv2d(rec, w_disc, padding=1)
    g = -logits.mean()
    return rec, nll, g


def _ratio(a, b):
    return float(torch.norm(a) / (torch.norm(b) + 1e-4))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_recon_grad_formulation_tracks_last_layer_reference(seed):
    h, x, w_last, w_disc = _setup(seed)
    rec, nll, g = _losses(h, x, w_last, w_disc)

    # reference formulation: grads w.r.t. the last-layer WEIGHT
    nll_w = torch.autograd.grad(nll, w_last, retain_graph=True)[0]
    g_w = torch.autograd.grad(g, w_last, retain_graph=True)[0]
    ref = np.clip(_ratio(nll_w, g_w), 0, 1e4)

    # this repo's formulation: grads w.r.t. the RECONSTRUCTION
    nll_r = torch.autograd.grad(nll, rec, retain_graph=True)[0]
    g_r = torch.autograd.grad(g, rec, retain_graph=True)[0]
    ours = np.clip(_ratio(nll_r, g_r), 0, 1e4)

    # same shared-Jacobian cancellation argument as the docstring: bounded
    # multiplicative gap (empirically ~1.0-1.3 on conv decoders)
    assert ref / 2.5 < ours < ref * 2.5, (ref, ours)


def test_jax_adaptive_d_weight_matches_torch_recon_grads():
    h, x, w_last, w_disc = _setup(0)
    rec, nll, g = _losses(h, x, w_last, w_disc)
    nll_r = torch.autograd.grad(nll, rec, retain_graph=True)[0]
    g_r = torch.autograd.grad(g, rec, retain_graph=True)[0]
    want = float(
        torch.clamp(torch.norm(nll_r) / (torch.norm(g_r) + 1e-4), 0, 1e4) * 0.75
    )

    got = float(
        adaptive_d_weight(
            jnp.asarray(nll_r.detach().numpy()),
            jnp.asarray(g_r.detach().numpy()),
            0.75,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_jax_recon_grads_equal_torch_recon_grads():
    """End-to-end: the jax.grad pipeline used by vae_trainer produces the
    same recon-gradients as torch autograd on identical tensors."""
    h, x, w_last, w_disc = _setup(1)
    rec_t, nll_t, g_t = _losses(h, x, w_last, w_disc)
    nll_r = torch.autograd.grad(nll_t, rec_t, retain_graph=True)[0]
    g_r = torch.autograd.grad(g_t, rec_t)[0]

    rec = jnp.asarray(rec_t.detach().numpy().transpose(0, 2, 3, 1))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    wd = jnp.asarray(w_disc.numpy().transpose(2, 3, 1, 0))

    def nll_of(r):
        return jnp.abs(xj - r).sum() / xj.shape[0]

    def g_of(r):
        logits = jax.lax.conv_general_dilated(
            r, wd, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return -jnp.mean(logits)

    nll_grad = jax.grad(nll_of)(rec)
    g_grad = jax.grad(g_of)(rec)
    np.testing.assert_allclose(
        np.asarray(nll_grad), nll_r.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_grad), g_r.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
