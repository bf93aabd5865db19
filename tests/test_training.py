"""Training layer: EMA semantics, LR schedules, pjit train step on 8-dev mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.training import (
    ema_init,
    ema_update,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    warmup_linear_cyclic,
    warmup_cosine,
)


def test_ema_warmup_decay():
    params = {"w": jnp.ones((3,))}
    st = ema_init(params, decay=0.9999)
    st = ema_update(st, {"w": jnp.zeros((3,))})
    # first update: decay = min(0.9999, 2/11)
    expected = 1.0 * (2.0 / 11.0)
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), expected, rtol=1e-5)
    assert int(st.num_updates) == 1


def test_ema_no_warmup():
    params = {"w": jnp.ones((2,))}
    st = ema_init(params, decay=0.5, use_num_updates=False)
    st = ema_update(st, {"w": jnp.zeros((2,))})
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 0.5)


def test_warmup_cosine_schedule():
    f = warmup_cosine(10, 0.0, 1.0, 0.0, 100)
    assert float(f(0)) == pytest.approx(0.0)
    assert float(f(10)) == pytest.approx(1.0, abs=1e-5)
    assert float(f(100)) == pytest.approx(0.0, abs=1e-5)


def test_lambda_linear_cyclic_matches_reference_formula():
    # one cycle: warmup 10 to f_max=1, then linear down to f_min + ...
    f = warmup_linear_cyclic([10], [0.1], [1.0], [0.0], [100])
    assert float(f(0)) == pytest.approx(0.0)
    assert float(f(5)) == pytest.approx(0.5)
    # n=50: f = 0.1 + 0.9 * (100-50)/100 = 0.55
    assert float(f(50)) == pytest.approx(0.55, abs=1e-5)


def test_optimizer_freezes_first_stage():
    params = {
        "model": {"k": jnp.ones((2, 2))},
        "first_stage_model": {"k": jnp.ones((2, 2))},
    }
    opt = make_optimizer(1e-3, params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["model"]["k"]).sum()) > 0
    np.testing.assert_allclose(np.asarray(updates["first_stage_model"]["k"]), 0.0)


def test_train_step_on_8dev_mesh():
    """Full DP train step on the virtual 8-device CPU mesh."""
    from ealdm_tpu.models.ddpm import DDPM
    from ealdm_tpu.parallel import MeshConfig, create_mesh, shard_batch

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = create_mesh(MeshConfig(data=8, model=1))

    model = DDPM(
        unet_config=dict(
            image_size=8, in_channels=3, model_channels=8, out_channels=3,
            num_res_blocks=1, attention_resolutions=[], channel_mult=[1],
            num_heads=1,
        ),
        timesteps=10,
    )
    batch = {"img": jnp.ones((16, 8, 8, 3)) * 0.1}
    state, opt = init_train_state(
        model, jax.random.PRNGKey(0), batch, learning_rate=1e-3
    )
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    sbatch = shard_batch(batch, mesh)
    state2, metrics = step(state, sbatch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda a, pq: a + float(jnp.abs(pq).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state.params, state2.params),
        0.0,
    )
    assert moved > 0
    # EMA shadow tracked
    assert int(state2.ema.num_updates) == 1
    # second step reuses the compiled executable
    state3, m3 = step(state2, sbatch, jax.random.PRNGKey(2))
    assert int(state3.step) == 2


def test_eval_step_reports_ema_metrics():
    from ealdm_tpu.models.ddpm import DDPM

    model = DDPM(
        unet_config=dict(
            image_size=8, in_channels=3, model_channels=8, out_channels=3,
            num_res_blocks=1, attention_resolutions=[], channel_mult=[1],
            num_heads=1,
        ),
        timesteps=10,
    )
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 0.1}
    state, _ = init_train_state(model, jax.random.PRNGKey(0), batch)
    ev = make_eval_step(model)
    metrics = ev(state.params, state.ema.shadow, batch, jax.random.PRNGKey(1))
    assert "loss_simple" in metrics and "loss_simple_ema" in metrics


def test_ema_value_parity_vs_reference_litema():
    """Multi-step EMA shadow values match the reference `LitEma`
    (`ldm/modules/ema.py:5-44`) exactly, in both warm-up
    (use_num_upates=True) and fixed-decay modes."""
    import sys

    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.modules.ema import LitEma

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    steps = [
        (rng.randn(4, 3).astype(np.float32), rng.randn(4).astype(np.float32))
        for _ in range(5)
    ]

    for use_num_updates in (True, False):
        net = torch.nn.Linear(3, 4)
        with torch.no_grad():
            net.weight.copy_(torch.from_numpy(w0))
            net.bias.copy_(torch.from_numpy(b0))
        ref_ema = LitEma(net, decay=0.9, use_num_upates=use_num_updates)

        st = ema_init(
            {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
            decay=0.9,
            use_num_updates=use_num_updates,
        )
        for w, b in steps:
            with torch.no_grad():
                net.weight.copy_(torch.from_numpy(w))
                net.bias.copy_(torch.from_numpy(b))
            ref_ema(net)
            st = ema_update(st, {"w": jnp.asarray(w), "b": jnp.asarray(b)})

        shadows = dict(ref_ema.named_buffers())
        np.testing.assert_allclose(
            np.asarray(st.shadow["w"]), shadows["weight"].numpy(),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(st.shadow["b"]), shadows["bias"].numpy(),
            rtol=1e-6, atol=1e-7,
        )
        assert int(st.num_updates) == (len(steps) if use_num_updates else -1)
