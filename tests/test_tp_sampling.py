"""Tensor-parallel sampling: dp2 x tp4 == single-device, numerically.

The serving-latency story for larger-than-chip variants: UNet params
sharded on the `model` axis (output-feature rule, `parallel/sharding.py`),
batch on `data`, the whole DDIM scan one pjit program. The test pins the
sharded program to the replicated single-device trajectory (same noise),
not just finiteness — the GSPMD-inserted collectives must be exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ealdm_tpu.models import UNetModel
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.parallel import MeshConfig, create_mesh
from ealdm_tpu.parallel.sharding import state_sharding_rules
from ealdm_tpu.samplers import DDIMConfig, ddim_sample


def _build():
    m = UNetModel(
        image_size=8, in_channels=3, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=[1], channel_mult=[1, 2],
        num_heads=2,
    )
    x0 = jnp.zeros((2, 8, 8, 3))
    t0 = jnp.zeros((2,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x0, t0)
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 4)
    cfg = DDIMConfig(num_steps=4)

    def program(params, rng):
        eps = lambda x, t, c: m.apply(params, x, t)
        return ddim_sample(eps, rng, (8, 8, 8, 3), ddim, cfg)

    return m, params, program


def test_tp_sharded_sampling_matches_single_device():
    assert len(jax.devices()) == 8
    _, params, program = _build()
    rng = jax.random.PRNGKey(7)

    ref = jax.jit(program)(params, rng)  # single-logical-device baseline

    mesh = create_mesh(MeshConfig(data=2, model=4))
    param_sh = state_sharding_rules(params, mesh)
    # the shape-based TP rule must actually shard something for the test
    # to exercise collectives
    specs = jax.tree_util.tree_map(lambda s: s.spec, param_sh)
    assert any(
        "model" in str(s) for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P))
    )
    fn = jax.jit(
        program,
        in_shardings=(param_sh, NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    out = fn(jax.device_put(params, param_sh), jax.device_put(
        rng, NamedSharding(mesh, P())))

    assert out.shape == ref.shape
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-5
    )
