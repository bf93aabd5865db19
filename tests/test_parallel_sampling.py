"""Data-parallel sampling/serving over the 8-device mesh (pjit DDIM)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ealdm_tpu.models import UNetModel
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.parallel import MeshConfig, create_mesh
from ealdm_tpu.samplers import DDIMConfig, ddim_sample


def test_sharded_ddim_sampling_8dev():
    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshConfig(data=8, model=1))

    m = UNetModel(
        image_size=8, in_channels=3, model_channels=8, out_channels=3,
        num_res_blocks=1, attention_resolutions=[], channel_mult=[1],
        num_heads=1,
    )
    x0 = jnp.zeros((8, 8, 8, 3))
    t0 = jnp.zeros((8,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x0, t0)

    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 4)
    cfg = DDIMConfig(num_steps=4)

    def program(params, rng):
        eps = lambda x, t, c: m.apply(params, x, t)
        z = ddim_sample(eps, rng, (16, 8, 8, 3), ddim, cfg)
        return z

    repl = NamedSharding(mesh, P())
    out_spec = NamedSharding(mesh, P("data"))
    fn = jax.jit(program, in_shardings=(repl, repl), out_shardings=out_spec)
    params_r = jax.device_put(params, repl)
    out = fn(params_r, jax.device_put(jax.random.PRNGKey(1), repl))
    assert out.shape == (16, 8, 8, 3)
    # result is actually sharded across the data axis
    assert len(out.sharding.device_set) == 8
    assert np.isfinite(np.asarray(out)).all()


def test_param_consistency_check_8dev():
    from functools import partial

    from ealdm_tpu.misc import check_param_consistency

    mesh = create_mesh(MeshConfig(data=8, model=1))
    params = {"w": jnp.ones((8, 4))}  # leading axis = per-device shard

    @partial(
        jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False,
    )
    def drift(p):
        return check_param_consistency(p, axis_name="data")

    d = drift(params)
    assert float(d) == 0.0
    params_bad = {"w": jnp.ones((8, 4)).at[3].set(2.0)}
    d2 = drift(params_bad)
    assert float(d2) > 0.0
