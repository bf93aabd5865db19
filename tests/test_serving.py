"""AOT export / serving path (ealdm_tpu/serving.py)."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.config import model_from_config
from ealdm_tpu.serving import (
    SamplerService, export_fn, export_sampler, load_exported,
    maybe_initialize_distributed, save_exported,
)

TINY = {
    "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
    "params": {
        "timesteps": 20,
        "conditioning_key": "crossattn",
        "cond_stage_key": "mixed",
        "cond_stage_trainable": True,
        "unconditional_guidance_scale": 2.0,
        "unet_config": {
            "target": "x.UNetModel",
            "params": dict(
                image_size=4, in_channels=4, out_channels=4,
                model_channels=16, attention_resolutions=[1],
                num_res_blocks=1, channel_mult=[1], num_head_channels=8,
                use_spatial_transformer=True, transformer_depth=1,
                context_dim=64,
            ),
        },
        "first_stage_config": {
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 4, "n_embed": 32,
                "ddconfig": dict(
                    double_z=False, z_channels=4, resolution=16,
                    in_channels=3, out_ch=3, ch=8, ch_mult=[1, 2, 2],
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                ),
            },
        },
        "cond_stage_config": {
            "target": "STDiff.models.UnetCond",
            "params": {
                "mid_dim": 4, "emb_dim": 16, "out_dim": 64, "w_dim": 16,
                "f_dim": 1, "hidden_dim": 32,
                "cond_args": {
                    "type": "fourier", "dims": 2, "lr": 1, "lin_lr": 0.01,
                    "f_manual": [1.8, 2.0], "include_lin": True,
                    "noise": 0, "noise_f": [1.0, 1.0, 0], "noise_f_int": [],
                },
            },
        },
    },
}


def _mixed(b, res=16, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "img": jnp.asarray(rng.randn(b, res, res, 3), jnp.float32),
        "img_random": jnp.asarray(rng.randn(b, res, res, 3), jnp.float32),
        "flow": jnp.asarray(rng.randn(b, 1, 1), jnp.float32),
        "weather": jnp.asarray(rng.randn(b, 1, 16), jnp.float32),
        "time": jnp.asarray(rng.rand(b, 1), jnp.float32),
    }


@pytest.fixture(scope="module")
def tiny_model():
    model, _ = model_from_config(TINY)
    batch = {"img": _mixed(2)["img"], "mixed": _mixed(2)}
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init),
        rng,
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.05, s.dtype), variables
    )
    return model, variables


def test_export_roundtrip_matches_direct(tmp_path, tiny_model):
    model, variables = tiny_model
    exported, (v, mixed, rng) = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=3,
        image_size=16,
    )
    path = save_exported(exported, str(tmp_path / "sampler.bin"))
    served = load_exported(path)
    mixed = _mixed(2)
    rng = jax.random.PRNGKey(7)
    out_served = served(variables, mixed, rng)
    # direct recomputation through the same program body
    exported2, _ = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=3,
        image_size=16,
    )
    out_direct = jax.jit(exported2.call)(variables, mixed, rng)
    assert out_served.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(out_served), np.asarray(out_direct), rtol=1e-4, atol=1e-4
    )


def test_artifact_runs_without_model_code(tmp_path, tiny_model):
    """The serialized artifact must execute in a process that never imports
    ealdm_tpu — the core serving guarantee."""
    model, variables = tiny_model
    exported, _ = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=2,
        image_size=16,
    )
    path = save_exported(exported, str(tmp_path / "sampler.bin"))
    np.save(tmp_path / "vars.npy",
            np.array([0], dtype=np.int8))  # marker only
    script = f"""
import sys
assert "ealdm_tpu" not in sys.modules
import json, pickle, struct, numpy as np, jax, jax.numpy as jnp
raw = open({str(path)!r}, "rb").read()
# the artifact container is stdlib-parseable: magic, u64 header len, JSON
# header, StableHLO payload
MAGIC = b"EALDMEXP1\\n"
if raw.startswith(MAGIC):
    (n,) = struct.unpack_from("<Q", raw, len(MAGIC))
    header = json.loads(raw[len(MAGIC) + 8 : len(MAGIC) + 8 + n])
    assert header["format"] == "ealdm-exported-v1", header
    raw = raw[len(MAGIC) + 8 + n:]
exp = jax.export.deserialize(raw)
import pickle
variables = pickle.load(open({str(tmp_path / 'vars.pkl')!r}, "rb"))
variables = jax.tree_util.tree_map(jnp.asarray, variables)
mixed = {{
    "img": jnp.zeros((2, 16, 16, 3)), "img_random": jnp.zeros((2, 16, 16, 3)),
    "flow": jnp.zeros((2, 1, 1)), "weather": jnp.zeros((2, 1, 16)),
    "time": jnp.zeros((2, 1)),
}}
out = exp.call(variables, mixed, jax.random.PRNGKey(0))
assert "ealdm_tpu" not in sys.modules
print("SERVED", out.shape)
"""
    import pickle

    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    with open(tmp_path / "vars.pkl", "wb") as f:
        pickle.dump(host_vars, f)
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin", "HOME": "/root"}
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SERVED (2, 16, 16, 3)" in proc.stdout


def test_sampler_service_batches_and_pads(tiny_model):
    model, variables = tiny_model
    exported, _ = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=2,
        image_size=16,
    )
    svc = SamplerService(jax.jit(exported.call), variables, batch_size=2)
    rng = np.random.RandomState(1)
    for _ in range(3):  # 3 requests -> 2 batches (second padded)
        m = _mixed(1, rng=rng)
        svc.submit({k: v[0] for k, v in m.items()})
    assert svc.pending() == 3
    outs = svc.serve_pending()
    assert svc.pending() == 0
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (16, 16, 3)
        assert np.isfinite(o).all()


def test_maybe_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    assert maybe_initialize_distributed() is False


def test_export_cli_end_to_end(tmp_path):
    """Train a micro run, export its sampler via the CLI, reload the
    artifact and run it."""
    import glob
    import os
    import subprocess

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONUNBUFFERED="1")
    from ealdm_tpu.data import generate_synthetic_dataset

    if not os.path.isdir("/tmp/ealdm_synth/Site_A_01"):
        generate_synthetic_dataset("/tmp/ealdm_synth", n_days=30, image_size=32)

    logroot = str(tmp_path / "logs")
    r = subprocess.run(
        [sys.executable, "main.py", "-t", "-b",
         "configs/smoke/stdiff_micro.yaml", "-l", logroot, "--max_steps", "2",
         "--max_epochs", "1", "--third_stage", "false"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = glob.glob(os.path.join(logroot, "*"))[0]

    art = str(tmp_path / "sampler.stablehlo")
    r2 = subprocess.run(
        [sys.executable, "scripts/export_sampler.py", "-r", run_dir,
         "-o", art, "--batch_size", "2", "--steps", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=500,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.getsize(art) > 1000

    served = load_exported(art)
    variables, res = _reload_params_for(run_dir)
    mixed = _mixed(2, res=res)
    out = served(variables, mixed, jax.random.PRNGKey(0))
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def _reload_params_for(run_dir):
    """Rebuild the run's EMA params exactly as export_sampler.py does;
    returns ({"params": ...}, image_resolution)."""
    import yaml
    import glob
    import os

    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.training import init_train_state
    from ealdm_tpu.training.checkpoint import CheckpointManager

    cfgs = sorted(glob.glob(os.path.join(run_dir, "configs", "*.yaml")))
    with open(cfgs[-1]) as f:
        config = yaml.safe_load(f)
    model, _ = model_from_config(config["model"])
    mp = config["model"]["params"]
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    b = 2
    batch = {"img": jnp.zeros((b, res, res, 3))}
    batch["mixed"] = {
        "img": batch["img"], "img_random": batch["img"],
        "flow": jnp.zeros((b, 1, 1)), "weather": jnp.zeros((b, 1, 16)),
        "time": jnp.zeros((b, 1)),
    }
    state, _ = init_train_state(model, jax.random.PRNGKey(0), batch,
                                use_ema=True)
    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"), monitor=None)
    state = mgr.restore_last(jax.device_get(state))
    params = state.ema.shadow if state.ema is not None else state.params
    return {"params": params}, res


def test_cross_platform_export_tags_and_metadata(tmp_path, tiny_model):
    """Export FOR TPU from this CPU host (the advertised artifact-build
    story, serving.py docstring) and assert the artifact records its
    target platform + config blob without needing a TPU to inspect."""
    from ealdm_tpu.serving import read_artifact

    model, variables = tiny_model
    exported, _ = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=2,
        image_size=16, platforms=("tpu",),
    )
    assert tuple(exported.platforms) == ("tpu",)
    path = save_exported(exported, str(tmp_path / "sampler_tpu.bin"),
                         meta={"steps": 2, "note": "cross-platform"})
    header, payload = read_artifact(path)
    assert header["platforms"] == ["tpu"]
    assert header["config"]["steps"] == 2
    assert header["framework_version"]
    assert len(payload) > 1000
    # and the metadata-aware loader surfaces the same header
    import jax

    fn, header2 = __import__("ealdm_tpu.serving", fromlist=["load_exported"]) \
        .load_exported(path, with_meta=True)
    assert header2 == header


def test_headerless_artifact_still_loads(tmp_path, tiny_model):
    """Raw jax.export payloads (no container header) keep working."""
    from ealdm_tpu.serving import load_exported, read_artifact

    model, variables = tiny_model
    exported, (variables, mixed, rng) = export_sampler(
        model, variables, batch_size=2, latent_shape=(4, 4, 4), steps=2,
        image_size=16,
    )
    raw_path = str(tmp_path / "raw.bin")
    with open(raw_path, "wb") as f:
        f.write(exported.serialize())
    header, _ = read_artifact(raw_path)
    assert header == {}
    out = load_exported(raw_path)(variables, mixed, rng)
    assert out.shape[0] == 2


def test_maybe_initialize_distributed_positive_path(monkeypatch):
    """Single-process positive path: coordinator env set -> initialize is
    invoked with the parsed env (stubbed so the test stays hermetic; the
    real bring-up needs a live coordinator port)."""
    import ealdm_tpu.serving as serving

    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setenv("JAX_COORDINATOR", "localhost:12345")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    monkeypatch.setattr(
        serving.jax.distributed, "initialize", fake_init)
    assert serving.maybe_initialize_distributed() is True
    assert calls == {"addr": "localhost:12345", "n": 1, "pid": 0}
