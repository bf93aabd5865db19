"""Model-zoo materialization: `scripts/fetch_models.py` (the zero-egress
counterpart of the reference's download_*.sh) writes reference-schema
config stubs under models/ whose architecture-defining fields match the
reference's committed stubs (`/root/reference/models/**/config.yaml`)."""
import glob
import os
import subprocess
import sys

import pytest

yaml = pytest.importorskip("yaml")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_STUBS = sorted(glob.glob("/root/reference/models/*/*/config.yaml"))


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    r = subprocess.run(
        [sys.executable, "scripts/fetch_models.py", "--models-root", str(root)],
        cwd=REPO, capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return str(root)


def test_every_reference_stub_is_generated(generated):
    missing = [
        p for p in REF_STUBS
        if not os.path.exists(
            os.path.join(generated, os.path.relpath(p, "/root/reference/models"))
        )
    ]
    assert not missing, missing


@pytest.mark.parametrize(
    "ref_path", REF_STUBS,
    ids=[os.path.dirname(os.path.relpath(p, "/root/reference/models"))
         for p in REF_STUBS],
)
def test_stub_architecture_matches_reference(ref_path, generated):
    rel = os.path.relpath(ref_path, "/root/reference/models")
    ref = yaml.safe_load(open(ref_path))["model"]
    ours = yaml.safe_load(open(os.path.join(generated, rel)))["model"]

    assert ours["target"] == ref["target"]
    rp, op = ref["params"], ours["params"]
    if "ddconfig" in rp:  # first-stage stub
        for k, v in rp["ddconfig"].items():
            assert op["ddconfig"].get(k) == v, ("ddconfig", k)
        for k in ("embed_dim", "n_embed"):
            if k in rp:
                assert op.get(k) == rp[k], k
        return

    # LDM stub: base LR + diffusion schedule + shapes + loss/monitor/
    # trainability + conditioning wiring
    assert ours["base_learning_rate"] == pytest.approx(
        ref["base_learning_rate"])
    for k in ("linear_start", "linear_end", "timesteps", "image_size",
              "channels", "cond_stage_key", "conditioning_key", "loss_type",
              "cond_stage_trainable", "scale_by_std", "monitor",
              "num_timesteps_cond", "log_every_t"):
        if k in rp:
            assert op.get(k) == rp[k], k
    # concat_mode is the reference's legacy alias for conditioning_key
    if rp.get("concat_mode") is True:
        assert op.get("conditioning_key", "concat") == "concat"
    # training-time LR scheduler carried verbatim
    if "scheduler_config" in rp:
        assert op["scheduler_config"]["target"] == rp["scheduler_config"]["target"]
        for k, v in (rp["scheduler_config"].get("params") or {}).items():
            assert op["scheduler_config"]["params"].get(k) == pytest.approx(v), k
    # the reference VQModel ctor REQUIRES a lossconfig (autoencoder.py:15-17)
    ref_fsl = rp["first_stage_config"]["params"].get("lossconfig")
    if ref_fsl is not None:
        assert (op["first_stage_config"]["params"]
                ["lossconfig"]["target"] == ref_fsl["target"])

    for k, v in rp["unet_config"]["params"].items():
        assert op["unet_config"]["params"].get(k) == v, ("unet", k)

    ref_fs, our_fs = rp["first_stage_config"], op["first_stage_config"]
    assert our_fs["target"] == ref_fs["target"]
    for k, v in ref_fs["params"]["ddconfig"].items():
        assert our_fs["params"]["ddconfig"].get(k) == v, ("fs.ddconfig", k)

    ref_cs, our_cs = rp["cond_stage_config"], op["cond_stage_config"]
    if isinstance(ref_cs, str) or ref_cs is None:
        assert our_cs == ref_cs
    else:
        assert our_cs["target"] == ref_cs["target"]
        for k, v in (ref_cs.get("params") or {}).items():
            assert our_cs["params"].get(k) == v, ("cond", k)
