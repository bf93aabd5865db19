"""Driver-contract tests: run __graft_entry__ the way the driver runs it.

Reference capability matched: working multi-device training
(/root/reference/main.py:577 Lightning DDP). The driver invokes
dryrun_multichip(n) from a process whose backend may expose only one device;
the function must bootstrap a virtual CPU mesh itself.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def _run(env_overrides, args):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, ENTRY, *args],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_dryrun_cli_8dev():
    """`python __graft_entry__.py --dryrun 8` on an 8-device CPU backend."""
    proc = _run(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
        ["--dryrun", "8"],
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_dryrun_bootstraps_from_one_device():
    """The driver scenario: backend has 1 device, dryrun(8) must still pass
    by re-execing onto a virtual 8-CPU mesh (env set before JAX init)."""
    proc = _run(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        },
        ["--dryrun", "8"],
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
