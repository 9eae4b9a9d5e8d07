"""Tests for the driver contract surface (__graft_entry__).

Round-1 shipped a red MULTICHIP artifact because nothing exercised
``dryrun_multichip`` the way the driver does (VERDICT.md "What's weak" #1).
These tests close that: one in-process run under the conftest 8-virtual-CPU
setup, and one subprocess run that reproduces the driver's invocation from
an env WITHOUT the force-host-device-count flag.
"""

import os
import re
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_traces():
    """entry() returns a jittable fn + example args at canonical shapes."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
    finally:
        sys.path.remove(REPO)
    fn, args = __graft_entry__.entry()
    visual, audio = args
    assert visual.shape == (8, 32, 96, 96, 3)
    assert audio.shape[0] == 8
    # eval_shape traces the full graph (catching shape/dtype bugs) without
    # paying CPU compile time for the 96x96 conv stack.
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8,)


def test_dryrun_multichip_inproc():
    """Under conftest's 8 virtual CPU devices the dry run executes directly."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
    finally:
        sys.path.remove(REPO)
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_driver_invocation():
    """Exact driver invocation: ``python -c "import __graft_entry__; ..."``
    from an env with NO force_host_platform_device_count flag, so
    dryrun_multichip must self-provision its virtual devices."""
    env = dict(os.environ)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\S+",
        "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__\n__graft_entry__.dryrun_multichip(8)\n",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
