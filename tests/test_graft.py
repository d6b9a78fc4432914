"""Driver-contract tests: entry() traces; dryrun_multichip runs on the
virtual CPU mesh (the same path the external driver exercises)."""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_traces_and_shapes():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.boxes.shape == (1, 100, 4)
    assert out.covs.shape == (1, 100, 4, 4)
    assert out.probs.shape[-1] == 4  # 3 classes + background


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """Run the dryrun exactly as the driver would: a fresh process that
    IMPORTS the module and calls dryrun_multichip(8) directly — no __main__
    path, no CPU pre-forcing, no JAX_PLATFORMS/XLA_FLAGS in the env. The
    function itself must force the virtual 8-device CPU mesh (round-1
    MULTICHIP failure mode)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "GRAFT_DRYRUN_KEEP_PLATFORM")
    }
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in r.stdout
