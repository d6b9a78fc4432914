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
    """Run the dryrun exactly as the driver would (fresh process, 8 devices)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in r.stdout
