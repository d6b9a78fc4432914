"""CLI round-trip: train -> infer -> evaluate on the tiny synthetic config
(the reference's experiment-script surface, SURVEY.md §2 L6)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, *args, cwd):
    """Run a CLI module in a subprocess pinned to the CPU backend."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import runpy, sys; sys.argv = ['{module}'] + {list(args)!r};"
        f"runpy.run_module('{module}', run_name='__main__')"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
        timeout=600,
    )


@pytest.mark.slow
def test_train_infer_evaluate_roundtrip(tmp_path):
    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")

    r = run_cli(
        "bayesod_tpu.cli.train",
        "--yaml_path", cfg_path,
        "--max_steps", "3",
        "--out_dir", str(tmp_path / "run"),
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done: step 3" in r.stdout

    det_path = str(tmp_path / "dets.jsonl")
    r = run_cli(
        "bayesod_tpu.cli.infer",
        "--yaml_path", cfg_path,
        "--checkpoint_dir", str(tmp_path / "run" / "checkpoints"),
        "--out", det_path,
        "--max_images", "4",
        "--batch_size", "2",
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(det_path) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 4
    assert {"id", "boxes", "covs", "probs", "scores", "entropy", "classes"} <= set(
        recs[0]
    )

    r = run_cli(
        "bayesod_tpu.cli.evaluate",
        "--yaml_path", cfg_path,
        "--detections", det_path,
        "--min_score", "0.0",
        "--json_out", str(tmp_path / "metrics.json"),
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(tmp_path / "metrics.json"))
    assert "map" in metrics and "categorical_mue" in metrics


def test_infer_requires_checkpoint(tmp_path):
    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")
    r = run_cli(
        "bayesod_tpu.cli.infer",
        "--yaml_path", cfg_path,
        "--checkpoint_dir", str(tmp_path / "nonexistent"),
        "--max_images", "1",
        cwd=str(tmp_path),
    )
    assert r.returncode != 0
    assert "no checkpoint" in (r.stderr + r.stdout)


def test_config_override_surface(tmp_path):
    """Dotted overrides must reach the config (reference flag parity)."""
    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from bayesod_tpu.utils.config import load_config;"
        "cfg = load_config(%r, {'train.base_lr': 0.5, 'bayes.num_mc_samples': 7});"
        "assert cfg.train.base_lr == 0.5, cfg.train.base_lr;"
        "assert cfg.bayes.num_mc_samples == 7;"
        "print('OVERRIDES_OK')" % (REPO, cfg_path)
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "OVERRIDES_OK" in r.stdout


@pytest.mark.slow
def test_infer_quantized(tmp_path):
    """--quantize serves the int8-resident paths from the CLI (tiny config
    is groupnorm, so the backbone is skipped and FPN+trunks quantize)."""
    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")
    det_path = str(tmp_path / "dets_q.jsonl")
    r = run_cli(
        "bayesod_tpu.cli.infer",
        "--yaml_path", cfg_path,
        "--allow_random",
        "--quantize",
        "--calib_images", "2",
        "--out", det_path,
        "--max_images", "2",
        "--batch_size", "2",
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "quantized serving: backbone=bf16 fpn=int8_resident" in r.stdout
    with open(det_path) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2


@pytest.mark.slow
def test_infer_export_artifact(tmp_path):
    """--export_artifact writes a loadable serving bundle instead of
    running inference (infer/export.py)."""
    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")
    art = tmp_path / "tiny_serving.zip"
    r = run_cli(
        "bayesod_tpu.cli.infer",
        "--yaml_path", cfg_path,
        "--allow_random",
        "--export_artifact", str(art),
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote serving artifact" in r.stdout
    assert art.exists()

    import numpy as np

    import jax

    from bayesod_tpu.infer import ServingArtifact
    from bayesod_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    loaded = ServingArtifact.load(str(art))
    out = loaded(
        np.zeros((1, *cfg.data.image_hw, 3), np.uint8),
        jax.numpy.asarray([1, 2], jax.numpy.uint32),
    )
    assert np.isfinite(out["boxes"]).all()


@pytest.mark.slow
def test_serve_cli_http_endpoint(tmp_path):
    """cli.serve end-to-end: subprocess daemon, real HTTP detect round-trip
    (random-init weights; tiny synthetic config)."""
    import socket
    import time
    import urllib.request

    cfg_path = os.path.join(REPO, "configs", "tiny_synthetic.yaml")
    with socket.socket() as s:  # pick a free ephemeral port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv = ['bayesod_tpu.cli.serve', "
        f"'--yaml_path', {cfg_path!r}, '--allow_random', "
        f"'--host', '127.0.0.1', '--port', '{port}', '--batch_size', '2', "
        "'bayes.num_mc_samples=2'];"
        "runpy.run_module('bayesod_tpu.cli.serve', run_name='__main__')"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path), env=env,
    )
    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve exited early: {proc.stderr.read()[-2000:]}"
                )
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    up = json.load(r)["ok"]
                    break
            except Exception:
                time.sleep(2.0)
        assert up, "server never became healthy"

        import numpy as np

        cv2 = pytest.importorskip("cv2")
        img = np.random.default_rng(0).integers(
            0, 255, (96, 160, 3), dtype=np.uint8
        )
        ok, buf = cv2.imencode(".png", img[..., ::-1])
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect",
            data=buf.tobytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.load(r)
        det = payload["detections"]
        assert {"boxes", "covs", "probs", "scores"} <= set(det)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10
        ) as r:
            stats = json.load(r)
        assert stats["requests"] >= 1
    finally:
        proc.kill()
        proc.wait()


def test_import_chain_initializes_no_backend():
    """Importing the CLIs / evaluator must NOT initialize a jax backend:
    a module-scope jnp.array anywhere in the chain claims the device at
    import time, which hangs every CLI for minutes when the remote TPU
    tunnel is down (boxes._CENTROID_TO_CORNER regression, round 2)."""
    code = (
        "from jax._src import xla_bridge\n"
        "import bayesod_tpu.cli.evaluate\n"
        "import bayesod_tpu.infer.detector\n"
        "import bayesod_tpu.eval.evaluator\n"
        "import bayesod_tpu.train.trainer\n"
        "assert not xla_bridge._backends, sorted(xla_bridge._backends)\n"
        "print('CLEAN')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CLEAN" in r.stdout
