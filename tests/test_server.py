"""Dynamic-batching DetectionServer tests: coalescing, parity with the
direct Detector call, error propagation, and the HTTP front."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from bayesod_tpu.infer import Detector
from bayesod_tpu.infer.server import (
    DetectionServer,
    decode_image_bytes,
    make_http_server,
)
from bayesod_tpu.utils.config import (
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
)

RESULT_KEYS = {"boxes", "covs", "probs", "scores", "entropy", "classes"}


def tiny_detector(batch_size=4, seed=0):
    cfg = ExperimentConfig(
        name="serve_tiny",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="groupnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(
            num_mc_samples=2, score_threshold=0.0, pre_cluster_topk=32,
            max_detections=8,
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128)),
    )
    return Detector.from_config(cfg, batch_size=batch_size)


@pytest.fixture(scope="module")
def shared_det():
    return tiny_detector()


def rand_images(n, seed=0, hw=(128, 128)):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 255, (*hw, 3), dtype=np.uint8) for _ in range(n)
    ]


class TestBatchingWorker:
    def test_concurrent_submissions_coalesce(self, shared_det):
        """8 concurrent clients on a batch-4 detector: every request is
        answered with the Detector schema and batching actually happens
        (fewer batches than requests)."""
        imgs = rand_images(8, seed=1)
        with DetectionServer(shared_det, max_delay_ms=200.0) as srv:
            results = [None] * len(imgs)

            def client(i):
                results[i] = srv.detect(imgs[i], timeout=120)

            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(len(imgs))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            stats = srv.stats
        for res in results:
            assert set(res) == RESULT_KEYS
            assert res["covs"].shape[-2:] == (4, 4)
        assert stats.requests == 8
        # With a 200 ms window on an already-compiled tiny graph, 8 requests
        # must not degenerate to 8 single-image batches.
        assert stats.batches < 8
        assert stats.mean_batch_fill > 1.0

    def test_matches_direct_detector_call(self):
        """A full batch submitted in order reproduces Detector.__call__
        bit-exactly (same fold_in(rng, 0) on the first launch)."""
        det_srv = tiny_detector(batch_size=4, seed=0)
        det_ref = tiny_detector(batch_size=4, seed=0)
        imgs = rand_images(4, seed=2)
        want = det_ref(imgs)
        with DetectionServer(det_srv, max_delay_ms=2000.0) as srv:
            futs = [srv.submit(im) for im in imgs]  # one ordered batch
            got = [f.result(timeout=120) for f in futs]
        for g, w in zip(got, want):
            for k in RESULT_KEYS:
                np.testing.assert_array_equal(g[k], w[k])

    def test_bad_input_rejected_immediately(self, shared_det):
        with DetectionServer(shared_det) as srv:
            with pytest.raises(ValueError, match="HxWx3"):
                srv.submit(np.zeros((128, 128), np.uint8))

    def test_worker_error_propagates_to_futures(self, shared_det):
        class Boom:
            batch_size = 2

            def __call__(self, images):
                raise RuntimeError("device fell over")

        with DetectionServer(Boom(), max_delay_ms=50.0) as srv:
            fut = srv.submit(np.zeros((8, 8, 3), np.uint8))
            with pytest.raises(RuntimeError, match="device fell over"):
                fut.result(timeout=30)
            assert srv.stats.errors == 1

    def test_close_drains_then_rejects(self, shared_det):
        srv = DetectionServer(shared_det, max_delay_ms=1.0)
        fut = srv.submit(rand_images(1, seed=3)[0])
        srv.close()
        assert set(fut.result(timeout=120)) == RESULT_KEYS
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(np.zeros((8, 8, 3), np.uint8))


class TestHttpFront:
    @pytest.fixture()
    def http_srv(self, shared_det):
        srv = DetectionServer(shared_det, max_delay_ms=1.0)
        httpd = make_http_server(srv, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        host, port = httpd.server_address[:2]
        yield f"http://{host}:{port}"
        httpd.shutdown()
        httpd.server_close()
        srv.close()

    def _png_bytes(self, img):
        cv2 = pytest.importorskip("cv2")
        ok, buf = cv2.imencode(".png", img[..., ::-1])
        assert ok
        return buf.tobytes()

    def test_decode_image_bytes_roundtrip(self):
        img = rand_images(1, seed=4, hw=(32, 48))[0]
        np.testing.assert_array_equal(
            decode_image_bytes(self._png_bytes(img)), img
        )

    def test_healthz_and_stats(self, http_srv):
        with urllib.request.urlopen(f"{http_srv}/healthz", timeout=30) as r:
            assert json.load(r) == {"ok": True}
        with urllib.request.urlopen(f"{http_srv}/stats", timeout=30) as r:
            stats = json.load(r)
        assert {"requests", "batches", "mean_batch_fill"} <= set(stats)

    def test_post_detect(self, http_srv):
        img = rand_images(1, seed=5, hw=(96, 160))[0]
        req = urllib.request.Request(
            f"{http_srv}/detect", data=self._png_bytes(img), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.load(r)
        det = payload["detections"]
        assert set(det) == RESULT_KEYS
        for b in det["boxes"]:
            assert 0 <= b[0] <= 160 and 0 <= b[1] <= 96

    def test_post_garbage_is_400(self, http_srv):
        req = urllib.request.Request(
            f"{http_srv}/detect", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
