"""HTTP serving (vlp3d/serve.py): wire format, micro-batching, and
consistency with the direct predictor path.

Runs a real ThreadingHTTPServer on an ephemeral port with the tiny
synthetic config (random-init weights) and drives it with
urllib — the same stack a production client uses.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.serve import InferenceService, MicroBatcher, make_server
from vlp3d.serving import STREAM_KEYS, GroundingPredictor

BATCH = 2
NPTS = 256


def _variables(config, train=False):
    model = JointNet(config)
    b0 = make_batch(config, batch_size=BATCH, num_points=NPTS, istrain=0)
    return jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=train)
    )(b0)


@pytest.fixture(scope="module")
def ground_service():
    config = tiny_config(no_caption=True, use_con=False)
    config = _with_points(config)
    service = InferenceService(
        config, _variables(config), task="ground", batch_size=BATCH,
        max_wait_ms=30.0,
    )
    server = make_server(service)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield service, server.server_address[1], config
    server.shutdown()
    server.server_close()
    service.close()


def _with_points(config):
    import dataclasses

    return dataclasses.replace(
        config, dataset=dataclasses.replace(config.dataset, num_points=NPTS)
    )


def _post(port, route, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(port, route):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{route}", timeout=30
    ) as r:
        return json.loads(r.read())


def _scene(seed, n=NPTS, channels=None):
    rng = np.random.default_rng(seed)
    c = channels if channels is not None else 3
    return rng.uniform(0, 4, size=(n, c)).astype(np.float32)


class TestGroundEndpoint:
    def test_health(self, ground_service):
        _, port, config = ground_service
        h = _get(port, "/healthz")
        assert h["status"] == "ok" and h["task"] == "ground"
        assert h["num_points"] == NPTS

    def test_ground_roundtrip_matches_direct_predictor(self, ground_service):
        service, port, config = ground_service
        pc = _scene(0, channels=3 + config.model.input_feature_dim)
        resp = _post(
            port, "/v1/ground",
            {"point_cloud": pc.tolist(), "queries": ["the red chair"]},
        )
        assert len(resp["boxes"]) == 1
        box = resp["boxes"][0]
        assert len(box["center"]) == 3 and len(box["size"]) == 3

        # the same request through the service object (no HTTP) agrees
        again = service.handle(
            {"point_cloud": pc.tolist(), "queries": ["the red chair"]}
        )
        assert again["boxes"][0]["proposal"] == box["proposal"]
        np.testing.assert_allclose(
            again["boxes"][0]["center"], box["center"], atol=1e-6
        )

    def test_b64_encoding_and_resampling(self, ground_service):
        _, port, config = ground_service
        # wrong N (resampled) + xyz-only channels (zero-filled), base64 wire
        pc = _scene(1, n=NPTS + 37, channels=3)
        payload = {
            "point_cloud": {
                "b64": base64.b64encode(
                    pc.astype("<f4").tobytes()
                ).decode(),
                "shape": list(pc.shape),
            },
            "queries": ["the table by the window"],
        }
        resp = _post(port, "/v1/ground", payload)
        assert len(resp["boxes"]) == 1

    def test_concurrent_requests_coalesce(self, ground_service):
        service, port, config = ground_service
        before = service.stats()["device_batches"]
        results = [None, None]

        def call(i):
            pc = _scene(10 + i)
            results[i] = _post(
                port, "/v1/ground",
                {"point_cloud": pc.tolist(), "queries": [f"object {i}"]},
            )

        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(r is not None and "boxes" in r for r in results)
        after = service.stats()
        # two concurrent requests; batch_size=2, 30 ms window -> they fit
        # in at most 2 device batches, usually 1 (cannot assert exactly 1
        # without a scheduling race)
        assert after["device_batches"] - before <= 2
        assert after["requests"] >= 2
        # latency percentiles populate once requests have flowed
        lat = after["latency_ms"]
        assert lat["p50"] is not None and lat["p50"] <= lat["p99"]
        bt = after["batch_ms"]
        assert bt["p50"] is not None and bt["p50"] <= bt["p99"]

    def test_bad_requests_400(self, ground_service):
        _, port, config = ground_service
        for payload in (
            {},  # no point cloud
            {"point_cloud": [[0.0, 1.0]], "queries": ["x"]},  # bad width
            {"point_cloud": _scene(3).tolist()},  # ground needs queries
            {
                "point_cloud": _scene(4).tolist(),
                "queries": ["a"] * (config.model.lang_num_max + 1),
            },
            # ragged rows and an empty cloud are client errors, not 500s
            {"point_cloud": [[0.0, 0.0, 0.0], [0.0, 0.0]], "queries": ["x"]},
            {"point_cloud": [], "queries": ["x"]},
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(port, "/v1/ground", payload)
            assert ei.value.code == 400
            assert "error" in json.loads(ei.value.read())

    def test_malformed_bodies_400(self, ground_service):
        _, port, _ = ground_service
        for body in (b"not json", b"[1, 2, 3]", b'"a string"'):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/ground",
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400

    def test_xyz_only_gets_derived_height(self, ground_service):
        # the last feature channel follows the training convention
        # z - percentile(z, 0.99); zero-filling it would be OOD
        service, _, config = ground_service
        from vlp3d.serve import _parse_point_cloud

        pc = _scene(7, channels=3)
        in_dim = config.model.input_feature_dim
        arr = _parse_point_cloud(
            {"point_cloud": pc.tolist()}, service.num_points, in_dim
        )
        assert arr.shape == (service.num_points, 3 + in_dim)
        floor = np.percentile(pc[:, 2], 0.99)
        np.testing.assert_allclose(
            arr[:, -1], arr[:, 2] - floor, rtol=0, atol=1e-6
        )
        if in_dim > 1:  # other feature channels stay zero-filled
            assert not np.any(arr[:, 3:-1])

    def test_submit_after_close_raises(self, ground_service):
        from vlp3d.serve import MicroBatcher

        b = MicroBatcher(lambda items: [{} for _ in items], 2, 5.0)
        assert b.submit({"x": 1}) == {}
        b.close()
        with pytest.raises(RuntimeError):
            b.submit({"x": 2})

    def test_unknown_route_404(self, ground_service):
        _, port, _ = ground_service
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/caption", {"point_cloud": _scene(5).tolist()})
        assert ei.value.code == 404


def test_caption_service_decodes():
    config = _with_points(tiny_config(no_caption=False, use_con=False))
    service = InferenceService(
        config, _variables(config, train=True), task="caption",
        batch_size=BATCH,
    )
    try:
        pc = _scene(6, channels=3 + config.model.input_feature_dim)
        resp = service.handle({"point_cloud": pc.tolist()})
        assert len(resp["proposals"]) == config.model.num_proposal
        for prop in resp["proposals"]:
            assert isinstance(prop["caption"], str)
            assert prop["objectness"] in (0, 1)
    finally:
        service.close()


def test_answer_service_topk():
    config = _with_points(
        tiny_config(no_caption=True, use_con=False, use_answer=True)
    )
    vocab = [f"answer_{i}" for i in range(2000)]
    service = InferenceService(
        config, _variables(config), task="answer", batch_size=BATCH,
        answer_vocab=vocab, topk=5,
    )
    try:
        pc = _scene(7)
        resp = service.handle(
            {"point_cloud": pc.tolist(), "queries": ["what color is it?"]}
        )
        assert len(resp["answers"]) == 1
        top = resp["answers"][0]
        assert len(top) == 5
        assert top[0]["score"] >= top[-1]["score"]
        for a in top:
            if "answer" in a:
                assert a["answer"] == f"answer_{a['answer_id']}"
    finally:
        service.close()


def test_microbatcher_occupancy_and_propagates_errors():
    calls = []

    def run(items):
        calls.append(len(items))
        if items[0].get("boom"):
            raise RuntimeError("kaput")
        return [{"i": it["i"]} for it in items]

    mb = MicroBatcher(run, batch_size=4, max_wait_ms=1.0)
    try:
        assert mb.submit({"i": 42})["i"] == 42
        # run_batch sees only the OCCUPIED items; the fixed-shape pad
        # happens device-side in the predictor (serving.run_padded)
        assert calls[-1] == 1
        with pytest.raises(RuntimeError, match="kaput"):
            mb.submit({"boom": True, "i": 0})
        # the batcher survives a failed batch
        assert mb.submit({"i": 7})["i"] == 7
    finally:
        mb.close()


def test_multi_task_server_shares_checkpoint():
    """One server hosting all three tasks from one set of variables:
    per-task routes, aggregate healthz/stats, 404 lists served routes."""
    config = _with_points(
        tiny_config(no_caption=False, use_con=False, use_answer=True)
    )
    variables = _variables(config, train=True)
    services = {
        t: InferenceService(config, variables, task=t, batch_size=BATCH)
        for t in ("ground", "caption", "answer")
    }
    server = make_server(services)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        h = _get(port, "/healthz")
        assert h["status"] == "ok"
        assert set(h["tasks"]) == {"ground", "caption", "answer"}
        assert h["tasks"]["ground"]["num_points"] == NPTS

        pc = _scene(20, channels=3 + config.model.input_feature_dim)
        g = _post(port, "/v1/ground",
                  {"point_cloud": pc.tolist(), "queries": ["the bed"]})
        assert len(g["boxes"]) == 1
        c = _post(port, "/v1/caption", {"point_cloud": pc.tolist()})
        assert len(c["proposals"]) == config.model.num_proposal
        a = _post(port, "/v1/answer",
                  {"point_cloud": pc.tolist(), "queries": ["how many?"]})
        assert len(a["answers"]) == 1

        st = _get(port, "/stats")
        assert set(st) == {"ground", "caption", "answer"}
        assert all(st[k]["requests"] == 1 for k in st)

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/detect", {"point_cloud": pc.tolist()})
        assert ei.value.code == 404
        msg = json.loads(ei.value.read())["error"]
        assert "/v1/ground" in msg and "/v1/caption" in msg
    finally:
        server.shutdown()
        server.server_close()
        for s in services.values():
            s.close()


def test_serve_cli_build_and_roundtrip(tmp_path):
    """vlp3d-serve startup path end-to-end: parse_args + build_server on
    the tiny --smoke config, one HTTP round trip, clean shutdown; the
    --compile_cache_dir persistent cache must be populated by the warmup
    compiles (warm restarts skip the multi-minute compile)."""
    from vlp3d.cli import serve as serve_cli

    cache_dir = str(tmp_path / "serve_cache")
    prev_cache = getattr(jax.config, "jax_compilation_cache_dir", None)
    args, tasks = serve_cli.parse_args(
        ["--smoke", "--task", "ground", "--port", "0",
         "--serve_batch_size", str(BATCH),
         "--compile_cache_dir", cache_dir]
    )
    assert tasks == ("ground",)
    try:
        server, services = serve_cli.build_server(args, tasks)
    finally:
        # restore the suite-wide cache dir set by conftest
        if prev_cache:
            from vlp3d.utils.jitcache import enable_persistent_cache

            enable_persistent_cache(prev_cache)
    import os

    assert os.path.isdir(cache_dir) and os.listdir(cache_dir), (
        "warmup compiles did not populate the persistent cache"
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        h = _get(port, "/healthz")
        assert h["status"] == "ok" and h["task"] == "ground"
        pc = _scene(11, n=h["num_points"])
        resp = _post(
            port, "/v1/ground",
            {"point_cloud": pc.tolist(), "queries": ["the desk"]},
        )
        assert len(resp["boxes"]) == 1
        assert len(resp["boxes"][0]["center"]) == 3
    finally:
        server.shutdown()
        server.server_close()
        for s in services.values():
            s.close()
        t.join(timeout=10)


def test_serve_cli_rejects_bad_task_and_devices():
    from vlp3d.cli import serve as serve_cli

    with pytest.raises(SystemExit):
        serve_cli.parse_args(["--task", "detect"])
    args, tasks = serve_cli.parse_args(
        ["--smoke", "--task", "ground", "--data_devices", "999"]
    )
    with pytest.raises(SystemExit):
        serve_cli.build_server(args, tasks)


def test_service_warmup_compiles_before_traffic(ground_service):
    service, _, _ = ground_service
    before = service.stats()["device_batches"]
    service.warmup()
    after = service.stats()
    assert after["device_batches"] == before + 1
