"""HTTP captioning service tests (dlsg_tpu/server.py).

The reference has no serving story; the HTTP layer is beyond-parity product
surface, so the contract under test is our own protocol doc: npz and JSON
bodies, ?greedy=1, id passthrough, 400s on malformed payloads."""

import io
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.synthetic import make_vocab
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.serve import Captioner
from dlsg_tpu.server import CaptionServer


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config(test_batch_size=4, beam_size=2)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    B = cfg.test_batch_size
    frames = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps = jnp.zeros((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, regions, caps)["params"]
    cap = Captioner.from_params(cfg, vocab, params)
    srv = CaptionServer(cap, host="127.0.0.1", port=0)  # port 0 -> free port
    srv.start_background()
    yield srv, cap, cfg
    srv.shutdown()
    srv.server_close()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(srv, path, body, content_type):
    req = urllib.request.Request(
        _url(srv, path), data=body, headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def _clips(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.normal(size=(n, cfg.max_frames, cfg.feature_size)).astype(np.float32)
    regions = rng.normal(
        size=(n, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    ).astype(np.float32)
    return frames, regions


def test_healthz(server):
    srv, cap, cfg = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=60) as resp:
        status, payload = resp.status, json.loads(resp.read())
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["beam_size"] == cfg.beam_size
    assert payload["devices"] == jax.device_count()
    assert payload["warm"] is False  # fixture never calls warmup()


def test_caption_npz_body_matches_direct(server):
    srv, cap, cfg = server
    frames, regions = _clips(cfg, 3)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, regions=regions,
             video_ids=np.array(["video7001", "video7002", "video7003"]))
    status, payload = _post(srv, "/caption", buf.getvalue(), "application/x-npz")
    assert status == 200
    assert [c["video_id"] for c in payload["captions"]] == [
        "video7001", "video7002", "video7003"
    ]
    assert [c["caption"] for c in payload["captions"]] == cap.caption(frames, regions)
    assert payload["latency_s"] > 0


def test_caption_json_body_and_greedy(server):
    srv, cap, cfg = server
    frames, regions = _clips(cfg, 2, seed=1)
    body = json.dumps(
        {"frames": frames.tolist(), "regions": regions.tolist()}
    ).encode()
    status, payload = _post(srv, "/caption?greedy=1", body, "application/json")
    assert status == 200
    # no video_ids -> positional ints; greedy=1 -> greedy decode path
    assert [c["video_id"] for c in payload["captions"]] == [0, 1]
    assert [c["caption"] for c in payload["captions"]] == cap.caption(
        frames, regions, greedy=True
    )


@pytest.mark.parametrize("body,ctype,frag", [
    (b"not an npz", "application/x-npz", None),           # undecodable
    (b'{"frames": [1]}', "application/json", "regions"),  # missing key
])
def test_caption_malformed_is_400(server, body, ctype, frag):
    srv, cap, cfg = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/caption", body, ctype)
    assert ei.value.code == 400
    err = json.loads(ei.value.read())["error"]
    if frag:
        assert frag in err


def test_caption_mismatched_ids_is_400(server):
    srv, cap, cfg = server
    frames, regions = _clips(cfg, 3, seed=2)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, regions=regions, video_ids=np.array([1, 2]))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/caption", buf.getvalue(), "application/x-npz")
    assert ei.value.code == 400
    assert "video_ids" in json.loads(ei.value.read())["error"]


def test_concurrent_requests_all_succeed(server):
    """Parallel clients serialize around the device lock; every request gets
    its own correct captions (no cross-request state bleed)."""
    import concurrent.futures

    srv, cap, cfg = server
    frames, regions = _clips(cfg, 2, seed=9)
    expected = cap.caption(frames, regions, greedy=True)

    def one(i):
        body = json.dumps({
            "frames": frames.tolist(), "regions": regions.tolist(),
            "video_ids": [i * 10, i * 10 + 1],
        }).encode()
        status, payload = _post(srv, "/caption?greedy=1", body, "application/json")
        return status, payload["captions"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one, range(4)))
    for i, (status, caps) in enumerate(results):
        assert status == 200
        assert [c["video_id"] for c in caps] == [i * 10, i * 10 + 1]
        assert [c["caption"] for c in caps] == expected


def test_unknown_path_is_404(server):
    srv, cap, cfg = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv, "/nope", b"x", "application/json")
    assert ei.value.code == 404


def test_metrics_endpoint(server):
    """/metrics exposes Prometheus counters that track /caption traffic."""
    srv, cap, cfg = server

    def scrape():
        with urllib.request.urlopen(_url(srv, "/metrics")) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        return {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines()
            if line and not line.startswith("#")
        }

    before = scrape()
    rng = np.random.default_rng(5)
    buf = io.BytesIO()
    np.savez(
        buf,
        frames=rng.normal(size=(2, cfg.max_frames, cfg.feature_size)).astype(np.float32),
        regions=rng.normal(size=(2, cfg.max_frames, cfg.num_obj,
                                 cfg.region_feature_size)).astype(np.float32),
    )
    _post(srv, "/caption", buf.getvalue(), "application/x-npz")
    with pytest.raises(urllib.error.HTTPError):
        _post(srv, "/caption", b"garbage", "application/json")
    after = scrape()

    assert after["dlsg_requests_total"] == before["dlsg_requests_total"] + 2
    assert after["dlsg_clips_total"] == before["dlsg_clips_total"] + 2
    assert after["dlsg_errors_total"] == before["dlsg_errors_total"] + 1
    assert after["dlsg_request_latency_seconds_count"] == \
        before["dlsg_request_latency_seconds_count"] + 1
    assert after["dlsg_request_latency_seconds_sum"] > \
        before["dlsg_request_latency_seconds_sum"]
    # histogram is cumulative: the +Inf bucket equals the count
    assert after['dlsg_request_latency_seconds_bucket{le="+Inf"}'] == \
        after["dlsg_request_latency_seconds_count"]
    assert after["dlsg_uptime_seconds"] > 0
    assert after["dlsg_warm"] in (0.0, 1.0)


def test_caption_wrong_feature_dims_is_400_and_counted(server):
    """Dims that pass the ndim check but mismatch the model config get a 400
    naming the expected shapes (not a dropped connection), and the error is
    visible in /metrics."""
    srv, cap, cfg = server

    def errors_total():
        with urllib.request.urlopen(_url(srv, "/metrics")) as r:
            for line in r.read().decode().splitlines():
                if line.startswith("dlsg_errors_total"):
                    return float(line.split()[1])

    before = errors_total()
    buf = io.BytesIO()
    np.savez(
        buf,
        frames=np.zeros((1, cfg.max_frames, cfg.feature_size + 3), np.float32),
        regions=np.zeros((1, cfg.max_frames, cfg.num_obj,
                          cfg.region_feature_size), np.float32),
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(srv, "/caption", buf.getvalue(), "application/x-npz")
    assert exc.value.code == 400
    assert "dims mismatch" in json.loads(exc.value.read())["error"]
    assert errors_total() == before + 1
