"""Serving layer: drive the HTTP service end to end over a real socket."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import serve

    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    ckpt = str(tmp_path_factory.mktemp("srv") / "m.msgpack")
    save_params(ckpt, params)

    # port 0: pick a free one.  Small caps so the hardening paths (413 body
    # cap, frame-count cap) are exercisable without multi-MB payloads.
    server = serve(ckpt, port=0, dtype="f32", max_body_mb=1, max_frames=4)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()


def _post(url, body, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _png(img):
    import cv2

    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


@pytest.fixture(scope="module")
def clip():
    cv2 = pytest.importorskip("cv2")
    frames = [cv2.imread(
        f"/root/reference/test/inputs/ambush_4/frame_{i:04d}.png")[:64, :96]
        for i in (1, 2, 3)]
    style = cv2.resize(
        cv2.imread("/root/reference/test/inputs/plum_flower.jpg"), (64, 64))
    return frames, style


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=60) as r:
        data = json.loads(r.read())
    assert data["ok"] is True


def test_metrics_endpoint(server_url):
    """GET /metrics: Prometheus text with uptime, request counters, and
    session gauges; counters move with traffic."""
    for _ in range(2):
        urllib.request.urlopen(server_url + "/healthz", timeout=60).read()
    with urllib.request.urlopen(server_url + "/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "rerevst_uptime_seconds" in text
    assert "rerevst_open_clip_sessions 0" in text
    import re

    m = re.search(r'rerevst_requests_total\{endpoint="healthz"\} (\d+)',
                  text)
    assert m and int(m.group(1)) >= 2, text
    assert 'rerevst_session_ready{part="style"}' in text


def test_two_pass_protocol_over_http(server_url, clip):
    frames, style = clip
    s, _, _ = _post(server_url + "/style", _png(style))
    assert s == 200
    for i, f in enumerate(frames):
        last = "1" if i == len(frames) - 1 else "0"
        s, _, _ = _post(server_url + f"/pass1?last={last}", _png(f))
        assert s == 200
    s, body, ctype = _post(server_url + "/stylize", _png(frames[0]))
    assert s == 200 and ctype == "image/png"
    import cv2

    out = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    assert out.shape == frames[0].shape


def test_video_endpoint(server_url, clip):
    frames, style = clip
    _post(server_url + "/style", _png(style))
    bio = io.BytesIO()
    np.savez_compressed(bio, **{f"f{i:05d}": f for i, f in enumerate(frames)})
    s, body, _ = _post(server_url + "/video?interval=2", bio.getvalue())
    assert s == 200
    with np.load(io.BytesIO(body)) as z:
        outs = [z[k] for k in sorted(z.files)]
    assert len(outs) == len(frames)
    assert outs[0].shape == frames[0].shape


def test_bad_payload_is_a_clean_400(server_url):
    s, body, _ = _post(server_url + "/stylize", b"not an image")
    assert s == 400
    err = json.loads(body)["error"]
    assert err["type"] and err["message"]


def test_unknown_route_404(server_url):
    s, _, _ = _post(server_url + "/nope", b"")
    assert s == 404


def test_oversized_body_413(server_url):
    s, body, _ = _post(server_url + "/stylize", b"\0" * (2 << 20))  # cap 1MB
    assert s == 413
    assert "exceeds cap" in json.loads(body)["error"]["message"]


def test_malformed_npz_400(server_url, clip):
    _, style = clip
    _post(server_url + "/style", _png(style))
    s, body, _ = _post(server_url + "/video", b"definitely not an npz")
    assert s == 400
    assert "npz" in json.loads(body)["error"]["message"]


def test_video_frame_validation_400(server_url, clip):
    frames, style = clip
    _post(server_url + "/style", _png(style))
    # Too many frames (cap 4 in the fixture).
    bio = io.BytesIO()
    np.savez_compressed(bio, **{f"f{i}": frames[0] for i in range(5)})
    s, body, _ = _post(server_url + "/video", bio.getvalue())
    assert s == 400 and "too long" in json.loads(body)["error"]["message"]
    # Wrong dtype.
    bio = io.BytesIO()
    np.savez_compressed(bio, f0=frames[0].astype(np.float32))
    s, body, _ = _post(server_url + "/video", bio.getvalue())
    assert s == 400 and "uint8" in json.loads(body)["error"]["message"]
    # Inconsistent geometry.
    bio = io.BytesIO()
    np.savez_compressed(bio, f0=frames[0], f1=frames[1][:32])
    s, body, _ = _post(server_url + "/video", bio.getvalue())
    assert s == 400 and "geometry" in json.loads(body)["error"]["message"]


def test_multistyle_interpolate_endpoints(server_url, clip):
    """POST /styles + /interpolate: blended stylization over HTTP with an
    explicit per-frame weight schedule."""
    frames, style = clip
    style2 = frames[1][:64, :64]
    bio = io.BytesIO()
    np.savez_compressed(bio, s0=style, s1=style2)
    s, body, _ = _post(server_url + "/styles", bio.getvalue())
    assert s == 200 and json.loads(body)["styles"] == 2

    weights = np.asarray([[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]], np.float32)
    bio = io.BytesIO()
    np.savez_compressed(bio, **{f"f{i}": f for i, f in enumerate(frames)},
                        weights=weights)
    s, body, _ = _post(server_url + "/interpolate", bio.getvalue())
    assert s == 200, body
    with np.load(io.BytesIO(body)) as z:
        outs = [z[k] for k in sorted(z.files)]
    assert len(outs) == len(frames)
    assert outs[0].shape == frames[0].shape and outs[0].dtype == np.uint8
    # Endpoint weights differ -> endpoint outputs differ.
    assert np.abs(outs[0].astype(int) - outs[2].astype(int)).mean() > 0.2

    # Bad weight shape is a clean 400.
    bio = io.BytesIO()
    np.savez_compressed(bio, f0=frames[0],
                        weights=np.ones((5, 2), np.float32))
    s, body, _ = _post(server_url + "/interpolate", bio.getvalue())
    assert s == 400 and "weights shape" in json.loads(body)["error"]["message"]


def test_interpolate_before_styles_is_409(server_url, clip):
    # A fresh service has no multi-style session -> 409.  (The module
    # server may have styles from the previous test; spin a tiny check on
    # ordering instead: hit a bogus clip token, also 409.)
    s, body, _ = _post(server_url + "/clip/nope/finish", b"")
    assert s == 409


def test_chunked_clip_session_exceeds_body_cap(tmp_path_factory, clip):
    """A clip whose total payload exceeds the request-body cap streams
    through the /clip session protocol: every request/response stays under
    the cap, the server spools to disk, and the result equals the direct
    pipeline's output frame for frame."""
    import jax

    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import InferenceConfig, ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import serve

    frames3, style = clip
    frames = frames3 * 2  # 6 frames
    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    ckpt = str(tmp_path_factory.mktemp("clipsrv") / "m.msgpack")
    save_params(ckpt, params)

    cap_mb = 0.05  # 51 KiB — the whole clip doesn't fit in one request
    cap = int(cap_mb * (1 << 20))
    whole = io.BytesIO()
    np.savez_compressed(whole,
                        **{f"f{i:05d}": f for i, f in enumerate(frames)})
    assert len(whole.getvalue()) > cap, "fixture must exceed the body cap"

    server = serve(ckpt, port=0, dtype="f32", max_body_mb=cap_mb,
                   max_frames=64)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        s, _, _ = _post(url + "/style", _png(style))
        assert s == 200
        s, body, _ = _post(url + "/clip/open?interval=2", b"")
        assert s == 200
        token = json.loads(body)["clip"]
        for start in range(0, len(frames), 2):
            bio = io.BytesIO()
            np.savez_compressed(bio, **{
                f"f{i:05d}": f
                for i, f in enumerate(frames[start:start + 2])})
            chunk = bio.getvalue()
            assert len(chunk) <= cap, "each chunk must fit under the cap"
            s, body, _ = _post(url + f"/clip/{token}/frames", chunk)
            assert s == 200, body
        assert json.loads(body)["received"] == len(frames)
        s, body, _ = _post(url + f"/clip/{token}/finish", b"")
        assert s == 200, body
        assert json.loads(body)["frames"] == len(frames)

        outs = []
        for start in (0, 4):
            with urllib.request.urlopen(
                    url + f"/clip/{token}/result?start={start}&count=4",
                    timeout=600) as r:
                with np.load(io.BytesIO(r.read())) as z:
                    outs.extend(z[k] for k in sorted(z.files))
        assert len(outs) == len(frames)
        _post(url + f"/clip/{token}/close", b"")
        # Closed session is gone.
        s, _, _ = _post(url + f"/clip/{token}/finish", b"")
        assert s == 409
    finally:
        server.shutdown()

    # Byte-identical to the direct constant-memory pipeline.
    local = Stylization(
        checkpoint=ckpt,
        cfg=ModelConfig(),
        use_global=True,
        infer=InferenceConfig(sample_interval=2,
                              batch_size=min(len(frames), 8)))
    local.prepare_style(style)
    want = list(local.stylize_video(frames))
    for a, b in zip(outs, want):
        np.testing.assert_array_equal(a, b)


def test_async_clip_finish_polls_to_done(tmp_path, clip):
    """POST /clip/<t>/finish?async=1 returns 202 immediately; the pipeline
    runs on a background thread, /status reports progress, and the result
    matches the synchronous finish path."""
    import time

    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import serve

    frames, style = clip
    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    ckpt = str(tmp_path / "m.msgpack")
    save_params(ckpt, params)
    server = serve(ckpt, port=0, dtype="f32", max_frames=16)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"

    def run_clip(async_mode: bool):
        s, body, _ = _post(url + "/clip/open?interval=2", b"")
        token = json.loads(body)["clip"]
        bio = io.BytesIO()
        np.savez_compressed(bio, **{f"f{i:05d}": f
                                    for i, f in enumerate(frames)})
        s, body, _ = _post(url + f"/clip/{token}/frames", bio.getvalue())
        assert s == 200, body
        if async_mode:
            s, body, _ = _post(url + f"/clip/{token}/finish?async=1", b"")
            assert s == 202, body
            assert json.loads(body)["started"] is True
            # Frames may not be appended once finishing started.
            s, body, _ = _post(url + f"/clip/{token}/frames", bio.getvalue())
            assert s == 409, body
            deadline = time.time() + 600
            while time.time() < deadline:
                with urllib.request.urlopen(
                        url + f"/clip/{token}/status", timeout=60) as r:
                    st = json.loads(r.read())
                if st["status"] == "done":
                    assert st["progress"] == len(frames)
                    break
                assert st["status"] in ("running", "done"), st
                time.sleep(0.5)
            else:
                raise AssertionError("async finish never completed")
        else:
            s, body, _ = _post(url + f"/clip/{token}/finish", b"")
            assert s == 200, body
        with urllib.request.urlopen(
                url + f"/clip/{token}/result?start=0&count=8",
                timeout=600) as r:
            with np.load(io.BytesIO(r.read())) as z:
                outs = [z[k] for k in sorted(z.files)]
        _post(url + f"/clip/{token}/close", b"")
        return outs

    try:
        s, _, _ = _post(url + "/style", _png(style))
        assert s == 200
        sync_outs = run_clip(async_mode=False)
        async_outs = run_clip(async_mode=True)
    finally:
        server.shutdown()
    assert len(async_outs) == len(sync_outs) == len(frames)
    for a, b in zip(async_outs, sync_outs):
        np.testing.assert_array_equal(a, b)


def test_stylize_before_style_is_409(tmp_path, clip):
    """Protocol-state violations are 409, not 500."""
    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import serve

    frames, _ = clip
    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    ckpt = str(tmp_path / "m.msgpack")
    save_params(ckpt, params)
    server = serve(ckpt, port=0, dtype="f32")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        s, body, _ = _post(f"http://{host}:{port}/stylize", _png(frames[0]))
        assert s == 409
        assert json.loads(body)["error"]["type"] == "RuntimeError"
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def spool_service(tmp_path_factory):
    """A StylizeService for spool-layer unit tests (no device work: the
    style slot is stubbed so clip_open passes its protocol check and
    clip_finish is never called)."""
    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import StylizeService

    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    ckpt = str(tmp_path_factory.mktemp("spool") / "m.msgpack")
    save_params(ckpt, params)
    svc = StylizeService(ckpt, dtype="f32")
    svc.session.style = object()  # satisfy clip_open's has-style check
    return svc


def test_concurrent_clip_frames_lose_no_frames(spool_service):
    """/clip/<t>/frames chunks arriving on concurrent handler threads must
    serialize per clip: every frame lands, n is exact, no file overwritten."""
    import os

    svc = spool_service
    token = svc.clip_open(interval=8)
    frame = np.full((8, 8, 3), 7, np.uint8)
    n_threads, chunks, per_chunk = 8, 4, 2
    errs = []

    def upload():
        try:
            for _ in range(chunks):
                svc.clip_frames(token, [frame] * per_chunk, max_frames=1024)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    ts = [threading.Thread(target=upload) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    total = n_threads * chunks * per_chunk
    clip = svc._clip(token)
    assert clip["n"] == total
    names = {f"frame_{i:06d}.png" for i in range(total)}
    assert names <= set(os.listdir(clip["dir"]))
    svc.clip_close(token)
    assert not os.path.exists(clip["dir"])


def test_abandoned_clip_sessions_are_pruned(spool_service):
    """Idle sessions past the TTL are swept on the next /clip/open; the
    open-session cap rejects loudly instead of spooling unboundedly."""
    import os

    svc = spool_service
    stale_tok = svc.clip_open(interval=8)
    stale_dir = svc._clip(stale_tok)["dir"]
    assert os.path.isdir(stale_dir)
    svc.clips[stale_tok]["ts"] -= svc.CLIP_TTL_S + 1  # age it out
    fresh_tok = svc.clip_open(interval=8)
    assert stale_tok not in svc.clips
    assert not os.path.exists(stale_dir)

    svc.MAX_OPEN_CLIPS = len(svc.clips)  # instance override for the test
    try:
        with pytest.raises(RuntimeError, match="too many open clip"):
            svc.clip_open(interval=8)
    finally:
        del svc.MAX_OPEN_CLIPS
        svc.clip_close(fresh_tok)


def test_microbatcher_coalesces_and_maps_results():
    """_MicroBatcher: concurrent submits coalesce into fewer, larger calls;
    every caller gets ITS result back; errors propagate per request."""
    from rerevst_tpu.serve import _MicroBatcher

    def fn(frames, pad_to=0):
        return [f + 1 for f in frames]

    b = _MicroBatcher(fn, window_s=0.2, max_batch=8)
    frames = [np.full((4, 4, 3), i, np.int32) for i in range(6)]
    outs = [None] * 6
    barrier = threading.Barrier(6)

    def call(i):
        barrier.wait()
        outs[i] = b.submit(frames[i])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(6):
        np.testing.assert_array_equal(outs[i], frames[i] + 1)
    assert sum(b.calls) == 6
    assert max(b.calls) > 1, f"nothing coalesced: {b.calls}"

    def boom(frames, pad_to=0):
        raise RuntimeError("no stats")

    b2 = _MicroBatcher(boom, window_s=0.01)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="no stats"):
        b2.submit(frames[0])


def test_microbatcher_groups_by_shape():
    """Mixed-geometry requests in one window run as separate device calls
    (the pipeline's geometry is a per-clip contract)."""
    from rerevst_tpu.serve import _MicroBatcher

    sizes = []

    def fn(frames, pad_to=0):
        sizes.append({f.shape for f in frames})
        return [f * 2 for f in frames]

    b = _MicroBatcher(fn, window_s=0.2, max_batch=8)
    frames = ([np.ones((4, 4, 3), np.int32)] * 2
              + [np.ones((6, 4, 3), np.int32)] * 2)
    outs = [None] * 4
    barrier = threading.Barrier(4)

    def call(i):
        barrier.wait()
        outs[i] = b.submit(frames[i])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(4):
        np.testing.assert_array_equal(outs[i], frames[i] * 2)
    assert all(len(s) == 1 for s in sizes), f"mixed-shape call: {sizes}"


def test_microbatcher_bucket_respects_batch_max():
    """Power-of-2 bucketing must never pad past the operator's --batch-max
    (the configured device-memory/graph-size bound): 5-6 coalesced requests
    under max_batch=6 run at pad_to=6, not the next power of 2 (8)."""
    from rerevst_tpu.serve import _MicroBatcher

    pads = []

    def fn(frames, pad_to=0):
        pads.append((len(frames), pad_to))
        return [f + 1 for f in frames]

    b = _MicroBatcher(fn, window_s=0.3, max_batch=6)
    frames = [np.full((4, 4, 3), i, np.int32) for i in range(6)]
    outs = [None] * 6
    barrier = threading.Barrier(6)

    def call(i):
        barrier.wait()
        outs[i] = b.submit(frames[i])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(6):
        np.testing.assert_array_equal(outs[i], frames[i] + 1)
    assert all(p <= 6 for _, p in pads), f"bucket exceeded batch-max: {pads}"
    assert sum(n for n, _ in pads) == 6
    assert b.n_frames == 6 and b.n_calls == len(pads)


def test_microbatcher_dead_worker_raises_instead_of_hanging():
    """A submit against a dead worker thread must raise, not wedge the
    handler thread forever."""
    import queue as _queue

    from rerevst_tpu.serve import _MicroBatcher

    b = _MicroBatcher.__new__(_MicroBatcher)
    b.q = _queue.Queue()
    dead = threading.Thread(target=lambda: None)
    dead.start()
    dead.join()
    b._thread = dead
    old = _MicroBatcher.WAIT_POLL_S
    _MicroBatcher.WAIT_POLL_S = 0.05
    try:
        with pytest.raises(RuntimeError, match="worker thread died"):
            b.submit(np.zeros((2, 2, 3), np.uint8))
    finally:
        _MicroBatcher.WAIT_POLL_S = old


def test_batched_stylize_service_matches_unbatched(tmp_path, clip):
    """A micro-batching service returns byte-identical frames to the plain
    per-request path, end to end through the real two-pass session."""
    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import StylizeService

    frames, style = clip
    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    ckpt = str(tmp_path / "m.msgpack")
    save_params(ckpt, params)

    def run(window_ms):
        svc = StylizeService(ckpt, dtype="f32", batch_window_ms=window_ms)
        svc.set_style(style)
        for i, f in enumerate(frames):
            svc.pass1(f, last=i == len(frames) - 1)
        outs = [None] * len(frames)
        barrier = threading.Barrier(len(frames))

        def call(i):
            barrier.wait()
            outs[i] = svc.stylize(frames[i])

        ts = [threading.Thread(target=call, args=(i,))
              for i in range(len(frames))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return svc, outs

    svc_plain, plain = run(0.0)
    assert svc_plain.batcher is None
    svc_b, batched = run(500.0)
    for a, b in zip(plain, batched):
        np.testing.assert_array_equal(a, b)
    assert sum(svc_b.batcher.calls) == len(frames)
    assert max(svc_b.batcher.calls) > 1, svc_b.batcher.calls


def test_boot_warmup_leaves_clean_session_and_identical_results(tmp_path,
                                                                clip):
    """--warmup pays the compiles at boot on the REAL serving session, then
    resets it: healthz reports no style, and a subsequent clip is
    byte-identical to a never-warmed service (round-5 cold-start fix)."""
    import jax

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.checkpoint import save_params
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.serve import StylizeService

    frames, style = clip
    params = init_transformer_params(jax.random.PRNGKey(0), ModelConfig(),
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    ckpt = str(tmp_path / "m.msgpack")
    save_params(ckpt, params)

    def run(warm):
        svc = StylizeService(ckpt, dtype="f32")
        if warm:
            secs = svc.warmup(frames[0].shape[:2])
            assert secs > 0
            hz = svc.healthz()
            assert not hz["has_style"] and not hz["has_stats"]
        svc.set_style(style)
        for i, f in enumerate(frames):
            svc.pass1(f, last=i == len(frames) - 1)
        return svc.stylize(frames[0])

    np.testing.assert_array_equal(run(warm=True), run(warm=False))
