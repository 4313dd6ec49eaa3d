"""HTTP serving daemon (deepsee_tpu/server.py).

End-to-end over a real exported artifact on CPU: concurrent requests are
micro-batched into the artifact's fixed trace batch, padded, and sliced
back — each response must equal a direct single-request computation of
the SAME program (this also locks the per-sample-independence assumption
padding relies on: eval-mode norms + no_noise).
"""

import base64
import concurrent.futures
import dataclasses
import io
import json
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from deepsee_tpu.config import tiny_test_experiment
from deepsee_tpu.serve import export_serving, load_serving, save_serving
from deepsee_tpu.server import (MicroBatcher, ServingServer,
                                decode_image_b64, decode_label_b64,
                                encode_image_b64)
from deepsee_tpu.system import SRSystem


def _png_b64(arr_u8: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _request_payload(cfg, seed: int, guided: bool = False) -> dict:
    rng = np.random.RandomState(seed)
    body = {
        "image_lr": _png_b64(rng.randint(
            0, 256, (cfg.start_size, cfg.start_size, 3), dtype=np.uint8)),
        "label": _png_b64(rng.randint(
            0, cfg.label_nc, (cfg.crop_size, cfg.crop_size),
            dtype=np.uint8)),
    }
    if guided:
        body["guiding_image"] = _png_b64(rng.randint(
            0, 256, (cfg.crop_size, cfg.crop_size, 3), dtype=np.uint8))
        body["guiding_label"] = _png_b64(rng.randint(
            0, cfg.label_nc, (cfg.crop_size, cfg.crop_size),
            dtype=np.uint8))
    return body


def _post(port: int, path: str, body: dict, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port: int, path: str, timeout=30):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    exp = tiny_test_experiment(is_train=False)
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("artifact")
    blobs = export_serving(exp, variables, batch_size=2, platforms=("cpu",))
    save_serving(str(d), exp, blobs, batch_size=2, platforms=("cpu",))
    return str(d), exp


@pytest.fixture(scope="module")
def server(artifact):
    d, _ = artifact
    srv = ServingServer(d, port=0, batch_window_ms=30.0)
    srv.start()
    yield srv
    srv.stop()


def _expected_end_to_end(artifact_dir, exp, body):
    """Direct single-request computation through the raw program."""
    cfg = exp.model
    fn = load_serving(artifact_dir, "end_to_end")
    lr = decode_image_b64(body["image_lr"], cfg.start_size)
    lab = decode_label_b64(body["label"], cfg.crop_size, cfg.label_nc)
    # pad to the trace batch by repetition, slice row 0
    fake, style = fn(np.concatenate([lr, lr]), np.concatenate([lab, lab]))
    return np.asarray(fake)[0], np.asarray(style)[0]


def test_concurrent_requests_batched(server, artifact):
    d, exp = artifact
    cfg = exp.model
    bodies = [_request_payload(cfg, seed) for seed in range(3)]

    with concurrent.futures.ThreadPoolExecutor(3) as pool:
        results = list(pool.map(
            lambda b: _post(server.port, "/v1/super_resolve", b), bodies))

    for body, (status, resp) in zip(bodies, results):
        assert status == 200, resp
        img = decode_image_b64(resp["image"], cfg.crop_size)[0]
        want_fake, want_style = _expected_end_to_end(d, exp, body)
        # response image is PNG u8-quantized via tensor2im; compare there
        from deepsee_tpu.utils.images import tensor2im
        np.testing.assert_array_equal(tensor2im(img), tensor2im(want_fake))
        np.testing.assert_allclose(np.asarray(resp["style"], np.float32),
                                   want_style, rtol=1e-5, atol=1e-6)

    status, health = _get(server.port, "/healthz")
    assert status == 200 and health["status"] == "ok"
    assert health["stats"]["requests"] >= 3
    # 3 requests into trace batch 2 -> at least one coalesced batch
    assert health["stats"]["batches"] < health["stats"]["requests"]


def test_styled_path(server, artifact):
    d, exp = artifact
    cfg = exp.model
    body = _request_payload(cfg, seed=7)
    rng = np.random.RandomState(7)
    style = rng.randn(cfg.label_nc, cfg.regional_style_size).astype(
        np.float32) * 0.1
    body["style"] = style.tolist()

    status, resp = _post(server.port, "/v1/super_resolve", body)
    assert status == 200, resp
    assert "style" not in resp  # styled path renders, doesn't encode

    fn = load_serving(d, "styled")
    lr = decode_image_b64(body["image_lr"], cfg.start_size)
    lab = decode_label_b64(body["label"], cfg.crop_size, cfg.label_nc)
    sty = style[None]
    fake = np.asarray(fn(np.concatenate([lr, lr]),
                         np.concatenate([lab, lab]),
                         np.concatenate([sty, sty])))[0]
    from deepsee_tpu.utils.images import tensor2im
    got = decode_image_b64(resp["image"], cfg.crop_size)[0]
    np.testing.assert_array_equal(tensor2im(got), tensor2im(fake))


def test_bad_requests(server, artifact):
    _, exp = artifact
    cfg = exp.model
    status, resp = _post(server.port, "/v1/super_resolve", {})
    assert status == 400 and "image_lr" in resp["error"]

    body = _request_payload(cfg, seed=1)
    body["style"] = [[0.0]]  # wrong shape
    status, resp = _post(server.port, "/v1/super_resolve", body)
    assert status == 400 and "style shape" in resp["error"]

    body = _request_payload(cfg, seed=1)
    body["image_lr"] = "not base64 png!!"
    status, resp = _post(server.port, "/v1/super_resolve", body)
    assert status == 400

    status, resp = _get(server.port, "/manifest")
    assert status == 200 and resp["batch_size"] == 2


def test_microbatcher_pads_and_slices():
    """Unit-level: a fn with visible batch structure proves pad+slice."""
    calls = []

    def fn(x):
        calls.append(np.asarray(x).shape)
        return np.asarray(x) * 2.0

    mb = MicroBatcher({"p": (fn, 4)}, batch_window_ms=50.0)
    try:
        futs = [mb.submit("p", (np.full((1, 3), i, np.float32),))
                for i in range(3)]
        outs = [f.result(timeout=10) for f in futs]
        for i, out in enumerate(outs):
            np.testing.assert_allclose(out[0], np.full((3,), 2.0 * i))
        assert all(s == (4, 3) for s in calls)  # padded to the trace batch
    finally:
        mb.close()


def test_microbatcher_error_propagates():
    def fn(x):
        raise RuntimeError("boom")

    mb = MicroBatcher({"p": (fn, 2)}, batch_window_ms=1.0)
    try:
        fut = mb.submit("p", (np.zeros((1, 2), np.float32),))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
        assert mb.stats["errors"] == 1
    finally:
        mb.close()


def test_image_codec_roundtrip():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    b64 = _png_b64(u8)
    dec = decode_image_b64(b64, 16)[0]
    # decode -> tensor2im re-encode is lossy by at most 1 u8 step
    # (tensor2im truncates, matching util/util.py:72-103)
    from deepsee_tpu.utils.images import tensor2im
    assert np.abs(tensor2im(dec).astype(int) - u8.astype(int)).max() <= 1
    assert encode_image_b64(dec) is not None
    # label 255 maps to label_nc
    lab = np.full((16, 16), 255, np.uint8)
    dec_lab = decode_label_b64(_png_b64(lab), 16, 19)[0]
    assert (dec_lab == 19).all()


def test_guided_parse_requires_guiding_fields(artifact):
    """Guided manifests demand guiding_image/guiding_label; the styled
    path must keep working without them (no second artifact export
    needed — only the parser is guided-aware)."""
    d, exp = artifact
    srv = ServingServer.__new__(ServingServer)  # parser-only instance
    srv.manifest = dict(json.load(open(d + "/manifest.json")),
                        guiding_style_image=True)
    srv.manifests = {"m": srv.manifest}
    srv.default_model = "m"
    cfg = exp.model

    body = _request_payload(cfg, seed=3)
    import pytest as _pytest
    from deepsee_tpu.server import BadRequest
    with _pytest.raises(BadRequest, match="guiding"):
        srv._parse_request(body)

    body = _request_payload(cfg, seed=3, guided=True)
    program, args = srv._parse_request(body)
    assert program == "m/end_to_end" and len(args) == 4
    assert args[2].shape == (1, cfg.crop_size, cfg.crop_size, 3)

    # style present routes to styled regardless of guidance
    body["style"] = np.zeros(
        (cfg.label_nc, cfg.regional_style_size), np.float32).tolist()
    program, args = srv._parse_request(body)
    assert program == "m/styled" and len(args) == 3


def test_stop_before_start_does_not_hang(artifact):
    """socketserver.shutdown() waits on an event only serve_forever sets;
    stop() must be safe on a constructed-but-never-started server."""
    d, _ = artifact
    srv = ServingServer(d, port=0)
    t0 = __import__("time").monotonic()
    srv.stop()
    assert __import__("time").monotonic() - t0 < 10


def test_submit_after_close_raises():
    mb = MicroBatcher({"p": (lambda x: x, 2)}, batch_window_ms=1.0)
    mb.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        mb.submit("p", (np.zeros((1, 1), np.float32),))


def test_microbatcher_stress_mixed_programs():
    """50 requests, 8 client threads, two programs with different trace
    batches and artificial jitter: every future must resolve with exactly
    its own input transformed, batches never exceed their cap, and
    nothing deadlocks."""
    import threading
    import time as _time

    seen = {"a": [], "b": []}
    lock = threading.Lock()

    def make_fn(name, factor):
        def fn(x):
            _time.sleep(0.002)  # device-call jitter
            with lock:
                seen[name].append(np.asarray(x).shape[0])
            return np.asarray(x) * factor
        return fn

    mb = MicroBatcher({"a": (make_fn("a", 2.0), 3),
                       "b": (make_fn("b", -1.0), 5)},
                      batch_window_ms=4.0)
    try:
        futs = []
        def client(base):
            for i in range(base, base + 25):
                prog = "a" if i % 3 else "b"
                futs.append((prog, i, mb.submit(
                    prog, (np.full((1, 4), float(i), np.float32),))))
                _time.sleep(0.0005 * (i % 4))

        threads = [threading.Thread(target=client, args=(k * 25,))
                   for k in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for prog, i, f in futs:
            out = f.result(timeout=30)[0]
            want = i * (2.0 if prog == "a" else -1.0)
            np.testing.assert_allclose(out, np.full((4,), want))
        assert all(s == 3 for s in seen["a"])  # padded to each cap
        assert all(s == 5 for s in seen["b"])
        assert mb.stats["errors"] == 0
        assert mb.stats["requests"] == 50
    finally:
        mb.close()


def test_microbatcher_shutdown_under_load():
    """close() during a submit storm: every accepted request either
    resolves or fails with the shutdown error — none hang."""
    import threading

    def fn(x):
        return np.asarray(x)

    mb = MicroBatcher({"p": (fn, 4)}, batch_window_ms=2.0)
    futs, rejected = [], []

    def client():
        for i in range(30):
            try:
                futs.append(mb.submit(
                    "p", (np.full((1, 2), float(i), np.float32),)))
            except RuntimeError:
                rejected.append(i)

    t = threading.Thread(target=client)
    t.start()
    mb.close()
    t.join()

    for f in futs:
        try:
            f.result(timeout=10)  # resolved value or shutdown error ok
        except RuntimeError as e:
            assert "shut down" in str(e)
    assert len(futs) + len(rejected) == 30


def test_guided_artifact_end_to_end(tmp_path):
    """The 4-arg guided program through the daemon's full HTTP + batching
    path (the parse-level test above covers routing only)."""
    import dataclasses as _dc

    exp = tiny_test_experiment(is_train=False)
    exp = exp.replace(model=_dc.replace(
        exp.model, net_e="fullstyle", guiding_style_image=True))
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(1))
    blobs = export_serving(exp, variables, batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path), exp, blobs, batch_size=2,
                 platforms=("cpu",))

    srv = ServingServer(str(tmp_path), port=0, batch_window_ms=20.0)
    srv.start()
    try:
        cfg = exp.model
        bodies = [_request_payload(cfg, seed, guided=True)
                  for seed in (11, 12)]
        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            results = list(pool.map(
                lambda b: _post(srv.port, "/v1/super_resolve", b), bodies))

        fn = load_serving(str(tmp_path), "end_to_end")
        from deepsee_tpu.utils.images import tensor2im
        for body, (status, resp) in zip(bodies, results):
            assert status == 200, resp
            lr = decode_image_b64(body["image_lr"], cfg.start_size)
            lab = decode_label_b64(body["label"], cfg.crop_size,
                                   cfg.label_nc)
            gi = decode_image_b64(body["guiding_image"], cfg.crop_size)
            gl = decode_label_b64(body["guiding_label"], cfg.crop_size,
                                  cfg.label_nc)
            fake, style = fn(np.concatenate([lr, lr]),
                             np.concatenate([lab, lab]),
                             np.concatenate([gi, gi]),
                             np.concatenate([gl, gl]))
            got = decode_image_b64(resp["image"], cfg.crop_size)[0]
            np.testing.assert_array_equal(
                tensor2im(got), tensor2im(np.asarray(fake)[0]))
            np.testing.assert_allclose(
                np.asarray(resp["style"], np.float32),
                np.asarray(style)[0], rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()


def test_raw_encoding_matches_png(server, artifact):
    """`"encoding": "raw"` (b64 uint8 bytes, no PNG codec) must produce
    the identical result to the PNG wire format for the same pixels —
    both quantize through tensor2im and scale u8 -> [-1,1] the same way.
    Malformed raw payloads and unknown encodings are 400s."""
    d, exp = artifact
    cfg = exp.model
    rng = np.random.RandomState(31)
    lr_u8 = rng.randint(0, 256, (cfg.start_size, cfg.start_size, 3),
                        dtype=np.uint8)
    lab_u8 = rng.randint(0, cfg.label_nc,
                         (cfg.crop_size, cfg.crop_size), dtype=np.uint8)

    png_body = {"image_lr": _png_b64(lr_u8), "label": _png_b64(lab_u8)}
    raw_body = {
        "encoding": "raw",
        "image_lr": base64.b64encode(lr_u8.tobytes()).decode("ascii"),
        "label": base64.b64encode(lab_u8.tobytes()).decode("ascii"),
    }
    status, png_resp = _post(server.port, "/v1/super_resolve", png_body)
    assert status == 200, png_resp
    status, raw_resp = _post(server.port, "/v1/super_resolve", raw_body)
    assert status == 200, raw_resp

    # raw response: b64 of crop*crop*3 uint8 bytes, equal to the PNG
    # response's decoded pixels
    raw_img = np.frombuffer(base64.b64decode(raw_resp["image"]),
                            np.uint8)
    assert raw_img.size == cfg.crop_size * cfg.crop_size * 3
    raw_img = raw_img.reshape(cfg.crop_size, cfg.crop_size, 3)
    png_img = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(png_resp["image"]))))
    np.testing.assert_array_equal(raw_img, png_img)
    np.testing.assert_allclose(
        np.asarray(raw_resp["style"], np.float32),
        np.asarray(png_resp["style"], np.float32), rtol=1e-6)

    status, resp = _post(server.port, "/v1/super_resolve",
                         dict(raw_body, encoding="jpeg2000"))
    assert status == 400 and "unknown encoding" in resp["error"]
    bad = dict(raw_body,
               image_lr=base64.b64encode(b"\x00" * 7).decode("ascii"))
    status, resp = _post(server.port, "/v1/super_resolve", bad)
    assert status == 400 and "undecodable input" in resp["error"]


def test_multi_artifact_daemon(artifact, tmp_path):
    """One daemon, two artifacts (different weights): requests route by
    the "model" field, each (alias, program) micro-batches independently,
    /v1/models lists both manifests, /healthz reports per-program stats,
    and an unknown alias is a 400."""
    d, exp = artifact
    cfg = exp.model

    # second artifact: same architecture, different init -> different output
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(2))
    blobs = export_serving(exp, variables, batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path), exp, blobs, batch_size=2, platforms=("cpu",))

    srv = ServingServer([f"main={d}", f"alt={tmp_path}"], port=0,
                        batch_window_ms=5.0)
    srv.start()
    try:
        status, models = _get(srv.port, "/v1/models")
        assert status == 200 and sorted(models) == ["alt", "main"]
        assert models["main"]["batch_size"] == 2

        body = _request_payload(cfg, seed=21)
        status, default_resp = _post(srv.port, "/v1/super_resolve", body)
        assert status == 200, default_resp
        status, main_resp = _post(srv.port, "/v1/super_resolve",
                                  dict(body, model="main"))
        assert status == 200, main_resp
        status, alt_resp = _post(srv.port, "/v1/super_resolve",
                                 dict(body, model="alt"))
        assert status == 200, alt_resp

        # default routes to the first artifact; alt weights really differ
        assert default_resp["image"] == main_resp["image"]
        assert alt_resp["image"] != main_resp["image"]

        # each model's response equals its own direct program output
        from deepsee_tpu.utils.images import tensor2im
        for adir, resp in ((d, main_resp), (str(tmp_path), alt_resp)):
            want_fake, want_style = _expected_end_to_end(adir, exp, body)
            got = decode_image_b64(resp["image"], cfg.crop_size)[0]
            np.testing.assert_array_equal(tensor2im(got),
                                          tensor2im(want_fake))
            np.testing.assert_allclose(
                np.asarray(resp["style"], np.float32), want_style,
                rtol=1e-5, atol=1e-6)

        status, resp = _post(srv.port, "/v1/super_resolve",
                             dict(body, model="nope"))
        assert status == 400 and "unknown model" in resp["error"]

        status, health = _get(srv.port, "/healthz")
        assert status == 200
        progs = health["programs"]
        assert progs["main/end_to_end"]["requests"] == 2
        assert progs["alt/end_to_end"]["requests"] == 1
        assert progs["alt/styled"]["requests"] == 0
        assert health["models"] == ["alt", "main"]
    finally:
        srv.stop()


def _post_bin(port: int, raw: bytes, headers=None, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/super_resolve_bin", data=raw,
        headers={"Content-Type": "application/octet-stream",
                 **(headers or {})})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_binary_protocol_matches_json(server, artifact):
    """/v1/super_resolve_bin (no JSON, no base64) must reproduce the JSON
    path exactly: same quantized image, same style matrix; the styled
    route via X-DS-Style supersedes guidance like the JSON path; a wrong
    body length is a 400 naming the expected layout."""
    d, exp = artifact
    cfg = exp.model
    rng = np.random.RandomState(47)
    lr_u8 = rng.randint(0, 256, (cfg.start_size, cfg.start_size, 3),
                        dtype=np.uint8)
    lab_u8 = rng.randint(0, cfg.label_nc,
                         (cfg.crop_size, cfg.crop_size), dtype=np.uint8)

    json_body = {"image_lr": _png_b64(lr_u8), "label": _png_b64(lab_u8)}
    status, json_resp = _post(server.port, "/v1/super_resolve", json_body)
    assert status == 200, json_resp

    status, blob, hdrs = _post_bin(
        server.port, lr_u8.tobytes() + lab_u8.tobytes())
    assert status == 200, blob[:300]
    assert hdrs["Content-Type"] == "application/octet-stream"
    style_n = int(hdrs["X-DS-Style-Bytes"])
    img_n = cfg.crop_size * cfg.crop_size * 3
    assert len(blob) == img_n + style_n
    bin_img = np.frombuffer(blob[:img_n], np.uint8).reshape(
        cfg.crop_size, cfg.crop_size, 3)
    bin_style = np.frombuffer(blob[img_n:], "<f4").reshape(
        cfg.label_nc, cfg.regional_style_size)

    json_img = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(json_resp["image"]))))
    np.testing.assert_array_equal(bin_img, json_img)
    np.testing.assert_allclose(
        bin_style, np.asarray(json_resp["style"], np.float32),
        rtol=1e-6, atol=0)

    # styled route: trailing f32-LE style + X-DS-Style: 1; response has
    # no style tail and equals the JSON styled path
    style = (rng.randn(cfg.label_nc, cfg.regional_style_size)
             .astype("<f4") * 0.1)
    status, blob, hdrs = _post_bin(
        server.port,
        lr_u8.tobytes() + lab_u8.tobytes() + style.tobytes(),
        headers={"X-DS-Style": "1"})
    assert status == 200, blob[:300]
    assert int(hdrs["X-DS-Style-Bytes"]) == 0 and len(blob) == img_n
    status, json_styled = _post(
        server.port, "/v1/super_resolve",
        dict(json_body, style=style.astype(np.float32).tolist()))
    assert status == 200, json_styled
    json_styled_img = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(json_styled["image"]))))
    np.testing.assert_array_equal(
        np.frombuffer(blob, np.uint8).reshape(
            cfg.crop_size, cfg.crop_size, 3), json_styled_img)

    # wrong length -> 400 that names the expected layout
    status, blob, _ = _post_bin(server.port, b"\x00" * 7)
    assert status == 400
    err = json.loads(blob)["error"]
    assert "binary body is 7 bytes" in err and "image_lr" in err

    # unknown model alias -> 400
    status, blob, _ = _post_bin(
        server.port, lr_u8.tobytes() + lab_u8.tobytes(),
        headers={"X-DS-Model": "nope"})
    assert status == 400 and "unknown model" in json.loads(blob)["error"]


def test_binary_protocol_guided_layout(tmp_path):
    """Guided models read guiding_image + guiding_label from the binary
    body (and the 400 for a short body names the guiding fields)."""
    exp = tiny_test_experiment(is_train=False)
    exp = exp.replace(model=dataclasses.replace(
        exp.model, guiding_style_image=True))
    system = SRSystem(exp)
    variables = system.init(jax.random.PRNGKey(0))
    blobs = export_serving(exp, variables, batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path), exp, blobs, batch_size=2,
                 platforms=("cpu",))
    cfg = exp.model

    srv = ServingServer(str(tmp_path), port=0, batch_window_ms=5.0)
    srv.start()
    try:
        rng = np.random.RandomState(3)
        lr_u8 = rng.randint(0, 256, (cfg.start_size, cfg.start_size, 3),
                            dtype=np.uint8)
        lab_u8 = rng.randint(0, cfg.label_nc,
                             (cfg.crop_size, cfg.crop_size), dtype=np.uint8)
        g_img_u8 = rng.randint(0, 256, (cfg.crop_size, cfg.crop_size, 3),
                               dtype=np.uint8)

        status, blob, hdrs = _post_bin(
            srv.port, lr_u8.tobytes() + lab_u8.tobytes()
            + g_img_u8.tobytes() + lab_u8.tobytes())
        assert status == 200, blob[:300]
        img_n = cfg.crop_size * cfg.crop_size * 3
        assert len(blob) == img_n + int(hdrs["X-DS-Style-Bytes"])

        # equals the JSON guided path on the same pixels
        body = {"image_lr": _png_b64(lr_u8), "label": _png_b64(lab_u8),
                "guiding_image": _png_b64(g_img_u8),
                "guiding_label": _png_b64(lab_u8)}
        status, json_resp = _post(srv.port, "/v1/super_resolve", body)
        assert status == 200, json_resp
        json_img = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(json_resp["image"]))))
        np.testing.assert_array_equal(
            np.frombuffer(blob[:img_n], np.uint8).reshape(
                cfg.crop_size, cfg.crop_size, 3), json_img)

        status, blob, _ = _post_bin(
            srv.port, lr_u8.tobytes() + lab_u8.tobytes())
        assert status == 400
        assert "guiding_image" in json.loads(blob)["error"]
    finally:
        srv.stop()
