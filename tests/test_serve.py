"""Serving layer: bucket bundles (export) + the micro-batching front end."""

import io
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.serve import BatchingExtractor


def _row_id_extract(images):
    """Fake extractor whose output identifies each input row — any
    misrouted row through coalescing/padding/slicing shows up exactly."""
    flat = np.asarray(images).reshape(images.shape[0], -1)
    return np.stack([flat[:, 0], flat[:, 1]], axis=1)[:, None, :]  # (n,1,2)


def test_batching_extractor_routes_rows_exactly():
    calls = []

    def extract(images):
        calls.append(images.shape[0])
        assert images.shape[0] <= 4, "batch exceeded max_batch"
        return _row_id_extract(images)

    srv = BatchingExtractor(extract, max_batch=4, max_delay_ms=20)
    rs = np.random.RandomState(0)
    reqs = [rs.rand(n, 1, 2, 2).astype(np.float32)
            for n in (1, 3, 2, 1, 4, 2)]
    futs = [srv.submit(r) for r in reqs]
    for req, fut in zip(reqs, futs):
        got = fut.result(timeout=10)
        np.testing.assert_array_equal(got, _row_id_extract(req))
        assert got.shape == (req.shape[0], 1, 2)
    srv.close()
    assert sum(calls) == sum(r.shape[0] for r in reqs)


def test_batching_extractor_concurrent_threads():
    srv = BatchingExtractor(_row_id_extract, max_batch=8, max_delay_ms=10)
    rs = np.random.RandomState(1)
    reqs = [rs.rand(1 + i % 3, 1, 2, 2).astype(np.float32)
            for i in range(20)]
    results = [None] * len(reqs)

    def worker(i):
        results[i] = srv.extract(reqs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    srv.close()
    for req, got in zip(reqs, results):
        np.testing.assert_array_equal(got, _row_id_extract(req))


def test_batching_extractor_rejects_oversize_and_closed():
    srv = BatchingExtractor(_row_id_extract, max_batch=2, max_delay_ms=1)
    with pytest.raises(ValueError, match="outside"):
        srv.submit(np.zeros((3, 1, 2, 2), np.float32)).result()
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(np.zeros((1, 1, 2, 2), np.float32)).result()


def test_batching_extractor_rejects_wrong_item_shape():
    srv = BatchingExtractor(_row_id_extract, max_batch=4, max_delay_ms=1,
                            item_shape=(1, 2, 2))
    with pytest.raises(ValueError, match="item shape"):
        srv.submit(np.zeros((1, 1, 4, 4), np.float32)).result()
    # conforming request still succeeds
    ok = srv.extract(np.ones((1, 1, 2, 2), np.float32))
    assert ok.shape == (1, 1, 2)
    srv.close()


def test_batching_extractor_pins_item_shape_from_first_request():
    """Without an explicit item_shape the first request pins it, so a
    later mismatched request fails ALONE instead of poisoning the batch
    concatenate for its co-travelers."""
    srv = BatchingExtractor(_row_id_extract, max_batch=8, max_delay_ms=20)
    ok_req = np.ones((1, 1, 2, 2), np.float32)
    first = srv.submit(ok_req)
    bad = srv.submit(np.zeros((1, 1, 4, 4), np.float32))   # mismatched
    second = srv.submit(np.full((2, 1, 2, 2), 0.5, np.float32))
    np.testing.assert_array_equal(first.result(timeout=10),
                                  _row_id_extract(ok_req))
    with pytest.raises(ValueError, match="item shape"):
        bad.result(timeout=10)
    assert second.result(timeout=10).shape == (2, 1, 2)
    srv.close()


def test_batching_extractor_rejects_scalar_and_1d():
    srv = BatchingExtractor(_row_id_extract, max_batch=4, max_delay_ms=1)
    with pytest.raises(ValueError, match="outside"):
        srv.submit(np.zeros((), np.float32)).result(timeout=10)  # 0-d
    with pytest.raises(ValueError, match="outside"):
        srv.submit(np.zeros((3,), np.float32)).result(timeout=10)
    srv.close()


def test_batching_extractor_cancelled_future_does_not_poison_batch():
    """A caller cancelling its pending future must not strand the other
    requests coalesced into the same device batch."""
    release = threading.Event()

    def gated(images):
        release.wait(timeout=10)
        return _row_id_extract(images)

    srv = BatchingExtractor(gated, max_batch=4, max_delay_ms=20)
    # a full batch flushes immediately; the worker blocks inside `gated`
    # while victim + survivor queue up behind it, still PENDING
    blocker = srv.submit(np.zeros((4, 1, 2, 2), np.float32))
    victim = srv.submit(np.zeros((1, 1, 2, 2), np.float32))
    survivor_req = np.full((2, 1, 2, 2), 0.5, np.float32)
    survivor = srv.submit(survivor_req)
    assert victim.cancel()               # still queued ⇒ cancellable
    release.set()
    blocker.result(timeout=10)
    got = survivor.result(timeout=10)    # must NOT hang or raise
    np.testing.assert_array_equal(got, _row_id_extract(survivor_req))
    assert victim.cancelled()
    srv.close()


def test_batching_extractor_fans_out_failures():
    def broken(images):
        raise RuntimeError("device on fire")

    srv = BatchingExtractor(broken, max_batch=4, max_delay_ms=1)
    futs = [srv.submit(np.zeros((1, 1, 2, 2), np.float32))
            for _ in range(3)]
    for f in futs:
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=10)
    srv.close()


def _tiny_cfg():
    from keypoints_tpu.configs import get_config
    return get_config("pong64").override(**{
        "model.encoder_filters": (4, 8), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (8, 4),
        "model.decoder_upsample": (True, True), "model.groups": 2,
        "model.num_keypoints": 3, "data.image_size": 16,
        "train.compute_dtype": "float32"})


@pytest.fixture(scope="module")
def bundle():
    """A (1, 4)-bucket bundle of a tiny extractor + the direct oracle."""
    from keypoints_tpu.export import export_extract_bundle
    from keypoints_tpu.training import build_model, init_state, \
        make_extract_fn

    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    data = export_extract_bundle(cfg, state.params, batches=(1, 4))
    direct = jax.jit(make_extract_fn(cfg, model))
    return data, (lambda imgs: direct(state.params, imgs))


def test_bundle_pads_to_covering_bucket(bundle):
    from keypoints_tpu.export import load_extract
    data, direct = bundle
    ext = load_extract(data)
    assert ext.max_batch == 4
    rs = np.random.RandomState(2)
    for n in (1, 2, 3, 4):     # 2, 3 pad up to the b4 bucket
        imgs = jnp.asarray(rs.rand(n, 1, 16, 16), jnp.float32)
        got = np.asarray(ext(imgs))
        assert got.shape[0] == n
        np.testing.assert_allclose(got, np.asarray(direct(imgs)),
                                   rtol=0, atol=1e-6)
    # n > largest bucket: split into max-bucket chunks, exact
    imgs9 = jnp.asarray(rs.rand(9, 1, 16, 16), jnp.float32)
    got9 = np.asarray(ext(imgs9))
    assert got9.shape[0] == 9
    np.testing.assert_allclose(got9, np.asarray(direct(imgs9)),
                               rtol=0, atol=1e-6)
    got_np = np.asarray(ext(np.asarray(imgs9)))   # host-array input path
    np.testing.assert_allclose(got_np, got9, rtol=0, atol=1e-6)


def test_bundle_roundtrips_through_file_and_detection(bundle, tmp_path):
    """load_extract must auto-detect bundle vs single artifact from bytes."""
    from keypoints_tpu.export import BucketedExtract, load_extract
    data, _ = bundle
    path = tmp_path / "extract.shlo"
    path.write_bytes(data)
    ext = load_extract(str(path))
    assert isinstance(ext, BucketedExtract)
    assert ext.meta["num_keypoints"] == 3
    assert ext.meta["batches"] == [1, 4]


def test_single_artifact_loads_as_one_bucket_bundle():
    """export_extract (no zip) must load as a BucketedExtract with meta
    recovered from the program's avals, serving any n ≤ its batch."""
    from keypoints_tpu.export import (BucketedExtract, export_extract,
                                      load_extract)
    from keypoints_tpu.training import build_model, init_state, \
        make_extract_fn

    cfg = _tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    data = export_extract(cfg, state.params, batch=4)
    ext = load_extract(data)
    assert isinstance(ext, BucketedExtract)
    assert ext.meta["batches"] == [4]
    assert ext.meta["image_size"] == 16
    assert ext.meta["channels"] == 1
    assert ext.meta["num_keypoints"] == 3

    direct = jax.jit(make_extract_fn(cfg, build_model(cfg)))
    imgs = jnp.asarray(np.random.RandomState(4).rand(2, 1, 16, 16),
                       jnp.float32)
    np.testing.assert_allclose(          # n=2 pads up to the b4 program
        np.asarray(ext(imgs)), np.asarray(direct(state.params, imgs)),
        rtol=0, atol=1e-6)


def test_xla_only_forces_jnp_dispatch(monkeypatch):
    """Inside kernels.xla_only() the dispatchers must take the pure-jnp
    paths even when the backend claims TPU — the escape multi-platform
    export relies on (a Mosaic pallas_call cannot lower for CPU)."""
    from keypoints_tpu import kernels
    from keypoints_tpu.ops.spatial_softmax import spatial_softmax as oracle

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    hm = jnp.asarray(np.random.RandomState(7).randn(2, 3, 8, 8), jnp.float32)
    with kernels.xla_only():
        assert not kernels._on_tpu()
        # would die on CPU if routed to the Mosaic kernel
        got = kernels.spatial_softmax(hm, variant="joint")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(oracle(hm, variant="joint")),
                               atol=1e-6)
    assert kernels._on_tpu()             # context restored


def test_multiplatform_export_runs_on_cpu(tmp_path):
    """--platforms tpu cpu must yield an artifact that loads and runs on
    the CPU backend (regression: the B=1 marginal Pallas routing would
    bake a TPU-only Mosaic call into the 'portable' artifact)."""
    from keypoints_tpu.export import export_extract, load_extract
    from keypoints_tpu.training import build_model, init_state, \
        make_extract_fn

    cfg = _tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    data = export_extract(cfg, state.params, batch=1,
                          platforms=("tpu", "cpu"))
    ext = load_extract(data)
    imgs = jnp.asarray(np.random.RandomState(5).rand(1, 1, 16, 16),
                       jnp.float32)
    direct = jax.jit(make_extract_fn(cfg, build_model(cfg)))
    np.testing.assert_allclose(np.asarray(ext(imgs)),
                               np.asarray(direct(state.params, imgs)),
                               rtol=0, atol=1e-6)


def test_http_server_end_to_end(bundle, tmp_path):
    """The shipped HTTP example: POST .npy in, .npy of keypoints out."""
    import socket
    import urllib.request

    from keypoints_tpu import serve

    data, direct = bundle
    art = tmp_path / "bundle.shlo"
    art.write_bytes(data)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    t = threading.Thread(
        target=serve._cli,
        args=([f"--artifact={art}", f"--port={port}",
               "--max-delay-ms=1"],),
        daemon=True)
    t.start()

    imgs = np.random.RandomState(3).rand(3, 1, 16, 16).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    req = urllib.request.Request(f"http://localhost:{port}/extract",
                                 data=buf.getvalue(), method="POST")
    last = None
    for _ in range(50):                  # poll until the server is up
        try:
            with urllib.request.urlopen(req, timeout=5) as resp:
                body = resp.read()
            break
        except OSError as e:
            last = e
            import time
            time.sleep(0.2)
    else:
        raise AssertionError(f"server never came up: {last}")
    kp = np.load(io.BytesIO(body))
    np.testing.assert_allclose(kp, np.asarray(direct(jnp.asarray(imgs))),
                               rtol=0, atol=1e-6)
    # health endpoint serves the bundle metadata
    with urllib.request.urlopen(
            f"http://localhost:{port}/", timeout=5) as resp:
        import json
        meta = json.loads(resp.read())
    assert meta["batches"] == [1, 4]

    # the stdlib client helpers against the live server: meta, an in-bucket
    # request, an oversized request (client-side split: 9 > max bucket 4),
    # and a malformed one (HTTP 400 → ValueError)
    url = f"http://localhost:{port}"
    assert serve.http_meta(url)["batches"] == [1, 4]
    kp2 = serve.http_extract(url, imgs)
    np.testing.assert_allclose(kp2, kp, rtol=0, atol=0)
    big = np.random.RandomState(4).rand(9, 1, 16, 16).astype(np.float32)
    meta_calls = {"n": 0}
    orig_meta = serve.http_meta

    def counting_meta(u, timeout=10.0):
        meta_calls["n"] += 1
        return orig_meta(u, timeout=timeout)
    serve.http_meta, _saved = counting_meta, serve.http_meta
    serve._META_CACHE.clear()
    try:
        kp_big = serve.http_extract(url, big)
        np.testing.assert_allclose(
            kp_big, np.asarray(direct(jnp.asarray(big))), rtol=0, atol=1e-6)
        # the split (9 rows over max bucket 4 = 3 chunks) fetches meta ONCE
        assert meta_calls["n"] == 1
        serve.http_extract(url, big)
        assert meta_calls["n"] == 1      # second call hits the per-URL cache
        serve._META_CACHE.clear()
        one = serve.http_extract(url, imgs[:1])
        np.testing.assert_allclose(one, kp[:1], rtol=0, atol=0)
        assert meta_calls["n"] == 1      # single row never needs /meta
    finally:
        serve.http_meta = _saved
    with pytest.raises(ValueError, match="rejected"):
        serve.http_extract(url, np.zeros((2, 1, 8, 8), np.float32))


def test_http_client_connection_failure_is_runtime_error():
    """The documented retryable contract covers connection-level faults:
    refused/reset/timeout raise RuntimeError, not raw URLError (a caller
    following `except RuntimeError: retry` must not crash on the most
    common retryable failure)."""
    from keypoints_tpu import serve
    url = "http://localhost:1"            # nothing listens on port 1
    with pytest.raises(RuntimeError, match="metadata fetch failed"):
        serve.http_meta(url, timeout=2.0)
    with pytest.raises(RuntimeError, match="extraction failed"):
        serve.http_extract(url, np.zeros((1, 1, 8, 8), np.float32),
                           timeout=2.0)


def test_export_cli_smoke(tmp_path, capsys):
    """keypoints-export end-to-end: random-init params -> artifact -> reload."""
    from keypoints_tpu.export import _cli

    out = str(tmp_path / "e.shlo")
    _cli(["--preset", "pong64", "--batch", "2", "--out", out, "--override",
          "model.encoder_filters=(4,8)", "model.encoder_strides=(2,2)",
          "model.decoder_filters=(8,4)", "model.decoder_upsample=(True,True)",
          "model.groups=2", "model.num_keypoints=3", "data.image_size=16",
          "train.compute_dtype=float32"])
    printed = capsys.readouterr().out
    assert "wrote" in printed and "reload OK" in printed


def test_eval_cli_on_artifact(tmp_path, capsys):
    """keypoints-eval --artifact: locking/PCK metrics straight off an
    exported extractor (no checkpoint), overlay written."""
    from keypoints_tpu.eval import _cli as eval_cli
    from keypoints_tpu.export import _cli as export_cli

    shrink = ["model.encoder_filters=(4,8)", "model.encoder_strides=(2,2)",
              "model.decoder_filters=(8,4)", "model.decoder_upsample=(True,True)",
              "model.groups=2", "model.num_keypoints=3", "data.image_size=16",
              "train.compute_dtype=float32"]
    art = str(tmp_path / "e.shlo")
    export_cli(["--preset", "pong64", "--batch", "4", "--out", art,
                "--override", *shrink])
    capsys.readouterr()
    overlay = str(tmp_path / "o.png")
    eval_cli(["--preset", "pong64", "--artifact", art, "--batch", "6",
              "--overlay", overlay, "--override", *shrink])
    printed = capsys.readouterr().out
    assert "locking_median" in printed and "pck@0.1" in printed
    assert "eval_loss" not in printed          # artifact has no decoder
    import os
    assert os.path.getsize(overlay) > 0
    # exactly one of --checkpoint / --artifact
    import pytest
    with pytest.raises(SystemExit, match="exactly one"):
        eval_cli(["--preset", "pong64"])
    # preset/override mismatch against the artifact's meta fails with a
    # readable message, not a deep jax.export shape error
    with pytest.raises(SystemExit, match="artifact/config mismatch"):
        eval_cli(["--preset", "pong64", "--artifact", art, "--batch", "4"])
