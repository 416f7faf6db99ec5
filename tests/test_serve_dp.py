"""Data-parallel serving: `parallel.make_dp_extract` over a device mesh.

The extract path is row-parallel, so DP serving must be EXACT vs the
single-device extractor — the mesh only changes where rows run, never what
they compute. Runs on the 8-virtual-CPU-device mesh from conftest; the same
code serves a real TPU slice unmodified (SURVEY §2.3/§3.3).
"""

import io
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.parallel import data_parallel_mesh, make_dp_extract


def _tiny_cfg():
    from keypoints_tpu.configs import get_config
    return get_config("pong64").override(**{
        "model.encoder_filters": (4, 8), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (8, 4),
        "model.decoder_upsample": (True, True), "model.groups": 2,
        "model.num_keypoints": 3, "data.image_size": 16,
        "train.compute_dtype": "float32"})


@pytest.fixture(scope="module")
def dp_setup():
    from keypoints_tpu.training import build_model, init_state, \
        make_extract_fn

    cfg = _tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    mesh = data_parallel_mesh()            # all 8 virtual devices
    assert mesh.devices.size == 8
    ext = make_dp_extract(cfg, state.params, batches=(8, 16), mesh=mesh)
    direct = jax.jit(make_extract_fn(cfg, build_model(cfg)))
    return cfg, ext, (lambda imgs: direct(state.params, imgs))


def test_dp_extract_matches_single_device(dp_setup):
    """Every request-size regime — pad-up, exact bucket, chunk-split — must
    agree with the unsharded extractor to fp tolerance."""
    _, ext, direct = dp_setup
    assert ext.max_batch == 16
    assert ext.meta["data_parallel_devices"] == 8
    rs = np.random.RandomState(11)
    for n in (1, 5, 8, 13, 16, 40):        # pad / exact / pad / exact / split
        imgs = rs.rand(n, 1, 16, 16).astype(np.float32)
        got = np.asarray(ext(imgs))
        assert got.shape == (n, 3, 2)
        np.testing.assert_allclose(got, np.asarray(direct(jnp.asarray(imgs))),
                                   rtol=0, atol=1e-6)


def test_dp_extract_rejects_bad_buckets(dp_setup):
    from keypoints_tpu.training import init_state
    cfg, _, _ = dp_setup
    params = init_state(cfg, jax.random.PRNGKey(0)).params
    mesh = data_parallel_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        make_dp_extract(cfg, params, batches=(6,), mesh=mesh)
    with pytest.raises(ValueError, match="invalid bucket"):
        make_dp_extract(cfg, params, batches=(), mesh=mesh)
    # a 2-device sub-mesh accepts what the 8-device mesh rejects
    sub = data_parallel_mesh(jax.devices()[:2])
    ext = make_dp_extract(cfg, params, batches=(6,), mesh=sub)
    assert ext.max_batch == 6


def test_dp_extract_through_batching_extractor(dp_setup):
    """The micro-batcher must coalesce concurrent small requests into one
    sharded device batch and scatter rows back exactly."""
    from keypoints_tpu.serve import BatchingExtractor

    _, ext, direct = dp_setup
    srv = BatchingExtractor(ext, max_batch=16, max_delay_ms=20,
                            item_shape=(1, 16, 16))
    rs = np.random.RandomState(12)
    reqs = [rs.rand(n, 1, 16, 16).astype(np.float32) for n in (3, 5, 2, 6)]
    futs = [srv.submit(r) for r in reqs]
    for r, f in zip(reqs, futs):
        np.testing.assert_allclose(
            f.result(timeout=30), np.asarray(direct(jnp.asarray(r))),
            rtol=0, atol=1e-6)
    srv.close()


def test_http_server_dp_preset_mode(tmp_path):
    """`keypoints-serve --preset …` serves live data-parallel from a
    checkpoint (here random-init smoke) with the same HTTP contract."""
    import socket
    import urllib.request

    from keypoints_tpu import serve
    from keypoints_tpu.training import build_model, init_state, \
        make_extract_fn

    cfg = _tiny_cfg()
    direct = jax.jit(make_extract_fn(cfg, build_model(cfg)))
    params = init_state(cfg, jax.random.PRNGKey(0)).params

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    overrides = ["model.encoder_filters=(4,8)", "model.encoder_strides=(2,2)",
                 "model.decoder_filters=(8,4)",
                 "model.decoder_upsample=(True,True)", "model.groups=2",
                 "model.num_keypoints=3", "data.image_size=16",
                 "train.compute_dtype=float32"]
    t = threading.Thread(
        target=serve._cli,
        args=(["--preset=pong64", "--batch", "8", "16", f"--port={port}",
               "--max-delay-ms=1", "--override"] + overrides,),
        daemon=True)
    t.start()

    imgs = np.random.RandomState(13).rand(5, 1, 16, 16).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    req = urllib.request.Request(f"http://localhost:{port}/extract",
                                 data=buf.getvalue(), method="POST")
    last = None
    for _ in range(80):                    # poll until warmup finishes
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                body = resp.read()
            break
        except OSError as e:
            last = e
            import time
            time.sleep(0.25)
    else:
        raise AssertionError(f"server never came up: {last}")
    kp = np.load(io.BytesIO(body))
    np.testing.assert_allclose(kp, np.asarray(direct(params,
                                                     jnp.asarray(imgs))),
                               rtol=0, atol=1e-6)
    meta = serve.http_meta(f"http://localhost:{port}")
    assert meta["batches"] == [8, 16]
    assert meta["data_parallel_devices"] == 8


def test_serve_cli_requires_exactly_one_source():
    from keypoints_tpu import serve
    with pytest.raises(SystemExit):
        serve._cli([])                     # neither --artifact nor --preset
    with pytest.raises(SystemExit):
        serve._cli(["--artifact=x.shlo", "--preset=pong64"])


def test_dp_extract_uint8_ingest(dp_setup):
    """Live DP serving with input_dtype=uint8 (the artifact path's twin):
    raw uint8 frames match the float extractor fed frames/255, and meta
    advertises the dtype for the HTTP client's quantization."""
    from keypoints_tpu.training import init_state
    cfg, _, direct = dp_setup
    state = init_state(cfg, jax.random.PRNGKey(0))   # fixture's params seed
    mesh = data_parallel_mesh()
    ext_u8 = make_dp_extract(cfg, state.params, batches=(8,), mesh=mesh,
                             input_dtype="uint8")
    assert ext_u8.meta["input_dtype"] == "uint8"
    imgs8 = np.random.RandomState(7).randint(0, 256, (8, 1, 16, 16),
                                             np.uint8)
    got = np.asarray(ext_u8(imgs8))
    want = np.asarray(direct(jnp.asarray(imgs8, jnp.float32) / 255.0))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    with pytest.raises(ValueError, match="input_dtype"):
        make_dp_extract(cfg, state.params, batches=(8,), mesh=mesh,
                        input_dtype="int16")
