"""uint8 serving-ingest path (round 4): export/serve/client dtype handling.

``export_extract(..., input_dtype="uint8")`` ships artifacts that take raw
0-255 frames and rescale /255 on device — 4x smaller request payloads and
host→device uploads. Frame stores are uint8, so store-sourced serving is
lossless; float-sourced requests quantize to 1/255 (documented in
``BucketedExtract.coerce``).
"""

import io
import socket
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from keypoints_tpu.configs import get_config
    return get_config("pong64").override(**{
        "model.encoder_filters": (4, 8), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (8, 4),
        "model.decoder_upsample": (True, True), "model.groups": 2,
        "model.num_keypoints": 3, "data.image_size": 16,
        "train.compute_dtype": "float32"})


@pytest.fixture(scope="module")
def bundles():
    """(uint8 bundle, float32 bundle) exported from the SAME params."""
    from keypoints_tpu.export import export_extract_bundle
    from keypoints_tpu.training import init_state

    cfg = _tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    u8 = export_extract_bundle(cfg, state.params, batches=(1, 4),
                               input_dtype="uint8")
    f32 = export_extract_bundle(cfg, state.params, batches=(1, 4))
    return u8, f32


def test_uint8_bundle_matches_float_bundle_on_u8_frames(bundles):
    """uint8 frames through the u8 artifact == the same frames rescaled
    host-side through the f32 artifact. Not bit-exact: XLA lowers the
    on-device /255 to a multiply by the (rounded) reciprocal, a 1-ulp
    input perturbation — tolerance 1e-5 on [-1,1] coordinates."""
    from keypoints_tpu.export import load_extract
    u8b, f32b = bundles
    ext_u8 = load_extract(u8b)
    ext_f32 = load_extract(f32b)
    assert ext_u8.meta["input_dtype"] == "uint8"
    assert ext_f32.meta.get("input_dtype", "float32") == "float32"

    imgs8 = np.random.RandomState(0).randint(
        0, 256, (3, 1, 16, 16), np.uint8)
    imgsf = imgs8.astype(np.float32) / np.float32(255.0)
    got_u8 = np.asarray(ext_u8(imgs8))
    got_f32 = np.asarray(ext_f32(imgsf))
    np.testing.assert_allclose(got_u8, got_f32, rtol=0, atol=1e-5)

    # cross-dtype coercion: the u8 bundle fed the float view quantizes
    # back to the identical u8 frames; the f32 bundle fed raw u8 rescales
    np.testing.assert_array_equal(np.asarray(ext_u8(imgsf)), got_u8)
    np.testing.assert_array_equal(np.asarray(ext_f32(imgs8)), got_f32)
    # device-array inputs route through the same coercion
    np.testing.assert_array_equal(np.asarray(ext_u8(jnp.asarray(imgsf))),
                                  got_u8)


def test_uint8_single_artifact_dtype_recovered():
    """load_extract on a headerless single artifact must recover the input
    dtype from the program's avals."""
    from keypoints_tpu.export import export_extract, load_extract
    from keypoints_tpu.training import init_state

    cfg = _tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    art = export_extract(cfg, state.params, batch=2, input_dtype="uint8")
    ext = load_extract(art)
    assert ext.meta["input_dtype"] == "uint8"
    imgs8 = np.random.RandomState(1).randint(0, 256, (2, 1, 16, 16),
                                             np.uint8)
    assert np.asarray(ext(imgs8)).shape == (2, 3, 2)


def test_coerce_quantization_and_passthrough(bundles):
    from keypoints_tpu.export import load_extract
    ext = load_extract(bundles[0])
    # float in [0,1] → round-to-nearest uint8
    x = np.array([[0.0, 1.0, 0.5, 2 / 255 + 1e-4]], np.float32)
    np.testing.assert_array_equal(ext.coerce(x),
                                  np.array([[0, 255, 128, 2]], np.uint8))
    u = np.arange(4, dtype=np.uint8)[None]
    assert ext.coerce(u) is u            # uint8 passes through untouched


def test_http_uint8_server_end_to_end(bundles, tmp_path):
    """A uint8-bundle server ingests raw uint8 payloads AND float payloads
    (quantized at decode); http_extract converts client-side via /meta."""
    from keypoints_tpu import serve
    from keypoints_tpu.export import load_extract

    u8b, _ = bundles
    art = tmp_path / "u8.shlo"
    art.write_bytes(u8b)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    threading.Thread(
        target=serve._cli,
        args=([f"--artifact={art}", f"--port={port}", "--max-delay-ms=1"],),
        daemon=True).start()

    imgs8 = np.random.RandomState(2).randint(0, 256, (3, 1, 16, 16),
                                             np.uint8)
    want = np.asarray(load_extract(u8b)(imgs8))

    url = f"http://localhost:{port}"
    last = None
    for _ in range(100):                 # poll until the server is up
        try:
            meta = serve.http_meta(url)
            break
        except RuntimeError as e:
            last = e
            import time
            time.sleep(0.2)
    else:
        raise AssertionError(f"server never came up: {last}")
    assert meta["input_dtype"] == "uint8"

    # raw uint8 POST (the 4x-smaller wire format)
    buf = io.BytesIO()
    np.save(buf, imgs8)
    with urllib.request.urlopen(urllib.request.Request(
            f"{url}/extract", data=buf.getvalue(), method="POST")) as r:
        got = np.load(io.BytesIO(r.read()), allow_pickle=False)
    np.testing.assert_array_equal(got, want)

    # stdlib client with FLOAT input: quantizes client-side via /meta
    serve._META_CACHE.pop(url, None)
    gotf = serve.http_extract(url, imgs8.astype(np.float32) / np.float32(255))
    np.testing.assert_array_equal(gotf, want)
    # and uint8 input passes through
    got8 = serve.http_extract(url, imgs8)
    np.testing.assert_array_equal(got8, want)
