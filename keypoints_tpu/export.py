"""AOT export of the inference path: a self-contained keypoint extractor.

The deployment story for the extract path (SURVEY §2.1 "Keypoint
extraction", §3.3): serialize the jitted ``Ψ → spatial softmax`` program —
with the trained parameters baked in as constants — to a portable
StableHLO artifact via ``jax.export``. The artifact needs only jaxlib to
run (no model code, no flax, no checkpoint plumbing), loads in
milliseconds, and is the unit you hand a serving fleet.

    # export (trainer side)
    python -m keypoints_tpu.export --preset celeba128 \
        --checkpoint checkpoints/celeba128 --batch 256 --out extract.shlo

    # serve (consumer side)
    from keypoints_tpu.export import load_extract
    extract = load_extract("extract.shlo")
    kp = extract(images)            # (B, C, H, W) f32 [0,1] -> (B, K, 2)

Exports are shape-specialized (one batch size per artifact — TPU-native:
static shapes keep the program on XLA's fast path); export several batch
sizes if the server needs buckets.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import Config


def export_extract(cfg: Config, params, batch: int,
                   platforms: Sequence[str] | None = None,
                   input_dtype: str = "float32") -> bytes:
    """→ serialized StableHLO artifact of ``extract_keypoints`` at ``batch``.

    ``params`` are baked into the program as constants (self-contained
    artifact). ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` to emit a multi-platform artifact.

    ``input_dtype="uint8"`` exports a program taking raw ``uint8`` frames
    (0–255 ↔ the [0, 1] float convention; the /255 rescale runs on-device).
    Serving ingest — HTTP payload AND host→device upload — shrinks 4×,
    which dominates end-to-end latency on transfer-bound links (the frame
    stores are already uint8, so store-sourced serving is lossless;
    float-sourced requests quantize to 1/255, see ``BucketedExtract``).
    """
    import contextlib

    from jax import export as jexport

    from keypoints_tpu import kernels
    from keypoints_tpu.training import build_model, make_extract_fn

    if input_dtype not in ("float32", "uint8"):
        raise ValueError(f"input_dtype must be float32|uint8, "
                         f"got {input_dtype!r}")
    model = build_model(cfg)
    extract = make_extract_fn(cfg, model)

    if input_dtype == "uint8":
        def fn(images):
            return extract(params, images.astype(jnp.float32) / 255.0)
    else:
        def fn(images):
            return extract(params, images)

    d = cfg.data
    spec = jax.ShapeDtypeStruct(
        (batch, d.channels, d.image_size, d.image_size),
        jnp.uint8 if input_dtype == "uint8" else jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    # A multi-platform artifact cannot contain Mosaic pallas_calls (they
    # lower for TPU only) — trace the pure-jnp kernel paths instead. The
    # TPU-only export keeps the Pallas routing (incl. the B=1 marginal
    # kernel that sidesteps the XLA:TPU b1 layout miscompile; the jnp path
    # flattens (B,K) before reducing, so it is safe on every platform too).
    portable = platforms is not None and any(p != "tpu" for p in platforms)
    ctx = kernels.xla_only() if portable else contextlib.nullcontext()
    with ctx:
        exp = jexport.export(jax.jit(fn), **kwargs)(spec)
    return exp.serialize()


def load_extract(path_or_bytes) -> "BucketedExtract":
    """Deserialize an exported extractor → fn(images) -> (B, K, 2).

    The returned callable is jit-compatible and runs on whatever platform
    the artifact was exported for. Both single artifacts
    (``export_extract``) and bundles (``export_extract_bundle``) load as a
    ``BucketedExtract`` serving ANY batch size up to the largest bucket —
    a single artifact is a one-bucket bundle whose metadata is recovered
    from the program's input/output shapes.
    """
    from jax import export as jexport

    data = path_or_bytes
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    if bytes(data[:2]) == b"PK":          # zip magic: a bucket bundle
        return load_extract_bundle(data)
    exp = jexport.deserialize(bytearray(data))
    (b, c, h, _), = [a.shape for a in exp.in_avals]
    (_, k, _), = [a.shape for a in exp.out_avals]
    (in_dtype,) = [a.dtype for a in exp.in_avals]
    meta = {"format": "keypoints-extract-bundle", "version": 1,
            "batches": [int(b)], "image_size": int(h), "channels": int(c),
            "num_keypoints": int(k),
            "input_dtype": str(np.dtype(in_dtype))}
    return BucketedExtract({int(b): lambda x: exp.call(x)}, meta)


def export_extract_bundle(cfg: Config, params, batches: Sequence[int],
                          platforms: Sequence[str] | None = None,
                          input_dtype: str = "float32") -> bytes:
    """→ a multi-batch-bucket serving bundle (zip of StableHLO artifacts).

    StableHLO programs are shape-specialized (static shapes ARE the TPU
    fast path), so a server that must handle variable request sizes ships
    one artifact per batch bucket and pads each request up to the smallest
    covering bucket — the standard TPU serving pattern. The bundle is a
    zip: ``b{N}.shlo`` per bucket + ``meta.json`` (shapes, buckets, K).
    """
    import io
    import json
    import zipfile

    sizes = sorted({int(b) for b in batches})
    if not sizes or sizes[0] < 1:
        raise ValueError(f"invalid bucket list {batches!r}")
    d = cfg.data
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for b in sizes:
            z.writestr(f"b{b}.shlo", export_extract(cfg, params, b,
                                                    platforms, input_dtype))
        z.writestr("meta.json", json.dumps({
            "format": "keypoints-extract-bundle", "version": 1,
            "batches": sizes, "image_size": d.image_size,
            "channels": d.channels,
            "num_keypoints": cfg.model.num_keypoints,
            "input_dtype": input_dtype}))
    return buf.getvalue()


class BucketedExtract:
    """Serve any batch size from a bundle of shape-specialized programs.

    A request of n images runs on the smallest bucket ≥ n: the batch is
    zero-padded up (rows are independent through Ψ+soft-argmax, so padding
    never perturbs real outputs) and the result sliced back to n. Requests
    larger than the largest bucket are split into max-bucket chunks.
    """

    def __init__(self, fns: dict[int, Callable], meta: dict):
        self._fns = dict(sorted(fns.items()))
        self.meta = meta
        self.max_batch = max(self._fns)

    def coerce(self, images):
        """Convert a request to the bundle's input dtype (see meta).

        uint8-bundle + float request: quantize round(clip(x,0,1)·255) — the
        documented 1/255-lossy path for float sources; uint8 sources pass
        through unchanged (and a float32 bundle fed uint8 rescales /255,
        lossless). Keeps artifact dtype a transport detail at this API.
        """
        want = np.dtype(self.meta.get("input_dtype", "float32"))
        have = np.dtype(images.dtype)
        if have == want:
            return images
        xp = np if isinstance(images, np.ndarray) else jnp
        if want == np.uint8:
            return xp.clip(xp.round(images.astype(xp.float32) * 255.0),
                           0, 255).astype(xp.uint8)
        return images.astype(xp.float32) / (255.0 if have == np.uint8
                                            else 1.0)

    def __call__(self, images):
        images = self.coerce(images)
        n = images.shape[0]
        bucket = next((b for b in self._fns if b >= n), None)
        if bucket is None:
            # larger than the largest bucket: split into full max-batch
            # chunks + one covering tail (rows are independent, so this is
            # exact). Keeps offline batch extraction through an artifact
            # (e.g. video rendering) working at any n.
            parts = [self(images[i:i + self.max_batch])
                     for i in range(0, n, self.max_batch)]
            return (np.concatenate(parts) if isinstance(parts[0], np.ndarray)
                    else jnp.concatenate(parts))
        if n < bucket:
            # pad on the host when the request is a host array: one upload,
            # no extra zeros/concat device dispatches (each device call
            # costs a full round-trip on a remote-attached TPU)
            if isinstance(images, np.ndarray):
                images = np.concatenate(
                    [images, np.zeros((bucket - n,) + images.shape[1:],
                                      images.dtype)])
            else:
                pad = jnp.zeros((bucket - n,) + tuple(images.shape[1:]),
                                images.dtype)
                images = jnp.concatenate([jnp.asarray(images), pad], axis=0)
        return self._fns[bucket](images)[:n]


def load_extract_bundle(path_or_bytes) -> BucketedExtract:
    """Deserialize an ``export_extract_bundle`` zip → ``BucketedExtract``."""
    import io
    import json
    import zipfile

    from jax import export as jexport

    data = path_or_bytes
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    fns = {}
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        meta = json.loads(z.read("meta.json"))
        for b in meta["batches"]:
            exp = jexport.deserialize(bytearray(z.read(f"b{b}.shlo")))
            fns[int(b)] = (lambda e: lambda x: e.call(x))(exp)
    return BucketedExtract(fns, meta)


def _cli(argv=None):
    import argparse

    from keypoints_tpu import checkpoint as ckpt
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import TrainState, init_state
    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    from keypoints_tpu.utils.platform import apply_platform
    apply_platform()      # $KEYPOINTS_TPU_PLATFORM (axon ignores
    enable_compile_cache()  # JAX_PLATFORMS); before device access
    p = argparse.ArgumentParser(
        description="export the keypoint extractor as a StableHLO artifact")
    p.add_argument("--preset", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint dir (trainer layout); "
                        "omit for random-init params (smoke exports)")
    p.add_argument("--batch", type=int, nargs="+", default=[256],
                   help="one size -> single artifact; several -> a bucket "
                        "bundle (requests pad up to the smallest cover)")
    p.add_argument("--out", required=True)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="e.g. --platforms tpu cpu (default: current backend)")
    p.add_argument("--input-dtype", default="float32",
                   choices=("float32", "uint8"),
                   help="uint8: raw 0-255 frames in, /255 on device -- 4x "
                        "smaller serving ingest (lossless for uint8 "
                        "sources; float requests quantize to 1/255)")
    p.add_argument("--override", nargs="*", default=[])
    args = p.parse_args(argv)

    from keypoints_tpu.configs import apply_overrides
    cfg = apply_overrides(get_config(args.preset), args.override)

    state = init_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        mgr = ckpt.make_manager(args.checkpoint)
        step, restored = ckpt.restore_latest(mgr, state._asdict())
        if step is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        state = TrainState(**restored)
        print(f"exporting params from step {step}")

    if len(args.batch) > 1:
        data = export_extract_bundle(cfg, state.params, args.batch,
                                     platforms=args.platforms,
                                     input_dtype=args.input_dtype)
        kind = f"bundle, buckets {sorted(set(args.batch))}"
    else:
        data = export_extract(cfg, state.params, args.batch[0],
                              platforms=args.platforms,
                              input_dtype=args.input_dtype)
        kind = f"batch {args.batch[0]}, {args.input_dtype} in"
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {len(data) / 1e6:.2f} MB artifact to {args.out} "
          f"({kind}, {cfg.data.image_size}px)")

    # sanity: reload and run one batch
    extract = load_extract(args.out)
    imgs = jnp.zeros((min(args.batch), cfg.data.channels,
                      cfg.data.image_size, cfg.data.image_size), jnp.float32)
    kp = np.asarray(extract(imgs))
    print(f"reload OK: output {kp.shape}")


if __name__ == "__main__":
    _cli()
