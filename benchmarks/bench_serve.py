"""Serving-path benchmark: request latency + micro-batched throughput,
for BOTH ingest dtypes (f32 and uint8).

Measures the shipped serving stack (export bundle -> BucketedExtract ->
BatchingExtractor) on the current backend at the celeba128 preset shape:

* single-request latency percentiles at small n (the b1/b8 buckets),
* aggregate throughput with many concurrent small requests coalescing
  into the largest bucket,
* both for the f32 ingest path and the uint8 one (VERDICT r4 #7: the 4x
  H2D saving was arithmetic, not a bench row — export.py:38-75 /
  parallel/dp.py uint8 ingest move the [0,1] normalization on-device).

Through THIS environment's axon tunnel every device call pays a ~28 ms
host round-trip (CLAUDE.md) and host->device bandwidth is capped at
~22 MB/s — exactly the resource uint8 quarters. On a directly-attached
TPU host the same path is PCIe-bound and the ratio compresses.

    python benchmarks/bench_serve.py          # prints one JSON line
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def measure(ext, sh, np_dtype, rs):
    """(latency percentiles, concurrent throughput) for one bundle."""
    from keypoints_tpu.serve import BatchingExtractor

    def req(n):
        x = rs.rand(n, *sh)
        return ((x * 255).astype(np.uint8) if np_dtype == np.uint8
                else x.astype(np.float32))

    srv = BatchingExtractor(ext, max_batch=256, max_delay_ms=0.2)
    lat = {}
    try:
        for n in (1, 8):
            r = req(n)
            srv.extract(r)                         # queue-path warmup
            ts = []
            for _ in range(50):
                t0 = time.perf_counter()
                srv.extract(r)
                ts.append((time.perf_counter() - t0) * 1e3)
            lat[n] = (float(np.percentile(ts, 50)),
                      float(np.percentile(ts, 95)))
            print(f"  n={n}: p50 {lat[n][0]:.1f} ms  p95 {lat[n][1]:.1f} ms",
                  flush=True)
    finally:
        srv.close()

    # --- concurrent throughput: 256 requests of 4 imgs, 32 in flight,
    # coalescing into the 256 bucket under a 5 ms bound
    srv2 = BatchingExtractor(ext, max_batch=256, max_delay_ms=5.0)
    try:
        reqs = [req(4) for _ in range(256)]
        srv2.extract(reqs[0])                      # warmup
        t0 = time.perf_counter()
        with ThreadPoolExecutor(32) as pool:
            list(pool.map(srv2.extract, reqs))
        dt = time.perf_counter() - t0
    finally:
        srv2.close()
    imgs = 4 * len(reqs)
    tput = imgs / dt
    print(f"  concurrent: {imgs} imgs in {dt * 1e3:.0f} ms = "
          f"{tput:,.0f} imgs/s", flush=True)
    return lat, tput


def main():
    import jax

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.export import export_extract_bundle, load_extract
    from keypoints_tpu.training import init_state
    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = get_config("celeba128")
    state = init_state(cfg, jax.random.PRNGKey(0))
    buckets = (1, 8, 64, 256)
    sh = (cfg.data.channels, cfg.data.image_size, cfg.data.image_size)
    rs = np.random.RandomState(0)

    rows = {}
    for dtype in ("float32", "uint8"):
        ext = load_extract(export_extract_bundle(cfg, state.params, buckets,
                                                 input_dtype=dtype))
        np_dtype = np.uint8 if dtype == "uint8" else np.float32
        for b in buckets:                      # warm every bucket (compile)
            np.asarray(ext(np.zeros((b, *sh), np_dtype)))
        print(f"{dtype}:", flush=True)
        lat, tput = measure(ext, sh, np_dtype, rs)
        rows[dtype] = {"latency_ms_p50_p95": lat,
                       "concurrent_imgs_per_sec": round(tput, 1)}

    print(json.dumps({
        "metric": "serve_concurrent_imgs_per_sec",
        "value": rows["float32"]["concurrent_imgs_per_sec"],
        "unit": "imgs/s", "platform": jax.default_backend(),
        "extra": {"by_input_dtype": rows, "buckets": list(buckets),
                  "request_imgs": 4, "concurrency": 32,
                  "uint8_speedup": round(
                      rows["uint8"]["concurrent_imgs_per_sec"]
                      / rows["float32"]["concurrent_imgs_per_sec"], 2),
                  "image_size": cfg.data.image_size}}), flush=True)


if __name__ == "__main__":
    main()
