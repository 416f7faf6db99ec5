"""Serving-path benchmark: request latency + micro-batched throughput.

Measures the shipped serving stack (export bundle -> BucketedExtract ->
BatchingExtractor) on the current backend at the celeba128 preset shape:

* single-request latency percentiles at small n (the b1/b8 buckets), and
* aggregate throughput with many concurrent small requests coalescing
  into the largest bucket.

Through THIS environment's axon tunnel every device call pays a ~28 ms
host round-trip (CLAUDE.md), so the small-request latency floor here is
tunnel-, not chip-, bound; on a directly-attached TPU host the same path
is PCIe-bound. The throughput number amortizes the round-trip over the
bucket and is the architecture-meaningful figure.

    python benchmarks/bench_serve.py          # prints one JSON line
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.export import export_extract_bundle, load_extract
    from keypoints_tpu.serve import BatchingExtractor
    from keypoints_tpu.training import init_state
    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = get_config("celeba128")
    state = init_state(cfg, jax.random.PRNGKey(0))
    buckets = (1, 8, 64, 256)
    ext = load_extract(export_extract_bundle(cfg, state.params, buckets))
    sh = (cfg.data.channels, cfg.data.image_size, cfg.data.image_size)
    rs = np.random.RandomState(0)

    # warm every bucket (compile) before timing
    for b in buckets:
        np.asarray(ext(np.zeros((b, *sh), np.float32)))

    # --- single-request latency (no co-travelers: max_delay tiny)
    srv = BatchingExtractor(ext, max_batch=256, max_delay_ms=0.2)
    lat = {}
    try:
        for n in (1, 8):
            req = rs.rand(n, *sh).astype(np.float32)
            srv.extract(req)                       # queue-path warmup
            ts = []
            for _ in range(50):
                t0 = time.perf_counter()
                srv.extract(req)
                ts.append((time.perf_counter() - t0) * 1e3)
            lat[n] = (float(np.percentile(ts, 50)),
                      float(np.percentile(ts, 95)))
            print(f"n={n}: p50 {lat[n][0]:.1f} ms  p95 {lat[n][1]:.1f} ms",
                  flush=True)

        # --- concurrent throughput: 256 requests of 4 imgs, 32 in flight,
        # coalescing into the 256 bucket under a 5 ms bound
        srv2 = BatchingExtractor(ext, max_batch=256, max_delay_ms=5.0)
        try:
            reqs = [rs.rand(4, *sh).astype(np.float32) for _ in range(256)]
            srv2.extract(reqs[0])                  # warmup
            t0 = time.perf_counter()
            with ThreadPoolExecutor(32) as pool:
                list(pool.map(srv2.extract, reqs))
            dt = time.perf_counter() - t0
        finally:
            srv2.close()
        imgs = 4 * len(reqs)
        tput = imgs / dt
        print(f"concurrent: {imgs} imgs in {dt * 1e3:.0f} ms = "
              f"{tput:,.0f} imgs/s", flush=True)
    finally:
        srv.close()

    print(json.dumps({
        "metric": "serve_concurrent_imgs_per_sec", "value": round(tput, 1),
        "unit": "imgs/s", "platform": jax.default_backend(),
        "extra": {"latency_ms_p50_p95": lat, "buckets": list(buckets),
                  "request_imgs": 4, "concurrency": 32,
                  "image_size": cfg.data.image_size}}), flush=True)


if __name__ == "__main__":
    main()
