#!/usr/bin/env python3
"""Probe whether the device tunnel's sustained rate limit is per-stream.

Measures host->device throughput with 1, 2, 4 and 8 concurrent
device_put threads over the same total payload. If concurrent streams
scale, the pipeline's transfer stage should ship each batch as several
row-slices from a small thread pool (cheap to add: the fused per-batch
program can concatenate on device).

Run ON the tunnel: PYTHONPATH=/root/repo:/root/.axon_site python3
tools/tunnel_concurrency_probe.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax

    dev = jax.devices()[0]
    print("device:", dev)
    total_mb = float(os.environ.get("PROBE_MB", "24"))
    payload = np.random.randint(0, 255, size=(int(total_mb * 1024 * 1024),),
                                dtype=np.uint8)

    # warm: one small put so the tunnel/PJRT path is initialized
    jax.device_put(payload[:1024], dev).block_until_ready()

    for nstreams in (1, 2, 4, 8):
        chunks = np.array_split(payload, nstreams)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            if nstreams == 1:
                jax.device_put(chunks[0], dev).block_until_ready()
            else:
                with ThreadPoolExecutor(nstreams) as pool:
                    futs = [pool.submit(jax.device_put, c, dev)
                            for c in chunks]
                    for f in futs:
                        f.result().block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, total_mb / dt)
        print(f"{nstreams} stream(s): {best:8.2f} MB/s")


if __name__ == "__main__":
    main()
