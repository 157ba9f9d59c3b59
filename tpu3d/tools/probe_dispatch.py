"""Host<->device dispatch/transfer microprobe.

Measures the four numbers that separate single-stream from pipelined
serving throughput on this machine (docs/SERVING.md):

  * sync round-trip latency: dispatch a trivial jitted fn and pull a 4-byte
    scalar, per call — the floor any ``result = model(x); use(result)``
    serving loop pays per request
  * amortized async dispatch: dispatch N calls, sync once — what a
    queue-depth>1 serving loop pays per request
  * host->device staging bandwidth (``jax.device_put`` of a batch-sized
    array)
  * device->host pull cost for a detections-sized result

Run: ``python -m tpu3d.tools.probe_dispatch [--mb 1.5] [--iters 20]``.
Prints one JSON line. On a local PCIe-attached accelerator the round-trip
is ~0.1-0.5 ms; through a network tunnel (this environment's TPU) it is
~25-30 ms, which is an environment constant, not model time.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def probe(mb: float = 1.5, iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum() * 2.0)
    x = jax.device_put(np.ones((128, 128), np.float32))
    float(f(x))  # compile

    t0 = time.time()
    for _ in range(iters):
        float(f(x))
    sync_rt_ms = (time.time() - t0) / iters * 1000.0

    t0 = time.time()
    rs = [f(x) for _ in range(iters * 5)]
    _ = sum(float(r) for r in rs)
    async_ms = (time.time() - t0) / (iters * 5) * 1000.0

    n = int(mb * 1e6 / 4)
    host = np.ones((n,), np.float32)
    # distinct buffers each put: re-putting the same array can hit caches
    t0 = time.time()
    for i in range(max(iters // 4, 3)):
        host[i] = i  # dirty it so no put can be deduplicated
        jax.device_put(host).block_until_ready()
    put_ms = (time.time() - t0) / max(iters // 4, 3) * 1000.0

    # a typical final-detections pull: (B, 100, 7) boxes + (B, 100) scores
    g = jax.jit(lambda x: (jnp.zeros((8, 100, 7)) + x.sum(),
                           jnp.zeros((8, 100)) + x.sum()))
    jax.block_until_ready(g(x))
    t0 = time.time()
    for _ in range(iters):
        boxes, scores = g(x)
        np.asarray(boxes), np.asarray(scores)
    pull_ms = (time.time() - t0) / iters * 1000.0

    return {
        "sync_round_trip_ms": round(sync_rt_ms, 2),
        "async_dispatch_ms": round(async_ms, 2),
        "device_put_ms": round(put_ms, 2),
        "device_put_mb": mb,
        "device_put_mb_per_s": round(mb / (put_ms / 1000.0), 1),
        "detections_pull_ms": round(pull_ms, 2),
        "platform": jax.devices()[0].platform,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mb", type=float, default=1.5,
                    help="staging probe size in MB (default: one eval batch)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)
    print(json.dumps(probe(args.mb, args.iters)))


if __name__ == "__main__":
    main()
