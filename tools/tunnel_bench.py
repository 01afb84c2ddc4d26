"""Microbenchmark the axon tunnel: upload/download fixed latency vs
bandwidth, and whether copy_to_host_async actually overlaps.

Drives the perf work on the wire-fetch path (round-5): the 1080p ctb32
profile shows device_get at ~450 ms/frame vs a 98 ms device step, so
the fetch is the pipeline ceiling.  This tool answers which half to
attack — RPC count (batch more) or bytes (shrink the wire).
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices())

    @jax.jit
    def bump(x):
        return x + 1

    for nbytes in (1 << 10, 1 << 17, 1 << 20, 1 << 22, 1 << 23):
        a = np.zeros(nbytes, np.uint8)
        # upload
        ts = []
        for _ in range(5):
            t0 = time.time()
            d = jnp.asarray(a)
            d.block_until_ready()
            ts.append(time.time() - t0)
        up = min(ts)
        d = bump(d)
        d.block_until_ready()
        # download (sync)
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(jax.device_get(d))
            ts.append(time.time() - t0)
        down = min(ts)
        # download with async copy started first
        ts = []
        for _ in range(5):
            e = bump(d)
            e.block_until_ready()
            try:
                e.copy_to_host_async()
            except Exception as ex:
                print("copy_to_host_async raised:", ex)
            time.sleep(down * 1.2)  # give the copy time to complete
            t0 = time.time()
            np.asarray(jax.device_get(e))
            ts.append(time.time() - t0)
        asy = min(ts)
        print(f"{nbytes/1024:10.0f} KiB  up {up*1000:7.1f} ms"
              f"  down {down*1000:7.1f} ms  down-after-async "
              f"{asy*1000:7.1f} ms")


if __name__ == "__main__":
    main()
