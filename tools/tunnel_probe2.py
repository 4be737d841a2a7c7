#!/usr/bin/env python
"""Second tunnel probe: steady-state upload bandwidth, and whether N
concurrent device_put streams (threads) scale aggregate bandwidth."""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync():
    np.asarray(jnp.zeros(()))


def force(x):
    np.asarray(x[::65536].astype(jnp.int32).sum())


def main() -> None:
    rng = np.random.default_rng(0)
    mb = 8
    bufs = [
        rng.integers(0, 255, (mb * 1024 * 1024,), np.uint8) for _ in range(8)
    ]
    force(jax.device_put(bufs[0]))  # warm path

    # steady-state sequential
    for trial in range(3):
        sync()
        t0 = time.perf_counter()
        for b in bufs[:4]:
            force(jax.device_put(b))
        dt = time.perf_counter() - t0
        print(f"seq 4x{mb}MB trial{trial}: {dt*1e3:.0f} ms -> {4*mb/dt:.1f} MB/s", flush=True)

    # N parallel streams
    for nthreads in (2, 4):
        sync()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nthreads) as pool:
            xs = list(pool.map(jax.device_put, bufs[:4]))
        for x in xs:
            force(x)
        dt = time.perf_counter() - t0
        print(f"par{nthreads} 4x{mb}MB: {dt*1e3:.0f} ms -> {4*mb/dt:.1f} MB/s", flush=True)

    # small-transfer overhead (per-call fixed cost)
    small = rng.integers(0, 255, (64 * 1024,), np.uint8)
    sync()
    t0 = time.perf_counter()
    for _ in range(10):
        force(jax.device_put(small))
    dt = (time.perf_counter() - t0) / 10
    print(f"64KB put+force: {dt*1e3:.0f} ms each", flush=True)

    # does compute overlap with a THREADED upload?
    m = 4096

    @jax.jit
    def burn(a):
        for _ in range(64):
            a = a @ a / jnp.float32(64.0)
        return a.sum()

    a = jax.device_put(rng.normal(size=(m, m)).astype(np.float32))
    np.asarray(burn(a))
    sync()
    t0 = time.perf_counter()
    np.asarray(burn(a))
    t_c = time.perf_counter() - t0
    sync()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(1) as pool:
        fut = pool.submit(jax.device_put, bufs[0])
        h = burn(a)
        x = fut.result()
        np.asarray(h)
        force(x)
    t_b = time.perf_counter() - t0
    print(f"burn {t_c*1e3:.0f} ms; threaded-put({mb}MB)+burn: {t_b*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
