#!/usr/bin/env python
"""Characterize the tunneled TPU link: RTT, upload/download bandwidth,
and whether host->device transfers overlap with device compute.

Informs the DevicePipeline overlap design (VERDICT.md round-1 item 1).
Run on the real chip: ``python tools/tunnel_probe.py``.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync():
    # scalar fetch — the only reliable sync over the tunnel (CLAUDE.md)
    np.asarray(jnp.zeros(()))


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- RTT: scalar round trip ------------------------------------- #
    sync()
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jnp.zeros(()) + 1.0)
    rtt = (time.perf_counter() - t0) / n
    print(f"RTT (scalar add + fetch): {rtt*1e3:.1f} ms", flush=True)

    # --- upload bandwidth -------------------------------------------- #
    for mb in (4, 16, 32):
        buf = np.random.default_rng(0).integers(
            0, 255, (mb * 1024 * 1024,), np.uint8
        )
        sync()
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        # force completion: reduce to scalar and fetch
        np.asarray(x[::65536].astype(jnp.int32).sum())
        dt = time.perf_counter() - t0
        print(f"upload {mb} MB: {dt*1e3:.0f} ms -> {mb/dt:.1f} MB/s", flush=True)

    # --- download bandwidth ------------------------------------------ #
    for mb in (1, 4, 16):
        x = jax.device_put(
            np.zeros((mb * 1024 * 1024,), np.uint8)
        )
        np.asarray(x[::65536].astype(jnp.int32).sum())
        t0 = time.perf_counter()
        np.asarray(x)
        dt = time.perf_counter() - t0
        print(f"download {mb} MB: {dt*1e3:.0f} ms -> {mb/dt:.1f} MB/s", flush=True)

    # --- does upload overlap with compute? ---------------------------- #
    # Launch a long matmul chain, then immediately device_put a big buffer;
    # if the total is ~max(compute, upload) they overlap; if ~sum, they
    # serialize.
    m = 4096

    @jax.jit
    def burn(a):
        for _ in range(64):
            a = a @ a / jnp.float32(64.0)
        return a.sum()

    a = jax.device_put(np.random.default_rng(1).normal(size=(m, m)).astype(np.float32))
    np.asarray(burn(a))  # warm compile
    sync()
    t0 = time.perf_counter()
    np.asarray(burn(a))
    t_compute = time.perf_counter() - t0

    buf = np.random.default_rng(2).integers(0, 255, (32 * 1024 * 1024,), np.uint8)
    sync()
    t0 = time.perf_counter()
    x = jax.device_put(buf)
    np.asarray(x[::65536].astype(jnp.int32).sum())
    t_upload = time.perf_counter() - t0

    sync()
    t0 = time.perf_counter()
    h = burn(a)  # async dispatch
    x = jax.device_put(buf)
    np.asarray(h)
    np.asarray(x[::65536].astype(jnp.int32).sum())
    t_both = time.perf_counter() - t0
    print(
        f"compute {t_compute*1e3:.0f} ms, upload {t_upload*1e3:.0f} ms, "
        f"concurrent {t_both*1e3:.0f} ms "
        f"(sum={1e3*(t_compute+t_upload):.0f}, overlap={'YES' if t_both < 0.75*(t_compute+t_upload) else 'NO'})",
        flush=True,
    )

    # --- do two device_puts pipeline with compute between? ----------- #
    # pattern: put A, run det(A), put B, run det(B), fetch both — measures
    # effective overlap in the pipeline's real dispatch order.
    @jax.jit
    def small(x):
        return x.astype(jnp.float32).sum()

    bufs = [
        np.random.default_rng(i).integers(0, 255, (8 * 1024 * 1024,), np.uint8)
        for i in range(4)
    ]
    np.asarray(small(jax.device_put(bufs[0])))  # warm
    sync()
    t0 = time.perf_counter()
    handles = []
    for b in bufs:
        x = jax.device_put(b)
        handles.append(burn(a))
    for h in handles:
        np.asarray(h)
    t_pipe = time.perf_counter() - t0
    print(
        f"4x (8MB put + burn): {t_pipe*1e3:.0f} ms "
        f"(serial estimate {1e3*4*(t_compute + 8/32*t_upload):.0f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
