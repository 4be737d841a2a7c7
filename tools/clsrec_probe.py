#!/usr/bin/env python
"""Cls+rec chain breakdown probe (config6's 0.0587 ms/crop, VERDICT r3 #1).

Times, on device-resident tensors with async-chain sync (same methodology
as bench.bench_device_ceiling):

* the full fused clsrec_fwd at the config6 geometry (n crops, w320)
* the same with symmetrize off / use_cls off
* cls model forward alone (pre-warped input)
* rec model forward alone, and rec + CTC decode
* the separable warp alone at cls and rec shapes

Usage: python tools/clsrec_probe.py [--n 32] [--iters 30]
"""

from __future__ import annotations

import argparse
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


def sync(x=None):
    if x is None:
        np.asarray(jnp.zeros(()) + 1)
    else:
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jnp.ravel(leaf)[0])


def timeit(label, fn, iters=30, per=1):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label}: {best*1e3:.3f} ms  ({best/per*1e6:.1f} us/crop)",
          flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    n, iters = args.n, args.iters

    from retto_tpu.config import SessionConfig
    from retto_tpu.image.warp import warp_crops_separable
    from retto_tpu.ops.charset import CharacterDict, ascii_charset
    from retto_tpu.ops.ctc import ctc_greedy_decode
    from retto_tpu.pipeline.session import RettoSession

    print(f"backend: {jax.default_backend()}  n={n}")
    cfg = SessionConfig()
    session = RettoSession(cfg, preset="mobile",
                           charset=CharacterDict(ascii_charset()))
    dp = session.device_pipeline()

    b = 8
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.integers(0, 255, (b, 960, 704), np.uint8))
    vs = jnp.asarray(np.tile(np.asarray([[960, 704]], np.int32), (b, 1)))
    vd = jnp.asarray(np.tile(np.asarray([[992, 736]], np.int32), (b, 1)))
    _, _, rgb_u8 = dp._det_fwd(dp._params["det"], (ys,), vs, vd,
                               dh=1024, dw=768, fmt="gray")

    rows = jnp.asarray(np.arange(n, dtype=np.int32) % b)
    rec_scal = jnp.asarray(np.tile(
        [[8.0, 600.0 / 320.0, 100.0, 32.0 / 48.0]], (n, 1)).astype(np.float32))
    flip_scal = jnp.asarray(np.tile(
        [[608.0, -600.0 / 320.0, 132.0, -32.0 / 48.0]], (n, 1)
    ).astype(np.float32))
    cls_scal = jnp.asarray(np.tile(
        [[8.0, 600.0 / 192.0, 100.0, 32.0 / 48.0]], (n, 1)).astype(np.float32))
    cls_flip = jnp.asarray(np.tile(
        [[608.0, -600.0 / 192.0, 132.0, -32.0 / 48.0]], (n, 1)
    ).astype(np.float32))
    w_rec = jnp.full((n,), 320, jnp.int32)
    w_cls = jnp.full((n,), 192, jnp.int32)

    def full():
        return dp._clsrec_fwd(
            dp._params["cls"], dp._params["rec"], rgb_u8, rows,
            cls_scal, cls_flip, w_cls, rec_scal, flip_scal, w_rec, vs,
            out_w=320, use_cls=True)

    timeit(f"clsrec_fwd full (n={n}, sym=on)", full, iters, per=n)

    def nocls():
        return dp._clsrec_fwd(
            dp._params["cls"], dp._params["rec"], rgb_u8, rows,
            cls_scal, cls_flip, w_cls, rec_scal, flip_scal, w_rec, vs,
            out_w=320, use_cls=False)

    timeit(f"clsrec_fwd rec-only (n={n})", nocls, iters, per=n)

    # symmetrize off
    cfg2 = SessionConfig()
    cfg2.cls.symmetrize = False
    s2 = RettoSession(cfg2, preset="mobile",
                      charset=CharacterDict(ascii_charset()))
    dp2 = s2.device_pipeline()

    def nosym():
        return dp2._clsrec_fwd(
            dp2._params["cls"], dp2._params["rec"], rgb_u8, rows,
            cls_scal, cls_flip, w_cls, rec_scal, flip_scal, w_rec, vs,
            out_w=320, use_cls=True)

    timeit(f"clsrec_fwd full (n={n}, sym=OFF)", nosym, iters, per=n)

    # isolated pieces
    xc = jnp.asarray(rng.uniform(-1, 1, (n, 3, 48, 192)).astype(np.float32))
    xr = jnp.asarray(rng.uniform(-1, 1, (n, 3, 48, 320)).astype(np.float32))
    cls_m, rec_m = dp._cls_model, dp._rec_model
    pc, pr = dp._params["cls"], dp._params["rec"]
    f_cls = jax.jit(lambda p, x: cls_m.apply(p, x))
    f_rec = jax.jit(lambda p, x: rec_m.apply(p, x))
    f_recctc = jax.jit(lambda p, x: ctc_greedy_decode(rec_m.apply(p, x)))
    timeit(f"cls fwd alone (n={n})", lambda: f_cls(pc, xc), iters, per=n)
    timeit(f"rec fwd alone (n={n})", lambda: f_rec(pr, xr), iters, per=n)
    timeit(f"rec fwd + ctc (n={n})", lambda: f_recctc(pr, xr), iters, per=n)

    vhw = jnp.asarray(np.tile([[960, 704]], (b, 1)).astype(np.int32))
    f_warp = jax.jit(lambda: warp_crops_separable(
        rgb_u8, rows, rec_scal, vhw, 48, 320))
    timeit(f"separable warp rec 48x320 (n={n})", f_warp, iters, per=n)
    f_warpc = jax.jit(lambda: warp_crops_separable(
        rgb_u8, rows, cls_scal, vhw, 48, 192))
    timeit(f"separable warp cls 48x192 (n={n})", f_warpc, iters, per=n)


if __name__ == "__main__":
    main()
