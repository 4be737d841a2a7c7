#!/usr/bin/env python
"""Per-stage device-time probe for the DevicePipeline jitted kernels.

Times each jitted function in isolation (sync via scalar fetch) on the
bench config-3 shape, so the run_many wall time can be attributed to
upload / det / score / clsrec / fetches.  The per-stage accounting the
round-1 verdict asked for (VERDICT.md "What's weak" #1).
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

REPO = Path(__file__).parent.parent
WEIGHTS = REPO / "trained_weights"


def sync(x=None):
    if x is None:
        np.asarray(jnp.zeros(()))
    else:
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])


def timeit(label, fn, iters=5):
    fn()  # warm
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main() -> None:
    from retto_tpu.config import SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.session import RettoSession
    from retto_tpu.train.synth import render_page

    transfer = sys.argv[1] if len(sys.argv) > 1 else "yuv420"
    chars = CharacterDict((WEIGHTS / "charset.txt").read_text().splitlines())
    cfg = SessionConfig()
    cfg.engine.transfer_format = transfer
    session = RettoSession(
        cfg, preset="mobile", charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    dp = session.device_pipeline()
    rng = np.random.default_rng(0)
    pages = [
        render_page(rng, session.chars, h=960, w=704, max_lines=6,
                    lh_range=(24, 48))[0]
        for _ in range(8)  # one chunk
    ]
    # run once to compile everything + get real crop workload
    dp.run_many(pages)

    from retto_tpu.image.yuv import rgb_to_yuv420

    hp, wp, dh, dw = 960, 704, 1024, 768
    B = 8
    if transfer == "yuv420":
        ys = np.zeros((B, hp, wp), np.uint8)
        uvs = np.zeros((B, hp // 2, wp // 2, 2), np.uint8)
        for k, p in enumerate(pages):
            ys[k], uvs[k] = rgb_to_yuv420(p)
        host_planes = (ys, uvs)
    else:
        host_planes = (np.stack(pages),)
    vs = np.tile(np.asarray([[960, 704]], np.int32), (B, 1))
    vd = np.tile(np.asarray([[992, 736]], np.int32), (B, 1))

    # upload alone
    def up():
        return [jnp.asarray(p) for p in host_planes]

    timeit(f"upload {sum(p.nbytes for p in host_planes)/1e6:.1f}MB", up, iters=3)

    planes = tuple(jnp.asarray(p) for p in host_planes)
    vs_d, vd_d = jnp.asarray(vs), jnp.asarray(vd)

    def det():
        return dp._det_fwd(dp._params["det"], planes, vs_d, vd_d, dh=dh, dw=dw)

    timeit("det_fwd (resize+det+binarize, batch 8)", det)
    packed, pred, rgb = det()
    packed_np = np.asarray(packed)

    def fetch_mask():
        packed2, _, _ = det()
        return np.asarray(packed2)

    # mask fetch timed including the det dependency being already done
    sync()
    t0 = time.perf_counter()
    m = np.asarray(packed)
    print(f"mask fetch {m.nbytes/1e6:.2f}MB: {(time.perf_counter()-t0)*1e3:.1f} ms")

    # score: 64 candidates
    n = 64
    rows = jnp.asarray(np.zeros(n, np.int32))
    homogs = jnp.asarray(np.tile(np.eye(3, np.eye(3).shape[0], dtype=np.float32)[None], (n, 1, 1)))

    def score():
        return dp._score_fwd(pred, rows, homogs)

    timeit("score_fwd (64 cands)", score)

    # clsrec: 32 crops, width 512
    n = 32
    rows_c = jnp.asarray(np.zeros(n, np.int32))
    h = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    widths = jnp.asarray(np.full(n, 512, np.int32))
    cls_w = jnp.asarray(np.full(n, 192, np.int32))

    def clsrec(out_w=512):
        return dp._clsrec_fwd(
            dp._params["cls"], dp._params["rec"], rgb, rows_c,
            jnp.asarray(h), jnp.asarray(h), cls_w, jnp.asarray(h),
            jnp.asarray(h), widths,
            vs_d, out_w=out_w, use_cls=True,
        )

    timeit("clsrec_fwd (32 crops, w512)", clsrec)

    out = clsrec()
    sync(out)
    t0 = time.perf_counter()
    jax.device_get(out)
    print(f"clsrec fetch: {(time.perf_counter()-t0)*1e3:.1f} ms")

    # cost analysis (XLA flop estimates) if available
    try:
        lowered = jax.jit(
            lambda p, x: dp._det_model.apply(p, x)
        ).lower(dp._params["det"], jnp.zeros((8, 3, 1024, 768), jnp.float32))
        cost = lowered.compile().cost_analysis()
        if cost:
            fl = cost.get("flops")
            print(f"det model flops (batch 8): {fl/1e9:.1f} GFLOP" if fl else cost)
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
