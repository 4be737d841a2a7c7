#!/usr/bin/env python
"""Det-forward compute probe: times + FLOPs + MFU for det model variants.

The r2 verdict's top item: det fwd at ~9 ms/img caps the whole design.
This probe times, on the real chip (or CPU for shape checks):

* the full fused det_fwd (resize + model + binarize + pack + pool)
* the model forward alone
* the device resize alone
* model variants (old mobilenetv3 backbone vs the dense TpuBackbone,
  stride-1 vs stride-2 head)

and prints FLOPs (XLA cost analysis) + achieved MFU for each.

Usage: python tools/det_probe.py [--batch 8] [--h 1024] [--w 768]
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
        np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(label, fn, flops=0.0, iters=5):
    from retto_tpu.utils.flops import mfu

    out = fn()  # warm/compile
    sync(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    msg = f"{label}: {best*1e3:.2f} ms"
    if flops:
        msg += f"  ({flops/1e9:.1f} GF, MFU {mfu(flops, best)*100:.1f}%)"
    print(msg, flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=768)
    ap.add_argument("--variants", action="store_true",
                    help="also time backbone variants")
    ap.add_argument("--submodules", action="store_true",
                    help="time backbone/FPN/head separately + width/batch "
                         "experiments (MFU-gap localization)")
    ap.add_argument("--v2", action="store_true",
                    help="time TpuBackboneV2 (stride-8-native, all-x128 "
                         "widths, sub-pixel head) candidate configs")
    args = ap.parse_args()
    b, h, w = args.batch, args.h, args.w

    from retto_tpu.models import build_det
    from retto_tpu.models.dbnet import DetModel
    from retto_tpu.utils.flops import cost_of
    from retto_tpu.weights import init_random_params

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"probe shape: [{b}, 3, {h}, {w}]")

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (b, 3, h, w)).astype(np.float32)
    )

    def bench_model(label, model, raw=True):
        params = init_random_params(model, jnp.zeros((1, 3, 64, 64)))
        kw = {"raw": True} if raw and getattr(model, "out_stride", 1) > 1 else {}
        fn = jax.jit(lambda p, x: model.apply(p, x, **kw))
        c = cost_of(fn, params, x)
        dt = timeit(label, lambda: fn(params, x), flops=c["flops"])
        return dt

    if args.v2:
        for label, kw in (
            ("v2-lean w(128,256,384) d(1,1,1)",
             dict(widths=(128, 256, 384), depths=(1, 1, 1))),
            ("v2-mid w(128,256,384) d(2,2,2)",
             dict(widths=(128, 256, 384), depths=(2, 2, 2))),
            ("v2-wide w(256,384,512) d(1,2,2)",
             dict(widths=(256, 384, 512), depths=(1, 2, 2))),
        ):
            m = DetModel(backbone="tpu_v2", inner_ch=128, head_ch=128,
                         out_stride=2, dtype=jnp.bfloat16, **kw)
            for bb in (b, 16):
                from retto_tpu.weights import init_random_params

                params = init_random_params(m, jnp.zeros((1, 3, 64, 64)))
                xb = jnp.asarray(np.random.default_rng(0).uniform(
                    -1, 1, (bb, 3, h, w)).astype(np.float32))
                fn = jax.jit(lambda p, x, m=m: m.apply(p, x, raw_logits=True))
                c = cost_of(fn, params, xb)
                dt = timeit(f"{label} (batch {bb})",
                            lambda: fn(params, xb), flops=c["flops"])
                print(f"  -> {dt/bb*1e3:.3f} ms/img")
        return

    # flagship: mobile preset (TpuBackbone, stride-2 head)
    det = build_det("mobile", compute_dtype="bfloat16")
    bench_model(f"mobile tpu-bb s{det.out_stride} raw (batch {b})", det)
    bench_model("mobile tpu-bb full-res contract", det, raw=False)

    if args.variants:
        old = DetModel(backbone="mobilenetv3", backbone_scale=0.5,
                       inner_ch=96, head_ch=96, out_stride=2,
                       dtype=jnp.bfloat16)
        bench_model("mobilenetv3-bb x0.5 s2 raw", old)
        s1 = DetModel(widths=(64, 128, 192, 256), depths=(1, 2, 2, 2),
                      inner_ch=128, head_ch=64, out_stride=1,
                      dtype=jnp.bfloat16)
        bench_model("tpu-bb s1 (full-res head)", s1)

    # the fused det_fwd as the pipeline runs it (resize included)
    from retto_tpu.config import SessionConfig
    from retto_tpu.ops.charset import CharacterDict, ascii_charset
    from retto_tpu.pipeline.session import RettoSession

    cfg = SessionConfig()
    session = RettoSession(cfg, preset="mobile",
                           charset=CharacterDict(ascii_charset()))
    dp = session.device_pipeline()
    ys = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (b, 960, 704), np.uint8)
    )
    vs = jnp.asarray(np.tile(np.asarray([[960, 704]], np.int32), (b, 1)))
    vd = jnp.asarray(np.tile(np.asarray([[992, 736]], np.int32), (b, 1)))

    def det_fwd():
        return dp._det_fwd(dp._params["det"], (ys,), vs, vd,
                           dh=h, dw=w, fmt="gray")

    dt = timeit(f"det_fwd gray fused (resize+fwd+pack+pool, batch {b})",
                det_fwd)
    print(f"  -> {dt/b*1e3:.2f} ms/img")

    if args.submodules:
        _submodules(det, b, h, w)


def _submodules(det, b, h, w) -> None:
    """Localize the MFU gap: time backbone / FPN / head separately, a
    doubled-width variant (same time => bandwidth-bound, 2x time =>
    MXU-bound), and batch 16."""
    from flax import linen as _nn

    from retto_tpu.models.dbnet import DBFPN, DBHead, DetModel, TpuBackbone
    from retto_tpu.utils.flops import cost_of

    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))

    # batch 16 full model FIRST: the highest-leverage number — under
    # remote-compile queue load later submodule compiles may never run
    x16 = jnp.asarray(rng.uniform(-1, 1, (16, 3, h, w)).astype(np.float32))
    from retto_tpu.weights import init_random_params

    params = init_random_params(det, jnp.zeros((1, 3, 64, 64)))
    fn = jax.jit(lambda p, x: det.apply(p, x, raw=True))
    c = cost_of(fn, params, x16)
    dt = timeit("full det raw, batch 16", lambda: fn(params, x16),
                flops=c["flops"])
    print(f"  -> {dt/16*1e3:.2f} ms/img")

    bb = TpuBackbone(widths=tuple(det.widths), depths=tuple(det.depths),
                     dtype=jnp.bfloat16)
    pb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    f_bb = jax.jit(lambda p, x: bb.apply(p, x))
    c = cost_of(f_bb, pb, xh)
    timeit(f"backbone only (batch {b})", lambda: f_bb(pb, xh),
           flops=c["flops"])

    feats = jax.jit(lambda p, x: bb.apply(p, x))(pb, xh)
    fpn = DBFPN(det.inner_ch, det.inner_ch // 4, dtype=jnp.bfloat16)
    pf = fpn.init(jax.random.PRNGKey(0),
                  [jnp.zeros((1, 32 >> i, 32 >> i, c_.shape[-1]))
                   for i, c_ in enumerate(feats)])
    f_fpn = jax.jit(lambda p, fs: fpn.apply(p, fs))
    c = cost_of(f_fpn, pf, list(feats))
    timeit("fpn only", lambda: f_fpn(pf, list(feats)), flops=c["flops"])

    fused = jax.jit(lambda p, fs: fpn.apply(p, fs))(pf, list(feats))
    head = DBHead(det.head_ch, det.out_stride, dtype=jnp.bfloat16)
    ph = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, fused.shape[-1])))
    f_h = jax.jit(lambda p, x: head.apply(p, x))
    c = cost_of(f_h, ph, fused)
    timeit("head only (incl. bilinear logit upsample)", lambda: f_h(ph, fused),
           flops=c["flops"])

    # NHWC bf16 straight in (no NCHW boundary, no f32 input read)
    xbf = xh.astype(jnp.bfloat16)
    c = cost_of(f_bb, pb, xbf)
    timeit(f"backbone, bf16 NHWC input (batch {b})", lambda: f_bb(pb, xbf),
           flops=c["flops"])

    # doubled widths: 4x FLOPs — if time ~2x, we're MXU-bound; ~1x, bandwidth
    bb2 = TpuBackbone(widths=tuple(int(2 * v) for v in det.widths),
                      depths=tuple(det.depths), dtype=jnp.bfloat16)
    pb2 = bb2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    f_bb2 = jax.jit(lambda p, x: bb2.apply(p, x))
    c = cost_of(f_bb2, pb2, xh)
    timeit(f"backbone 2x widths (batch {b})", lambda: f_bb2(pb2, xh),
           flops=c["flops"])



if __name__ == "__main__":
    main()
