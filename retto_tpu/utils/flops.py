"""FLOP / MFU accounting for jitted functions.

VERDICT r2 item 1: per-op time alone cannot say whether a kernel is fast —
it must be compared to the chip's peak.  ``cost_of`` pulls XLA's static
cost analysis (FLOPs + HBM traffic) from a compiled function;
``mfu`` converts a measured wall time into model-FLOPs-utilization given
the device peak.

Peak numbers: TPU v5e (the bench chip) — 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

from typing import Any

import jax

__all__ = ["PEAKS", "cost_of", "mfu", "device_peak_flops"]

# (peak dense FLOP/s at bf16, HBM bytes/s)
PEAKS: dict[str, tuple[float, float]] = {
    "v5e": (197e12, 819e9),
    "v5lite": (197e12, 819e9),  # device_kind "TPU v5 lite0"
    "v4": (275e12, 1228e9),
    "cpu": (1e11, 5e10),  # order-of-magnitude only (host fallback)
}


def device_peak_flops(device=None) -> tuple[float, float]:
    """(peak_flops, peak_bytes) for ``device`` (default: first device)."""
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower().replace(" ", "")
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return PEAKS["cpu"]


def cost_of(fn, *args, **kwargs) -> dict[str, Any]:
    """Compile ``fn`` (jitted or plain) for the given args and return XLA's
    static cost analysis: {"flops": float, "bytes": float}.  Returns zeros
    when the backend offers no analysis."""
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        compiled = jfn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        cost = cost or {}
        return {
            "flops": float(cost.get("flops", 0.0)),
            "bytes": float(cost.get("bytes accessed", 0.0)),
        }
    except Exception:  # noqa: BLE001 - accounting must never break the run
        return {"flops": 0.0, "bytes": 0.0}


def mfu(flops: float, seconds: float, device=None) -> float:
    """Model-FLOPs-utilization of a measured run (0..1)."""
    if seconds <= 0 or flops <= 0:
        return 0.0
    peak, _ = device_peak_flops(device)
    return flops / seconds / peak
