#!/usr/bin/env python
"""Tunnel watchdog: wait for the TPU tunnel to come back, then run the
queued TPU jobs (interrupted by the mid-round outage) in sequence.

The axon tunnel hangs or hard-drops for minutes-to-hours at a time
(CLAUDE.md "Environment gotchas"); jobs that were mid-flight when it died
(rec/cls retrain on pipeline crops, the n=512 eval, bench) are queued here
so a recovery converts into progress without supervision.

Probes liveness in a SUBPROCESS (a hung probe must not wedge the loop),
runs each job with a hard timeout, and journals to /tmp/watchdog.log +
/tmp/watchdog_state.json.  Jobs that already completed (state file) are
not re-run; a job that fails while the tunnel is still alive is retried
once, then marked failed.

Usage: python tools/tunnel_watchdog.py [--probe-interval 180]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STATE = Path("/tmp/watchdog_state.json")
LOG = Path("/tmp/watchdog.log")

# (name, argv, timeout_s) — run in order; later jobs depend on earlier
# checkpoints (eval reads trained_weights/, bench reads eval'd weights).
# r5b cycle: retrain rec (small + big vocab) on INFERENCE-KERNEL crops
# (warp_crops_like_inference + the 2-tap resample-chain augmentation —
# the r5a n=512 residue is I/l stem-height confusion, a train/infer
# resample mismatch), then the full eval ladder + a bench capture.
def _wait_for(path: str) -> list:
    # caches are written via write-then-rename, so existence => complete
    return [sys.executable, "-c",
            "import time, pathlib\n"
            f"p = pathlib.Path({path!r})\n"
            "while not p.exists():\n"
            "    time.sleep(20)\n"
            "print(p, p.stat().st_size)"]


JOBS = [
    # The render pass populates /tmp/synth_cache2 in order: rec_lines,
    # rec_pipe, cls_pipe, cls_lines.  Each training job gates only on the
    # caches IT needs, so rec training + the n=512 eval overlap the cls
    # render tail instead of serializing behind the whole render.
    ("wait_rec_caches_r5b", _wait_for("/tmp/synth_cache2/rec_pipe.npz"),
     10800),
    ("train_rec_r5b",
     [sys.executable, "tools/train_synthetic.py", "rec", "--steps", "30000",
      "--data-cache", "/tmp/synth_cache2"], 7200),
    # fused protocol: ~3 min at n=512 vs ~18 min for sequential
    # session.run over the tunnel (same render stream + oracle metrics)
    ("eval512_r5b",
     [sys.executable, "tools/eval_accuracy.py", "512", "--tpu", "--fused"],
     2400),
    # big-vocab pipeline-crop retrain next: the 39.1% through-pipeline
    # number (BASELINE.md r5) is the largest known gap the r5b kernel-crop
    # fix addresses; its expected win dwarfs a cls re-tune whose r5a
    # numbers are already the best of any round
    ("train_bigvocab_r5b",
     [sys.executable, "tools/train_bigvocab.py", "--pipe-pages", "1600"],
     5400),
    ("eval_bigvocab_r5b",
     [sys.executable, "tools/eval_bigvocab_pipeline.py", "256", "--tpu"],
     2400),
    ("eval_heldout_r5b",
     [sys.executable, "tools/eval_heldout.py", "256", "--tpu"], 4500),
    # cls retrain last: deadline-sacrificed first if the round runs out
    # (ClsDeviceData.build's 2-tap fix is committed; the retrain that
    # exercises it renders its caches in-job if the render pass was cut)
    ("train_cls_r5b",
     [sys.executable, "tools/train_synthetic.py", "cls",
      "--data-cache", "/tmp/synth_cache2"], 3600),
    ("eval512b_r5b",
     [sys.executable, "tools/eval_accuracy.py", "512", "--tpu", "--fused"],
     2400),
    ("bench_r5b",
     [sys.executable, "bench.py"], 3600),
]

PROBE_SRC = (
    "import numpy as np, jax.numpy as jnp;"
    "print('alive', np.asarray(jnp.zeros(())+1))"
)


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with LOG.open("a") as f:
        f.write(line + "\n")


def load_state() -> dict:
    if STATE.exists():
        try:
            return json.loads(STATE.read_text())
        except Exception:
            pass
    return {"done": [], "failed": []}


def save_state(st: dict) -> None:
    STATE.write_text(json.dumps(st))


def tunnel_alive(timeout: float = 150.0) -> bool:
    # generous timeout: the probe subprocess pays a jax import (~30-60 s
    # when the single host core is contended by render/test jobs), and a
    # starved probe must not misread a live tunnel as down
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            timeout=timeout, capture_output=True, cwd=str(REPO),
        )
        return r.returncode == 0 and b"alive" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def archive_job(name: str, out: Path, status: str) -> None:
    """Copy the job log into the repo and commit it: eval/train results must
    survive the session ending mid-ladder (the round-5a restart lost the
    queued r5b results because they lived only in /tmp)."""
    try:
        dst = REPO / "evidence" / "r5b" / f"{name}.log"
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_bytes(out.read_bytes() if out.exists() else b"")
        for cmd in (["git", "add", "evidence/r5b", "trained_weights"],
                    ["git", "commit", "-m",
                     f"r5b ladder evidence: {name} ({status})"]):
            subprocess.run(cmd, cwd=str(REPO), capture_output=True,
                           timeout=60)
        log(f"job {name}: archived -> {dst} ({status})")
    except Exception as e:  # noqa: BLE001 - archival must never kill the loop
        log(f"job {name}: archive failed: {e}")


def run_job(name: str, argv: list[str], timeout: int) -> bool:
    out = Path(f"/tmp/watchdog_{name}.log")
    log(f"job {name}: start (timeout {timeout}s, log {out})")
    with out.open("w") as f:
        try:
            r = subprocess.run(argv, stdout=f, stderr=subprocess.STDOUT,
                               timeout=timeout, cwd=str(REPO))
        except subprocess.TimeoutExpired:
            log(f"job {name}: TIMEOUT after {timeout}s")
            archive_job(name, out, "timeout")
            return False
    log(f"job {name}: exit {r.returncode}")
    archive_job(name, out, f"exit {r.returncode}")
    return r.returncode == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-interval", type=float, default=180.0)
    ap.add_argument("--deadline-epoch", type=float, default=0.0,
                    help="unix time after which no job may run or keep "
                         "running: the driver's end-of-round bench needs a "
                         "quiet host+TPU, so the ladder must be silent then")
    args = ap.parse_args()
    st = load_state()
    log(f"watchdog up; state={st}")
    while True:
        if args.deadline_epoch and time.time() > args.deadline_epoch - 120:
            log("deadline reached; exiting so the round-end bench is quiet")
            return
        pending = [j for j in JOBS
                   if j[0] not in st["done"] and j[0] not in st["failed"]]
        if not pending:
            log("all jobs done; idling (liveness journal only)")
        alive = tunnel_alive()
        log(f"tunnel {'ALIVE' if alive else 'down'}")
        if alive and pending:
            for name, argv, tmo in pending:
                if args.deadline_epoch:
                    left = int(args.deadline_epoch - time.time()) - 60
                    if left < 180:
                        log(f"job {name}: skipped (deadline)")
                        continue
                    tmo = min(tmo, left)
                ok = run_job(name, argv, tmo)
                if not ok:
                    if tunnel_alive():
                        log(f"job {name}: retrying once (tunnel still up)")
                        ok = run_job(name, argv, tmo)
                    else:
                        log(f"job {name}: tunnel died mid-job; re-queueing")
                        break  # back to probe loop, job stays pending
                if ok:
                    st["done"].append(name)
                elif tunnel_alive():
                    st["failed"].append(name)  # real failure, don't loop
                else:
                    break
                save_state(st)
        time.sleep(args.probe_interval)


if __name__ == "__main__":
    main()
