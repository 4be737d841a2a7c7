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
# r4b cycle: photometric-augmented retrains (gain/bias/noise + JPEG
# round-trips — the held-out conditions AND the bf16-ULP DC robustness
# the TPU divergence post-mortem demands), then the full eval ladder.
JOBS = [
    ("train_det",
     [sys.executable, "tools/train_synthetic.py", "det"], 3600),
    # rec/cls read /tmp/synth_cache2, which a host-side `render` pass
    # populates concurrently — block until it stamps rc= so a training
    # job never reads a half-written npz
    ("wait_render",
     [sys.executable, "-c",
      "import time, pathlib\n"
      "p = pathlib.Path('/tmp/render_r4b.log')\n"
      "while 'rc=' not in (p.read_text() if p.exists() else ''):\n"
      "    time.sleep(30)\n"
      "print(p.read_text().splitlines()[-1])"], 10800),
    ("train_rec",
     [sys.executable, "tools/train_synthetic.py", "rec", "--steps", "30000",
      "--data-cache", "/tmp/synth_cache2"], 5400),
    ("train_cls",
     [sys.executable, "tools/train_synthetic.py", "cls",
      "--data-cache", "/tmp/synth_cache2"], 3600),
    ("eval512",
     [sys.executable, "tools/eval_accuracy.py", "512", "--tpu"], 4500),
    ("eval_heldout",
     [sys.executable, "tools/eval_heldout.py", "256", "--tpu"], 4500),
    ("eval_bigvocab",
     [sys.executable, "tools/eval_bigvocab_pipeline.py", "256", "--tpu"],
     2400),
    # server tier (BASELINE config 4, VERDICT r4 item 6): efficiency
    # checkpoints — enough training to produce real boxes/crops at scan
    # resolution so the e2e number measures representative pipeline work
    ("train_det_server",
     [sys.executable, "tools/train_synthetic.py", "det",
      "--preset", "server", "--steps", "4000"], 5400),
    ("train_rec_server",
     [sys.executable, "tools/train_synthetic.py", "rec",
      "--preset", "server", "--steps", "16000",
      "--data-cache", "/tmp/synth_cache2"], 7200),
    ("bench",
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


def run_job(name: str, argv: list[str], timeout: int) -> bool:
    out = Path(f"/tmp/watchdog_{name}.log")
    log(f"job {name}: start (timeout {timeout}s, log {out})")
    with out.open("w") as f:
        try:
            r = subprocess.run(argv, stdout=f, stderr=subprocess.STDOUT,
                               timeout=timeout, cwd=str(REPO))
        except subprocess.TimeoutExpired:
            log(f"job {name}: TIMEOUT after {timeout}s")
            return False
    log(f"job {name}: exit {r.returncode}")
    return r.returncode == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-interval", type=float, default=180.0)
    args = ap.parse_args()
    st = load_state()
    log(f"watchdog up; state={st}")
    while True:
        pending = [j for j in JOBS
                   if j[0] not in st["done"] and j[0] not in st["failed"]]
        if not pending:
            log("all jobs done; idling (liveness journal only)")
        alive = tunnel_alive()
        log(f"tunnel {'ALIVE' if alive else 'down'}")
        if alive and pending:
            for name, argv, tmo in pending:
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
