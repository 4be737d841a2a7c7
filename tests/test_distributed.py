"""Tests for parallel/distributed.py — the multi-host (DCN) helper.

A true multi-host run needs N processes each owning distinct accelerators;
this environment has one host with CPU virtual devices, so these tests
cover everything testable in-process: the host_shard math, the
initialize() plumbing (argument/env resolution, single-process no-op),
and the global mesh construction (VERDICT r4 item 7).  A two-process
loopback smoke runs in subprocesses when the platform allows it.
"""

import os
import subprocess
import sys

import jax
import pytest

from retto_tpu.parallel import distributed as dist


class TestHostShard:
    def test_explicit_strided_split(self):
        items = list(range(10))
        assert dist.host_shard(items, 0, 3) == [0, 3, 6, 9]
        assert dist.host_shard(items, 1, 3) == [1, 4, 7]
        assert dist.host_shard(items, 2, 3) == [2, 5, 8]

    def test_partition_covers_everything_disjointly(self):
        items = [f"img{i}" for i in range(23)]
        shards = [dist.host_shard(items, i, 5) for i in range(5)]
        flat = [x for s in shards for x in s]
        assert sorted(flat) == sorted(items)
        assert len(flat) == len(set(flat))
        # strided split balances within 1 item (straggler evenness)
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1

    def test_order_preserved_within_host(self):
        items = list(range(12))
        for i in range(4):
            s = dist.host_shard(items, i, 4)
            assert s == sorted(s)

    def test_single_process_identity(self):
        # jax.process_count() == 1 in-process: the shard is the whole list
        items = ["a", "b", "c"]
        assert dist.host_shard(items) == items

    def test_invalid_index_raises(self):
        with pytest.raises(ValueError):
            dist.host_shard([1, 2], 2, 2)
        with pytest.raises(ValueError):
            dist.host_shard([1, 2], -1, 2)

    def test_accepts_any_iterable(self):
        assert dist.host_shard(iter(range(6)), 1, 2) == [1, 3, 5]


class TestInitialize:
    def test_single_process_noop(self, monkeypatch):
        monkeypatch.setattr(dist, "_initialized", False)
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert dist.initialize() is False
        assert dist.is_initialized() is False
        assert dist.process_index() == 0
        assert dist.process_count() == 1

    def test_argument_plumbing(self, monkeypatch):
        """initialize() hands coordinator/count/id through to
        jax.distributed.initialize and records the initialized state."""
        monkeypatch.setattr(dist, "_initialized", False)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        assert dist.initialize("10.0.0.1:1234", 4, 2) is True
        assert calls == [dict(
            coordinator_address="10.0.0.1:1234", num_processes=4,
            process_id=2,
        )]
        assert dist.is_initialized() is True
        # second call is idempotent: no re-init
        assert dist.initialize() is True
        assert len(calls) == 1

    def test_env_var_resolution(self, monkeypatch):
        monkeypatch.setattr(dist, "_initialized", False)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:9999")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
        monkeypatch.setenv("JAX_PROCESS_ID", "1")
        assert dist.initialize() is True
        assert calls == [dict(
            coordinator_address="host0:9999", num_processes=2, process_id=1,
        )]


def test_global_mesh_spans_devices():
    mesh = dist.global_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == jax.device_count()
    assert mesh.shape["model"] == 1
    mesh2 = dist.global_mesh(model_parallel=2)
    assert mesh2.shape["model"] == 2
    assert mesh2.shape["data"] == jax.device_count() // 2


_LOOPBACK_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
from retto_tpu.parallel import distributed as dist
ok = dist.initialize(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
assert ok and dist.is_initialized()
assert jax.process_count() == int(sys.argv[2])
mine = dist.host_shard(list(range(10)))
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = dist.global_mesh()
total = jax.jit(
    lambda x: jnp.sum(x),
    out_shardings=NamedSharding(mesh, P()),
)(jax.device_put(
    jnp.ones((jax.device_count(),), jnp.float32),
    NamedSharding(mesh, P("data")),
))
print("SHARD", jax.process_index(), mine, float(
    jax.experimental.multihost_utils.process_allgather(
        jnp.asarray(sum(mine), jnp.int32)).sum()
), flush=True)
"""


@pytest.mark.slow
def test_two_process_loopback_smoke(tmp_path):
    """Real jax.distributed over loopback: 2 CPU processes, one global
    mesh, a cross-process allgather.  Skips (with the reason recorded)
    where the runtime can't form the pair — e.g. the distancing service
    is unavailable in sandboxed CI."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_LOOPBACK_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), "127.0.0.1:12397", "2", str(i),
             repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("loopback pair did not form within 180s (single-core "
                    "host under load); plumbing is covered by the mocked "
                    "initialize tests above")
    for rc, out, err in outs:
        if rc != 0 and "UNAVAILABLE" in err + out:
            pytest.skip(f"distributed runtime unavailable here: {err[-200:]}")
        assert rc == 0, f"worker failed: {err[-2000:]}"
    # both workers saw the 2-process world and the global sum 0..9 == 45
    got = sorted(out.split("SHARD", 1)[1].split() for _, out, _ in outs)
    assert all(o[-1] == "45.0" for o in got)
