"""Multi-host (DCN) input feeding — mesm_tpu/parallel/multihost.py.

Single-process tests pin the slicing/assembly contract on the virtual
8-device CPU mesh; the slow test launches a REAL 2-process jax.distributed
cluster on localhost (4 virtual CPU devices per process) and checks the
assembled global batch computes the same batch-global reductions as the
single-process oracle — the cross-process collective path included.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from mesm_tpu.parallel import multihost as mh
from mesm_tpu.parallel.mesh import make_mesh

HERE = os.path.dirname(os.path.abspath(__file__))


def _full_batch(B=16, L=6, D=8):
    rng = np.random.default_rng(7)
    return {
        "x": rng.standard_normal((B, L, D)).astype(np.float32),
        "mask": (rng.random((B, L)) > 0.3).astype(np.float32),
    }


def test_local_rows_partition():
    slices = [mh.local_rows(16, p, 4) for p in range(4)]
    rows = [list(range(16))[s] for s in slices]
    assert sum(rows, []) == list(range(16))  # disjoint, ordered, complete
    with pytest.raises(ValueError):
        mh.local_rows(10, 0, 4)


def test_local_view_slices_every_leaf():
    full = _full_batch()
    local = mh.local_view(full, process_index=1, process_count=4)
    assert local["x"].shape == (4, 6, 8)
    np.testing.assert_array_equal(local["x"], full["x"][4:8])
    np.testing.assert_array_equal(local["mask"], full["mask"][4:8])


def test_global_batch_single_process_matches_device_put():
    # process_count=1: local IS global; assembly must equal a sharded
    # device_put in value and in sharding layout
    mesh = make_mesh()
    full = _full_batch()
    gb = mh.global_batch(mesh, mh.local_view(full))
    assert gb["x"].shape == full["x"].shape
    np.testing.assert_array_equal(np.asarray(gb["x"]), full["x"])
    assert gb["x"].sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        ndim=3,
    )


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process():
    """2-process localhost cluster: disjoint local halves -> global batch ->
    batch-global reductions match the single-process oracle bitwise."""
    # oracle, in THIS process (8 virtual devices, process_count=1)
    full = _full_batch()
    per_row = (full["x"].sum(-1) * full["mask"]).sum(-1) / (
        full["mask"].sum(-1) + 1e-6
    )
    oracle = [float(per_row.mean()), float((per_row * per_row).sum())]

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py")],
            env=mh.launch_cpu_cluster_env(p, 2, port, devices_per_process=4),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for o in outs:
        assert o["n_processes"] == 2
        assert o["n_devices"] == 8
        np.testing.assert_allclose(o["vals"], oracle, rtol=1e-6)
