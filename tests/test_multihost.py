"""Multi-host (DCN) path: two real jax.distributed processes on CPU.

Round 1 wrapped ``jax.distributed.initialize`` but never executed it.  This
test spawns two OS processes (``tools/check_multihost.py``), each owning 4
forced-CPU devices of a global 8-device mesh, runs a sharded chain batch
with a cross-process reduction, and checks both processes agree with each
other *and* bitwise with a single-process run of the same seeds (chain
streams are counter-based, so device placement must not matter).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N, N_STEPS, N_CHAINS = 5, 500, 8


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
    )
    outs = [f"/tmp/mcqueens_mh_{port}_{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tools.check_multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--out", outs[i],
             "--n", str(N), "--n-steps", str(N_STEPS),
             "--n-chains", str(N_CHAINS)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
        os.unlink(path)

    for r in results:
        assert r["n_processes"] == 2
        assert r["n_devices"] == 8
        assert r["n_local_devices"] == 4
    assert results[0]["final_energy"] == results[1]["final_energy"]
    assert results[0]["min_energy"] == results[1]["min_energy"]

    # Single-process ground truth (same seeds, same counter-based streams).
    from mcqueens.chain.spec import ChainSpec
    from mcqueens.core.schedules import build_schedule
    from mcqueens.dist import runner

    spec = ChainSpec(
        N=N,
        n_steps=N_STEPS,
        schedule=build_schedule("linear_annealing", N_STEPS,
                                beta_start=0.5, beta_end=3.0),
        init_mode="random",
        mcmc_type="board",
        kernel="tables",
        history_stride=N_STEPS,
    )
    res = runner.run_chains(np.arange(N_CHAINS, dtype=np.uint32), spec)
    np.testing.assert_array_equal(
        np.asarray(results[0]["final_energy"]), res.final_energy
    )
    assert results[0]["min_energy"] == int(res.final_energy.min())
    assert results[0]["sum_energy"] == int(res.final_energy.sum())


def test_init_distributed_raises_on_real_failure():
    """Misconfiguration must abort loudly, not continue single-host."""
    from mcqueens.dist import mesh as mesh_mod

    with pytest.raises(Exception):
        mesh_mod.init_distributed(
            coordinator_address="256.0.0.1:1",  # invalid address
            num_processes=2,
            process_id=0,
            initialization_timeout=2,
        )
