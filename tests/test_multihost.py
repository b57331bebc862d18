"""Real multi-process coverage for the multi-host layer: a 2-process
``jax.distributed`` CPU group exercising ``allreduce_counts``'s
``process_allgather`` branch and FERSweep's per-host trial sharding."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys
import jax

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.harness import FERSweep
from ldpcdecoders_tpu.parallel.multihost import allreduce_counts, global_mesh

assert jax.process_count() == 2
red = allreduce_counts({"x": pid + 1, "y": 10}, global_mesh())

H = lt.parity_check_matrix(48, 6, 3, rng=7)
sweep = FERSweep(
    H, lambda per: lt.BeliefPropagationDecoder(H, per, 20), [0.05],
    batch=16, seed=3,
)
assert sweep.multihost is None  # detection is deferred past __init__
# max_seconds exercises the collective stop vote (local clocks diverge
# across processes, so the cutoff must be agreed on, not decided locally)
res = sweep.run(trials_per_point=40, max_seconds=300.0)
assert sweep.multihost is True  # auto-detected from the process group at run()
print("RESULT " + json.dumps({"pid": pid, "red": red, "sweep": res[0.05]}))
"""


_STAGED_WORKER = r"""
import json, sys
import jax

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
from ldpcdecoders_tpu.models.staged import StagedDemDecoder
from ldpcdecoders_tpu.native import native_available
from ldpcdecoders_tpu.parallel import staged_local_eval
from ldpcdecoders_tpu.parallel.multihost import global_mesh

if not native_available():
    print("RESULT " + json.dumps({"pid": pid, "skip": True}))
    sys.exit(0)
assert jax.process_count() == 2
rng = np.random.default_rng(0)
A = (rng.random((40, 300)) < 0.08).astype(np.uint8)
A[:, A.sum(axis=0) == 0] = 1
pr = np.clip(rng.random(300) * 0.02, 1e-4, 0.02)
O = (rng.random((3, 300)) < 0.1).astype(np.uint8)
dec = StagedDemDecoder(
    A, pr, observables=O, gammas=(0.3, (-0.24, 0.66)),
    stage0_iters=16, deep_iters=64, lam=20, relay_legs=1, check_every=8)
# per-host staged evaluation: each process pools its OWN stragglers and
# runs the native host OSD locally; only counts cross the process group
st = staged_local_eval(dec, 256, global_mesh(), seed=7, batch=128,
                       deep_bucket=32)
print("RESULT " + json.dumps({
    "pid": pid, "skip": False, "shots": st["shots"], "fails": st["fails"],
    "local_shots": st["local"]["shots"], "processes": st["processes"],
    "deep": st["deep_shots"], "osd": st["osd_shots"]}))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allreduce_and_sweep(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,  # drops the axon sitecustomize -> plain CPU
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        # process_allgather branch: 1 + 2 = 3, 10 + 10 = 20
        assert o["red"] == {"x": 3, "y": 20}
        # per-host trial sharding: every process reports the GLOBAL totals
        assert o["sweep"]["trials"] == 40
    # and the globally-reduced statistics agree across processes
    assert by_pid[0]["sweep"]["ler"] == by_pid[1]["sweep"]["ler"]
    assert (
        by_pid[0]["sweep"]["converged_fraction"]
        == by_pid[1]["sweep"]["converged_fraction"]
    )


def test_two_process_staged_eval(tmp_path):
    """VERDICT r4 item 3: the staged production tier under a 2-process
    jax.distributed group — each process pools its own stragglers and
    runs the native host OSD locally; counts all-reduce globally."""
    worker = tmp_path / "staged_worker.py"
    worker.write_text(_STAGED_WORKER)
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,  # drops the axon sitecustomize -> plain CPU
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"staged worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))
    if any(o.get("skip") for o in outs):
        import pytest

        pytest.skip("native host OSD unavailable in worker")
    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        # every process reports the GLOBAL totals (2 x 128 local shots)
        assert o["shots"] == o["local_shots"] * 2
        assert o["processes"] == 2
    # the reduced statistics agree across processes
    assert by_pid[0]["fails"] == by_pid[1]["fails"]
    assert by_pid[0]["deep"] == by_pid[1]["deep"]
