"""Multi-process --distributed smoke (SURVEY §2.8 item 1; VERDICT r1 weak #5).

The reference scales across hosts via Lightning DDP's env:// rendezvous
(reference train.py:170 ``gpus`` arg); our analogue is
``jax.distributed.initialize`` behind cli/common.maybe_init_distributed.
This test actually runs it: two OS processes, 4 forced-CPU devices each,
one global ('data',) mesh of 8 — and asserts the cross-process train step
reproduces the single-process 8-device result on the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "dist_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nprocs: int, tmp_path) -> dict:
    out = tmp_path / f"dist_{nprocs}.json"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nprocs), str(port), str(out)],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nprocs)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    with open(out) as f:
        return json.load(f)


def _run_retry(nprocs: int, tmp_path, attempts: int = 2) -> dict:
    for attempt in range(attempts):
        try:
            return _run(nprocs, tmp_path)
        except (AssertionError, subprocess.TimeoutExpired):
            if attempt == attempts - 1:
                raise
            print(f"distributed run nprocs={nprocs} failed, retrying once")
    raise RuntimeError("unreachable")


@pytest.mark.xslow
def test_two_process_train_step_matches_single_process(tmp_path):
    ref = _run_retry(1, tmp_path)
    dist = _run_retry(2, tmp_path)
    assert np.isclose(ref["loss"], dist["loss"], rtol=1e-5, atol=1e-6), (
        ref, dist,
    )
    assert np.isclose(ref["pnorm"], dist["pnorm"], rtol=1e-5, atol=1e-6), (
        ref, dist,
    )
