"""bench.py guard rails: workload detection must not self-deadlock
(ancestor exclusion), must ignore CPU pytest runs, and the wait must be a
no-op on CPU (tests run with JAX_PLATFORMS=cpu via conftest)."""

import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ancestor_pids_walks_to_init():
    b = _load_bench()
    anc = b._ancestor_pids()
    assert os.getpid() in anc
    assert os.getppid() in anc or os.getppid() <= 1


def test_other_tpu_pids_ignores_pytest_and_ancestors():
    b = _load_bench()
    # this very process is a pytest run whose cmdline could name test files
    # containing workload markers; it must never be reported
    assert all(pid != os.getpid() for pid, _ in b._other_tpu_pids())
    # a live non-ancestor workload IS reported
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import time; time.sleep(30)", "--tag", "cli.quality_bench"],
        start_new_session=True)
    try:
        time.sleep(0.3)
        found = [pid for pid, _ in b._other_tpu_pids() if pid == proc.pid]
        assert found, "detached workload with a marker cmdline not detected"
    finally:
        proc.kill()
        proc.wait()


def test_wait_is_noop_on_cpu():
    b = _load_bench()
    t0 = time.time()
    b.wait_for_exclusive_tpu()
    assert time.time() - t0 < 1.0
