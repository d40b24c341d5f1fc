"""ThreadSanitizer stress of the threaded native edge (tools/edge_tsan.cpp):
concurrent sender+reader host threads + internal worker pools over mixed
CM/GCM SRTP legs must produce zero data races and zero auth failures.
Proves the mixed-fleet concurrency shape (FleetTicker members calling the
edge from separate threads) is race-free, matching the reference's
per-stream-ticker threading (msticker.c:448)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_threaded_edge_tsan_clean(tmp_path):
    exe = str(tmp_path / "edge_tsan")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=thread", "-march=native",
         "-pthread", os.path.join(ROOT, "tools", "edge_tsan.cpp"),
         os.path.join(ROOT, "mediastreamer2_tpu", "native", "rtp_edge.cpp"),
         "-o", exe, "-ldl"],
        capture_output=True, text=True, timeout=180)
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[:200]}")
    for extra in ({}, {"EDGE_TSAN_GSO": "1"}):
        run = subprocess.run(
            [exe], capture_output=True, text=True, timeout=120,
            env={**os.environ, "EDGE_TSAN_THREADS": "3", **extra})
        sys.stderr.write(run.stdout + run.stderr)
        assert run.returncode == 0, run.stderr[:500]
        assert "WARNING: ThreadSanitizer" not in run.stderr
        assert "got=" in run.stdout and "auth_fail=0" in run.stdout
