"""Docs ↔ measured-numbers sync gate (VERDICT r2 #6).

The README/ARCHITECTURE performance blocks are GENERATED from the committed
``benchmarks/latest_bench.json`` by ``tools/render_perf.py``; this test
fails whenever they drift, so stale perf claims can't ship again.  Refresh:

    python tools/render_perf.py --import-from BENCH_rNN.json --update
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_docs_match_committed_numbers():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "render_perf.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
