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


def test_headline_is_driver_captured():
    """VERDICT r3 #2: the README headline must come from a committed
    driver artifact (``BENCH_r*.json``), labeled in provenance — never a
    builder-local refresh presenting the better number unlabeled."""
    import json

    with open(os.path.join(ROOT, "benchmarks", "latest_bench.json")) as f:
        nums = json.load(f)
    prov = nums.get("_provenance", {}).get("headline", {})
    src = prov.get("source", "")
    assert src.startswith("BENCH_r"), (
        f"headline provenance {src!r} is not a driver artifact; refresh "
        "with `python tools/render_perf.py --import-from BENCH_rNN.json --update`"
    )
    artifact = os.path.join(ROOT, src)
    assert os.path.exists(artifact), f"provenance names missing file {src}"
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from merge_bench import load_bench

    driver = load_bench(artifact)
    assert driver["value"] == nums["value"], (
        f"headline {nums['value']} != {src}'s {driver['value']}"
    )
    assert driver["vs_baseline"] == nums["vs_baseline"]
