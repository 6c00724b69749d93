#!/usr/bin/env python
"""Merge bench runs into ``benchmarks/latest_bench.json`` stage-by-stage.

VERDICT r3 #1: one bad relay window used to blank every d2h-verified
column of the committed artifact — the whole JSON was replaced wholesale.
This tool merges instead: each STAGE of a new run only replaces the
committed stage when doing so does not trade a verified (materialized /
d2h-fetched) measurement for an unverified upper bound.  Per-stage
provenance (source artifact, date, verified flag) is recorded under
``_provenance`` so the docs renderer can show where every number came
from.

Verified-ness per stage:
  - windows / window_kernels: ``materialized: true``
  - window_parity: ``parity: true`` (the fetch is the attestation)
  - device_roofline: produced by the chained-scan + d2h-fetch design
  - host-side stages (whole_genome, fasta, storage, cohort, tokenizer,
    parse_encode_stats, headline value): always verified — they never
    depend on the relay acking honestly.

Usage:
    python tools/merge_bench.py BENCH_r04.json                  # merge driver artifact
    python tools/merge_bench.py my_run.json --source local-tpu  # label a local run
    python tools/merge_bench.py run.json --headline             # also take the headline
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANONICAL = os.path.join(ROOT, "benchmarks", "latest_bench.json")

#: stage name -> the top-level keys it owns in the bench JSON line
STAGES: dict[str, tuple[str, ...]] = {
    "headline": ("metric", "value", "unit", "vs_baseline", "note"),
    "windows": (
        "windows_per_sec",
        "windows_per_sec_onehot",
        "windows_materialized",
    ),
    "window_kernels": ("window_kernels",),
    "windows_chain": ("windows_chain",),
    "window_parity": ("window_parity", "window_kernel_parity"),
    "decode12": ("decode12", "decode12_xla_vps", "decode12_pallas_vps"),
    "device_roofline": ("device_roofline",),
    "tokenizer": ("tokenizer",),
    "train": ("train",),
    "whole_genome": ("whole_genome",),
    "cohort": ("cohort_donor_variants_per_sec",),
    "fasta": ("fasta",),
    "storage": ("storage",),
    "parse_encode_stats": ("parse_encode_stats",),
}


def load_bench(path: str) -> dict:
    """Load a bench JSON: raw line, pretty file, or driver wrapper (whose
    ``parsed`` may be null — then the JSON line is extracted from the
    captured ``tail``)."""
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data or "tail" in data:  # driver wrapper
        if data.get("parsed"):
            return data["parsed"]
        lines = str(data.get("tail", "")).splitlines()
        for line in reversed(lines):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        # the wrapper captures only the LAST bytes of stdout, so the JSON
        # line's head can be cut off mid-string; the schema's fixed
        # headline prefix lets it be reconstructed from `"value":` on
        for line in reversed(lines):
            i = line.find('"value":')
            if i < 0:
                continue
            candidate = (
                '{"metric": "variants/sec/chip (parse+encode)", ' + line[i:]
            )
            try:
                return json.loads(candidate)
            except json.JSONDecodeError:
                continue
        raise SystemExit(f"{path}: driver wrapper has no parsable JSON line")
    return data


def stage_present(nums: dict, stage: str) -> bool:
    return any(k in nums for k in STAGES[stage])


def _shootout_valid(d: dict | None) -> bool:
    """A kernel shoot-out where every contender errored (vps 0) must not
    replace real numbers."""
    if not isinstance(d, dict):
        return False
    return any(
        isinstance(v, dict) and v.get("vps", v.get("windows_per_sec", 0)) > 0
        for v in d.values()
    )


def stage_degenerate(nums: dict, stage: str) -> bool:
    """True when the stage carries no real measurement at all (every
    contender errored to 0, or only a skip note) — such a stage never
    merges, even over an empty slot."""
    if stage in ("decode12", "tokenizer"):
        return not _shootout_valid(nums.get(stage))
    if stage == "window_kernels":
        return not _shootout_valid(nums.get("window_kernels"))
    if stage == "windows_chain":
        return not _shootout_valid(nums.get("windows_chain"))
    if stage == "windows":
        return not nums.get("windows_per_sec")
    if stage == "cohort":
        return not nums.get("cohort_donor_variants_per_sec")
    if stage == "window_parity":
        wp = nums.get("window_parity")
        return not (isinstance(wp, dict) and wp.get("kernels"))
    if stage == "device_roofline":
        dr = nums.get("device_roofline")
        return not (isinstance(dr, dict) and "gb_per_sec" in dr)
    if stage == "train":
        t = nums.get("train")
        return not (isinstance(t, dict) and t.get("steps_per_sec", 0) > 0)
    if stage == "headline":
        return not nums.get("value")
    return False


def stage_verified(nums: dict, stage: str) -> bool:
    """Is this stage's measurement d2h-verified (relay cannot have faked
    it) AND non-degenerate?  Host-side stages count as verified when they
    carry real numbers."""
    if stage == "windows":
        return bool(nums.get("windows_materialized")) and bool(
            nums.get("windows_per_sec")
        )
    if stage == "window_kernels":
        wk = nums.get("window_kernels")
        return (
            isinstance(wk, dict)
            and bool(wk.get("materialized"))
            and _shootout_valid(wk)
        )
    if stage == "windows_chain":
        wc = nums.get("windows_chain")
        return (
            isinstance(wc, dict)
            and wc.get("method") == "chained-scan+d2h-fetch"
            and _shootout_valid(wc)
        )
    if stage == "window_parity":
        # verified = the attestation RAN (outputs fetched for real
        # kernels) — parity itself is the measured VALUE, so a genuine
        # mismatch result can and must replace a stale parity:true
        wp = nums.get("window_parity")
        return isinstance(wp, dict) and bool(wp.get("kernels")) and "note" not in wp
    if stage == "device_roofline":
        dr = nums.get("device_roofline")
        return (
            isinstance(dr, dict)
            and dr.get("method") == "chained-scan+d2h-fetch"
            and "gb_per_sec" in dr
        )
    if stage == "tokenizer":
        return _shootout_valid(nums.get("tokenizer"))
    if stage == "decode12":
        return _shootout_valid(nums.get("decode12"))
    if stage == "train":
        t = nums.get("train")
        return (
            isinstance(t, dict)
            and t.get("method") == "chained-scan+loss-fetch"
            and t.get("steps_per_sec", 0) > 0
        )
    if stage == "cohort":
        return bool(nums.get("cohort_donor_variants_per_sec"))
    if stage == "headline":
        return bool(nums.get("value"))
    return stage_present(nums, stage)


def merge(
    base: dict, new: dict, source: str, take_headline: bool, date: str
) -> dict:
    out = dict(base)
    prov = dict(out.get("_provenance", {}))
    for stage in STAGES:
        if not stage_present(new, stage):
            continue
        if stage == "headline" and not take_headline:
            continue
        if stage_degenerate(new, stage):
            continue  # garbage (all-zero / skipped) never merges
        new_ok = stage_verified(new, stage)
        old_ok = stage_verified(base, stage) and stage_present(base, stage)
        # replace unless it would trade verified for unverified
        if old_ok and not new_ok:
            continue
        for k in STAGES[stage]:
            if k in new:
                out[k] = new[k]
            elif k in out and k not in ("metric", "unit"):
                del out[k]  # stage replaced wholesale; drop stale keys
        prov[stage] = {"source": source, "date": date, "verified": new_ok}
    out["_provenance"] = prov
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", help="bench JSON (raw line or driver wrapper)")
    ap.add_argument(
        "--source",
        help="provenance label (default: the artifact's basename)",
    )
    ap.add_argument(
        "--headline",
        action="store_true",
        help="also take the headline value/vs_baseline from this run "
        "(default: keep the committed, driver-captured headline)",
    )
    ap.add_argument("--date", help="override provenance date (YYYY-MM-DD)")
    ap.add_argument("--out", default=CANONICAL)
    ap.add_argument(
        "--stages",
        help="comma list: merge only these stages (e.g. when part of a run "
        "went through a degraded link and should not replace better-"
        "condition committed numbers)",
    )
    args = ap.parse_args()

    new = load_bench(args.bench_json)
    base: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            base = json.load(f)
    source = args.source or os.path.basename(args.bench_json)
    date = args.date or datetime.date.today().isoformat()
    # a driver artifact is authoritative for the headline by convention
    take_headline = args.headline or source.startswith("BENCH_r")
    if args.stages:
        keep = set(args.stages.split(","))
        unknown = keep - set(STAGES)
        if unknown:
            raise SystemExit(f"unknown stages: {sorted(unknown)}")
        for stage in STAGES:
            if stage not in keep:
                for k in STAGES[stage]:
                    new.pop(k, None)
    merged = merge(base, new, source, take_headline, date)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
        f.write("\n")
    kept = [
        s for s in STAGES
        if stage_present(merged, s)
        and merged.get("_provenance", {}).get(s, {}).get("source") != source
    ]
    print(
        f"merged {args.bench_json} -> {args.out} "
        f"(headline {'taken' if take_headline else 'kept'}; "
        f"stages kept from prior runs: {kept or 'none'})"
    )


if __name__ == "__main__":
    main()
