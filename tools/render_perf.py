#!/usr/bin/env python
"""Render the documentation performance tables from a benchmark JSON.

The README/ARCHITECTURE perf numbers drifted from the measured numbers in
rounds 1 and 2; this makes the sync mechanical:

- the canonical numbers live in ``benchmarks/latest_bench.json`` (one
  ``bench.py`` JSON line, committed);
- this script rewrites the marker-delimited blocks in ``README.md`` and
  ``docs/ARCHITECTURE.md`` from that file;
- ``tests/test_docs_sync.py`` runs it in ``--check`` mode, so the suite
  FAILS whenever the docs and the committed numbers diverge.

Refresh flow after a new benchmark run:

    python tools/render_perf.py --import-from BENCH_r03.json   # or any bench JSON
    python tools/render_perf.py --update

Markers: ``<!-- perf:begin -->`` ... ``<!-- perf:end -->``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANONICAL = os.path.join(ROOT, "benchmarks", "latest_bench.json")
BEGIN, END = "<!-- perf:begin -->", "<!-- perf:end -->"

#: reference (baseline) numbers — BASELINE.md; fixed publications
REF = {
    "parse_vps": 559_390,
    "write_rps": 256_047,
    "read_rps": 342_252,
    "ratio": 6.5,
    "slices": 1_597,
    "wg_seconds": 18.0,
}


def _fmt_big(v: float) -> str:
    if v >= 1e9:
        return f"{v / 1e9:.1f}B"
    if v >= 1e6:
        return f"{v / 1e6:.1f}M"
    if v >= 1e3:
        return f"{v / 1e3:.0f}K"
    return f"{v:.0f}"


def load_numbers(path: str = CANONICAL) -> dict:
    """Accept a raw bench JSON line, a merged canonical file, or the
    driver's wrapper (whose ``parsed`` may be null — then the JSON line
    is recovered from the captured ``tail``)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from merge_bench import load_bench

    return load_bench(path)


def driver_headline_range() -> tuple[float, float] | None:
    """(min, max) ``vs_baseline`` across every committed driver artifact
    (``BENCH_r*.json``) — the honest cross-run spread the README shows
    next to the headline (VERDICT r3 #2)."""
    import glob

    vals = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            nums = load_numbers(p)
            if nums and nums.get("vs_baseline"):
                vals.append(float(nums["vs_baseline"]))
        except Exception:
            continue
    return (min(vals), max(vals)) if vals else None


def render_readme_block(nums: dict) -> str:
    st = nums.get("storage", {})
    wg = nums.get("whole_genome", {})
    vps = nums["value"]
    wps = nums.get("windows_per_sec", 0)
    # prefer the chained device-resident kernel rate (d2h-verified by
    # construction) over the dispatch-inclusive sampler rate when both
    # exist — it is the kernel's own number, and the chain method is the
    # one the relay cannot fake
    note = ""
    wc = nums.get("windows_chain")
    if isinstance(wc, dict) and wc.get("method") == "chained-scan+d2h-fetch":
        best = wc.get(wc.get("winner", ""), {})
        if isinstance(best, dict) and best.get("windows_per_sec", 0) > wps:
            wps = best["windows_per_sec"]
            note = " (device-resident, chained)"
    if not note and not nums.get("windows_materialized"):
        note = " (upper bound, unverified)"
    rows = [
        "| Metric | reference (Xeon) | this framework | speedup |",
        "|---|---|---|---|",
        f"| VCF parse+encode | {_fmt_big(REF['parse_vps'])} variants/s | "
        f"{_fmt_big(vps)} variants/s | {vps / REF['parse_vps']:.1f}× |",
        f"| haplotype windows | ~{_fmt_big(REF['slices'])} slices/s (HDF5 random access) | "
        f"{_fmt_big(wps)} windows/s on device" + note
        + f" | >{int(wps / REF['slices'] // 100 * 100) if wps else 0}× |",
    ]
    if st:
        rows += [
            f"| HDF5+Blosc write | {_fmt_big(REF['write_rps'])} rec/s | "
            f"{_fmt_big(st['write_rec_per_sec'])} rec/s | "
            f"{st['write_rec_per_sec'] / REF['write_rps']:.0f}× |",
            f"| HDF5+Blosc read | {_fmt_big(REF['read_rps'])} rec/s | "
            f"{_fmt_big(st['read_rec_per_sec'])} rec/s | "
            f"{st['read_rec_per_sec'] / REF['read_rps']:.0f}× |",
            f"| compression ratio | {REF['ratio']}× | {st['ratio']}× | — |",
            f"| HDF5 random slices | {REF['slices']:,}/s | "
            f"{st['random_slices_per_sec']:,}/s | "
            f"{st['random_slices_per_sec'] / REF['slices']:.1f}× |",
        ]
    if wg:
        rows.append(
            f"| whole genome (3M variants → cohort HDF5) | ~{REF['wg_seconds']:.0f}s | "
            f"{wg['seconds']}s | {REF['wg_seconds'] / wg['seconds']:.1f}× |"
        )
    fasta = nums.get("fasta")
    if fasta:
        rows.append(
            f"| FASTA one-hot encode | — | "
            f"{_fmt_big(fasta['bases_per_sec'])} bases/s | — |"
        )
    tail = [
        "",
        "All throughputs are MEDIANS over ≥10 content-fresh iterations "
        "(best-of is reported secondarily in the bench JSON; the tunneled "
        "link shows large run-to-run spread, so medians decide).",
    ]
    prov = nums.get("_provenance", {}).get("headline", {})
    rng = driver_headline_range()
    if prov.get("source"):
        line = (
            f"Headline provenance: `{prov['source']}` "
            f"({prov.get('date', '?')}"
            + (", driver-captured" if prov["source"].startswith("BENCH_r") else ", local run")
            + ")"
        )
        if rng and rng[0] != rng[1]:
            line += (
                f"; cross-run spread across driver artifacts: "
                f"{rng[0]:.1f}×–{rng[1]:.1f}× (relay weather, same code)"
            )
        tail.append(line + ".")
    dr = nums.get("device_roofline")
    # only the chained-scan+d2h-fetch method produces numbers the relay
    # cannot fake; drop rooflines measured any other way
    if dr and dr.get("method") != "chained-scan+d2h-fetch":
        dr = None
    if dr and "gb_per_sec" in dr:
        tail.append(
            f"Device-resident decode (no host↔device transfer in the timed "
            f"region): {_fmt_big(dr['variants_per_sec'])} variants/s = "
            f"{dr['gb_per_sec']} GB/s of HBM traffic "
            f"({dr['hbm_peak_fraction'] * 100:.1f}% of v5e peak)."
        )
    return "\n".join(rows + tail)


def render_arch_block(nums: dict) -> str:
    lines = ["Measured medians from the committed benchmark run", ""]
    d12 = nums.get("decode12")
    if d12:
        xla = d12.get("xla", {})
        pal = d12.get("pallas", {})
        lines.append(
            f"- decode12 upload+decode: XLA {xla.get('vps', 0):,} variants/s "
            f"(median {xla.get('median_s', 0)}s, IQR {xla.get('iqr_s', 0)}s) vs "
            f"Pallas {pal.get('vps', 0):,} variants/s "
            f"(median {pal.get('median_s', 0)}s, IQR {pal.get('iqr_s', 0)}s) — "
            f"this run's winner: **{d12.get('winner', '?')}**.  This stage "
            f"measures the LINK as much as the kernels (its winner flips "
            f"with relay mood across otherwise-identical runs); the "
            f"converter's production decode "
            f"(`decode_frames12_packed`: XLA decode + elementwise packing "
            f"into the 3-int32/record wire format) is set by the "
            f"device-resident roofline below — fastest kernel AND the "
            f"smallest d2h payload (12 B/record), so it wins on both legs "
            f"at any link speed."
        )
    wk = nums.get("window_kernels")
    if wk:
        parts = [
            f"{k} {v['windows_per_sec']:,}/s"
            + (f" ({v['round_wins']} round wins)" if "round_wins" in v else "")
            for k, v in wk.items()
            if isinstance(v, dict) and "windows_per_sec" in v
        ]
        lines.append(
            f"- window kernels, paired shoot-out (each round times all "
            f"kernels back-to-back): {', '.join(parts)} — this run's winner: "
            f"**{wk.get('winner', '?')}**"
            + (" (d2h-verified run)" if wk.get("materialized") else
               " (upper bounds; relay acked without materialization)")
            + ".  The three kernels are bit-equal; the sampler default "
            "(`SamplerConfig.window_kernel=\"auto\"`) resolves to the "
            "Pallas kernel on TPU — the only kernel a d2h-verified "
            "measurement ever put ahead — and to the word-gather `fast` "
            "kernel elsewhere; all are selectable per-sampler."
        )
    wc = nums.get("windows_chain")
    if isinstance(wc, dict) and wc.get("winner") not in (None, "none"):
        win = wc["winner"]
        wps = wc[win]["windows_per_sec"]
        lines.append(
            f"- device-resident windows/sec (chained-scan + digest fetch — "
            f"dispatch and fetch amortized over {wc.get('n_chain', '?')} "
            f"dependent fused dispatches): **{wps:,} windows/s** with the "
            f"`{win}` kernel.  This is the kernel's own rate; the sampler "
            f"table row above is dispatch-inclusive (one fetch per "
            f"iteration) and bounds the *per-dispatch* path instead."
        )
    tr = nums.get("train")
    if isinstance(tr, dict) and tr.get("steps_per_sec", 0) > 0:
        m = tr.get("model", {})
        lines.append(
            f"- fully on-device training (fused sample-into-train step: "
            f"sampler draw + HaploFormer fwd/bwd + optax update, one "
            f"dispatch/step, loss-fetch attested): "
            f"**{tr['steps_per_sec']} steps/s** = "
            f"{tr.get('tokens_per_sec', 0) / 1e6:.2f}M tokens/s at "
            f"B={tr.get('batch')}, L={tr.get('seq_len')} "
            f"({m.get('layers')}L d{m.get('d_model')} {m.get('dtype')}).  "
            f"The reference stops at the DataLoader; this is the path it "
            f"has no analogue of."
        )
    wp = nums.get("window_parity")
    if isinstance(wp, dict) and wp.get("parity"):
        lines.append(
            f"- on-chip bit-equality attestation (compiled kernels, "
            f"materialized outputs, platform={wp.get('platform', '?')}): "
            f"{'+'.join(wp.get('kernels', []))} agree bit-for-bit on "
            f"identical draws — joint content hash "
            f"`{wp.get('sha256_16', '?')}`."
        )
    tok = nums.get("tokenizer")
    if isinstance(tok, dict) and "winner" in tok:
        tv = tok.get("tokenizer", {}).get("vps", 0)
        fv = tok.get("frame12", {}).get("vps", 0)
        lines.append(
            f"- L1 ingest head-to-head (end-to-end incl. each path's d2h "
            f"bill): all-device tokenizer {tv:,}/s vs native frame12 "
            f"{fv:,}/s — winner **{tok['winner']}**, which is why "
            f"`use_tokenizer` defaults to False (the tokenizer remains a "
            f"correctness/portability path: zero native dependencies)."
        )
    dr = nums.get("device_roofline")
    if dr and dr.get("method") != "chained-scan+d2h-fetch":
        dr = None
    if dr and "gb_per_sec" in dr:
        lines.append(
            f"- device-resident decode roofline "
            f"(chained-scan + forced d2h fetch — the measurement design "
            f"the execution relay cannot fake): {dr['gb_per_sec']} GB/s "
            f"achieved = {dr['hbm_peak_fraction'] * 100:.1f}% of v5e HBM "
            f"peak (819 GB/s), a LOWER bound (the in-region fetch "
            f"amortizes RPC latency over the 64-step chain)."
        )
    table = render_roofline_table(nums)
    if table:
        lines += ["", "Per-kernel HBM roofline (bytes-touched model, "
                  "verified measurements only):", ""] + table
    return "\n".join(lines)


#: kernels below this roofline fraction need a one-line explanation
#: (VERDICT r3 #7)
ROOFLINE_EXPLAIN = {
    "decode12/xla": "13 small output columns (byte-wide writes pad to "
    "32-bit lanes); judge against the calibration row, not paper peak",
    "decode12/packed": "the production kernel (vcf_to_h5._decode12): "
    "dict decode + free elementwise packing to 3 int32/record",
    "decode12/planes": "struct-of-arrays wire layout; ties the row "
    "layout now that the LUT gathers are gone",
    "decode12/pallas": "DEMOTED (r5 sweep, benchmarks/pallas_decode_sweep"
    ".json): block-size invariant ~105M var/s at b1024 AND b2048, so the "
    "~29x loss to packed XLA is lane padding (12->128 on the int32 cast, "
    "~9% lane utilization), not grid-step overhead; correctness/"
    "portability path only",
    "decode12/v2": "gt matrix dominates bytes at high sample counts; the "
    "delta-chain cumsum serializes into log-depth scan passes",
    "windows/baseline": "gather-bound: one dynamic_slice per window row, "
    "XLA cannot coalesce across the batch",
    "windows/fast": "word-gather amortizes 4 codes per load; remaining "
    "gap is gather latency, not bandwidth",
    "windows/pallas": "2 random-access DMAs per window (genome span + "
    "interleaved pos|sub chunk; a 3rd only on a bucket crossing); the "
    "gap to peak is per-transfer issue+latency, not bandwidth — see the "
    "latency-floor analysis in ARCHITECTURE",
}


def render_roofline_table(nums: dict) -> list[str]:
    """Roofline rows for every device kernel with a VERIFIED bandwidth
    measurement: the decode kernels (chained-scan method) and the window
    kernels (materialized shoot-out, bytes model >= 2L per window)."""
    rows = []
    dr = nums.get("device_roofline") or {}
    if dr.get("method") == "chained-scan+d2h-fetch":
        for k in ("xla", "packed", "planes", "pallas", "v2"):
            v = dr.get(k)
            if isinstance(v, dict) and "gb_per_sec" in v and "note" not in v:
                rows.append((f"decode12/{k}" if k != "v2" else "decode/v2",
                             f"decode12/{k}", v))
    wc = nums.get("windows_chain") or {}
    if wc.get("method") == "chained-scan+d2h-fetch":
        for k in ("baseline", "fast", "pallas"):
            v = wc.get(k)
            if isinstance(v, dict) and v.get("windows_per_sec", 0) > 0:
                rows.append((f"window/{k}", f"windows/{k}", v))
    have_chain = any(label.startswith("window/") for label, _, _ in rows)
    wk = nums.get("window_kernels") or {}
    if wk.get("materialized") and not have_chain:
        # fall back to the shoot-out's dispatch-inclusive timings only
        # when no device-resident chained rows exist
        for k in ("baseline", "fast", "pallas"):
            v = wk.get(k)
            if isinstance(v, dict) and "gb_per_sec" in v and "note" not in v:
                rows.append((f"window/{k} (dispatch-inclusive)", f"windows/{k}", v))
    if not rows:
        return []
    cal = (nums.get("device_roofline") or {}).get("hbm_calibration")
    out = [
        "| kernel | GB/s | % of v5e HBM peak (819 GB/s) | note |",
        "|---|---|---|---|",
    ]
    if cal:
        meth = (
            "xorshift slope fit — fixed dispatch+fetch cost "
            f"{cal['fixed_cost_s'] * 1e3:.0f} ms/call split out"
            if cal.get("method") == "xorshift-slope"
            else "elementwise, same method"
        )
        out.append(
            f"| *HBM calibration ({meth})* | "
            f"{cal['gb_per_sec']} | {cal['hbm_peak_fraction'] * 100:.1f}% | "
            f"*what the rig demonstrably sustains — the denominator below* |"
        )
    # when EVERY kernel sits far below peak, the bottleneck is the rig
    # (the tunneled relay inflates execution wholesale in its slow moods
    # — measured 420x on identical executables), not the kernels: the
    # RANKING is the decision-relevant signal, per-kernel notes would
    # misattribute the gap.  The calibration row quantifies this.
    rig_bound = max(v["hbm_peak_fraction"] for _, _, v in rows) < 0.05
    for label, key, v in rows:
        frac = v["hbm_peak_fraction"]
        if rig_bound:
            note = (
                f"{v['of_calibrated'] * 100:.0f}% of calibrated"
                if v.get("of_calibrated")
                else ""
            )
        else:
            note = ROOFLINE_EXPLAIN.get(key, "") if frac < 0.4 else ""
        out.append(
            f"| {label} | {v['gb_per_sec']} | {frac * 100:.1f}% | {note} |"
        )
    if rig_bound:
        cal_txt = (
            f" (calibration: a pure xor sustains only "
            f"{cal['gb_per_sec']} GB/s under the same method)" if cal else ""
        )
        out.append(
            "| | | | *all kernels rig-bound this run — the tunneled "
            "relay caps achievable bandwidth wholesale"
            + cal_txt
            + "; fractions are honest lower bounds, the ranking is the "
            "portable signal* |"
        )
    return out


def splice(path: str, block: str) -> tuple[str, str]:
    with open(path) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"{path}: perf markers not found")
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = f"{pre}{BEGIN}\n{block}\n{END}{post}"
    return text, new


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="fail if docs are stale")
    ap.add_argument("--update", action="store_true", help="rewrite the docs blocks")
    ap.add_argument(
        "--import-from", help="copy a bench JSON (driver wrapper or raw line) "
        "into benchmarks/latest_bench.json first"
    )
    args = ap.parse_args()

    if args.import_from:
        # stage-wise merge with provenance (tools/merge_bench.py): a run
        # with one bad relay window must not blank the committed verified
        # columns (VERDICT r3 #1)
        import subprocess

        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "merge_bench.py"),
                args.import_from,
            ],
            check=True,
        )

    nums = load_numbers()
    targets = [
        (os.path.join(ROOT, "README.md"), render_readme_block(nums)),
        (os.path.join(ROOT, "docs", "ARCHITECTURE.md"), render_arch_block(nums)),
    ]
    stale = []
    for path, block in targets:
        old, new = splice(path, block)
        if old != new:
            stale.append(path)
            if args.update:
                with open(path, "w") as f:
                    f.write(new)
                print(f"updated {path}")
    if args.check and stale:
        print(
            "stale perf docs (run `python tools/render_perf.py --update`): "
            + ", ".join(stale),
            file=sys.stderr,
        )
        raise SystemExit(1)
    if not args.check and not args.update and not args.import_from:
        print("nothing to do (pass --check or --update)")


if __name__ == "__main__":
    main()
