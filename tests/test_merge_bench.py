"""Stage-wise bench merging (tools/merge_bench.py) — the committed perf
artifact's integrity gate (VERDICT r3 #1): verified numbers must survive
later runs through bad relay windows, and degenerate (all-errored) stages
must never overwrite real measurements."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from merge_bench import (  # noqa: E402
    load_bench,
    merge,
    stage_degenerate,
    stage_verified,
)


def _verified_run():
    return {
        "metric": "variants/sec/chip (parse+encode)",
        "value": 7_000_000,
        "unit": "variants/sec",
        "vs_baseline": 12.5,
        "windows_per_sec": 500_000,
        "windows_per_sec_onehot": 24_000,
        "windows_materialized": True,
        "window_kernels": {
            "pallas": {"windows_per_sec": 500_000, "round_wins": 4},
            "winner": "pallas",
            "materialized": True,
        },
        "window_parity": {"parity": True, "kernels": ["baseline", "fast", "pallas"]},
        "window_kernel_parity": True,
        "device_roofline": {
            "method": "chained-scan+d2h-fetch",
            "gb_per_sec": 68.9,
            "hbm_peak_fraction": 0.084,
        },
        "storage": {"write_rec_per_sec": 6_000_000},
    }


class TestPrecedence:
    def test_verified_survives_unverified_run(self):
        base = merge({}, _verified_run(), "good.json", True, "2026-08-21")
        bad = {
            "value": 5_000_000,
            "windows_per_sec": 18_000_000,  # relay-elided upper bound
            "windows_materialized": False,
            "window_kernels": {
                "pallas": {"windows_per_sec": 500_000_000},
                "materialized": False,
            },
            "window_parity": {"parity": False, "note": "skipped: d2h unhealthy"},
            "device_roofline": {"note": "skipped: d2h unhealthy"},
        }
        out = merge(base, bad, "bad.json", False, "2026-08-22")
        # every verified stage kept; headline kept (take_headline=False)
        assert out["windows_per_sec"] == 500_000
        assert out["windows_materialized"] is True
        assert out["window_kernels"]["materialized"] is True
        assert out["window_kernel_parity"] is True
        assert out["device_roofline"]["gb_per_sec"] == 68.9
        assert out["value"] == 7_000_000
        assert out["_provenance"]["windows"]["source"] == "good.json"

    def test_verified_replaces_verified(self):
        base = merge({}, _verified_run(), "run1.json", True, "2026-08-21")
        newer = dict(_verified_run())
        newer["windows_per_sec"] = 600_000
        out = merge(base, newer, "run2.json", False, "2026-08-22")
        assert out["windows_per_sec"] == 600_000
        assert out["_provenance"]["windows"]["source"] == "run2.json"

    def test_unverified_fills_empty_slot(self):
        out = merge(
            {},
            {"windows_per_sec": 1000, "windows_materialized": False},
            "r.json", False, "2026-08-21",
        )
        assert out["windows_per_sec"] == 1000
        assert out["_provenance"]["windows"]["verified"] is False


class TestDegenerateGuard:
    def test_all_zero_shootout_never_merges(self):
        base = merge({}, _verified_run(), "good.json", True, "2026-08-21")
        garbage = {
            "decode12": {"xla": {"vps": 0, "error": "RESOURCE_EXHAUSTED"},
                         "pallas": {"vps": 0, "error": "RESOURCE_EXHAUSTED"},
                         "winner": "xla"},
            "tokenizer": {"note": "skipped: d2h unhealthy"},
            "windows_per_sec": 0,
        }
        assert stage_degenerate(garbage, "decode12")
        assert stage_degenerate(garbage, "tokenizer")
        assert stage_degenerate(garbage, "windows")
        out = merge(base, garbage, "oom.json", False, "2026-08-22")
        assert out["windows_per_sec"] == 500_000
        assert "decode12" not in out
        assert "tokenizer" not in out

    def test_partial_shootout_is_not_degenerate(self):
        run = {"decode12": {"xla": {"vps": 100}, "pallas": {"vps": 0}}}
        assert not stage_degenerate(run, "decode12")


class TestVerifiedPredicate:
    def test_roofline_requires_chain_method(self):
        assert not stage_verified(
            {"device_roofline": {"gb_per_sec": 9, "method": "naive"}},
            "device_roofline",
        )
        assert stage_verified(_verified_run(), "device_roofline")

    def test_parity_verified_means_ran_not_passed(self):
        """A genuinely measured MISMATCH is a verified result (the
        attestation ran, outputs were fetched) — it must be able to
        replace a stale parity:true; only skips are unverified."""
        ran_mismatch = {"window_parity": {"parity": False, "kernels": ["a", "b"],
                                          "mismatch": ["b"]}}
        assert stage_verified(ran_mismatch, "window_parity")
        assert not stage_verified(
            {"window_parity": {"parity": False, "note": "skipped: d2h unhealthy"}},
            "window_parity",
        )

    def test_null_parity_skip_never_merges(self):
        """VERDICT r4 #7: a skipped parity stage emits parity=None /
        window_kernel_parity=null — machine-distinguishable from a
        measured on-chip mismatch (parity=False with kernels).  The skip
        is degenerate and must never overwrite a real attestation."""
        skip = {
            "window_parity": {"parity": None, "note": "skipped: d2h unhealthy"},
            "window_kernel_parity": None,
        }
        assert stage_degenerate(skip, "window_parity")
        assert not stage_verified(skip, "window_parity")
        base = merge({}, _verified_run(), "good.json", True, "2026-08-21")
        out = merge(base, skip, "skip.json", False, "2026-08-22")
        assert out["window_kernel_parity"] is True  # attestation kept

    def test_measured_mismatch_replaces_stale_pass(self):
        base = merge({}, _verified_run(), "good.json", True, "2026-08-21")
        mismatch_run = {
            "window_parity": {"parity": False,
                              "kernels": ["baseline", "fast", "pallas"],
                              "mismatch": ["pallas"]},
            "window_kernel_parity": False,
        }
        out = merge(base, mismatch_run, "regress.json", False, "2026-08-22")
        assert out["window_kernel_parity"] is False
        assert out["window_parity"]["mismatch"] == ["pallas"]


class TestLoadBench:
    def test_raw_and_wrapper(self, tmp_path):
        raw = tmp_path / "raw.json"
        raw.write_text(json.dumps(_verified_run()))
        assert load_bench(str(raw))["value"] == 7_000_000

        wrapped = tmp_path / "wrap.json"
        wrapped.write_text(json.dumps({
            "rc": 0, "parsed": None,
            "tail": "noise\n" + json.dumps(_verified_run()) + "\n",
        }))
        assert load_bench(str(wrapped))["value"] == 7_000_000

    def test_truncated_tail_recovery(self, tmp_path):
        """The driver wrapper keeps only the LAST bytes of stdout: the
        JSON line may be cut mid-string and must be reconstructed from
        the fixed headline prefix."""
        full = json.dumps(_verified_run())
        cut = full[full.find('"value":') - 10:]  # head chopped mid-key
        wrapped = tmp_path / "cut.json"
        wrapped.write_text(json.dumps({"rc": 0, "parsed": None, "tail": cut}))
        assert load_bench(str(wrapped))["value"] == 7_000_000

    def test_driver_artifact_round3(self):
        """The real committed driver artifact parses."""
        p = os.path.join(ROOT, "BENCH_r03.json")
        if not os.path.exists(p):
            pytest.skip("no driver artifact")
        nums = load_bench(p)
        assert nums["value"] == 7_556_865


class TestCli:
    def test_stages_filter(self, tmp_path):
        base_p = tmp_path / "latest.json"
        base = merge({}, _verified_run(), "good.json", True, "2026-08-21")
        base_p.write_text(json.dumps(base))
        run = dict(_verified_run())
        run["windows_per_sec"] = 999_999
        run["storage"] = {"write_rec_per_sec": 1}  # would downgrade
        run_p = tmp_path / "run.json"
        run_p.write_text(json.dumps(run))
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "merge_bench.py"),
             str(run_p), "--source", "sel.json", "--stages", "windows",
             "--out", str(base_p)],
            check=True, capture_output=True,
        )
        out = json.loads(base_p.read_text())
        assert out["windows_per_sec"] == 999_999  # selected stage merged
        assert out["storage"]["write_rec_per_sec"] == 6_000_000  # untouched
