"""Unit tests for bench.py's measurement plumbing (no Spark needed).

The bench harness is a per-round driver artifact: its final JSON line must
parse inside the driver's ~4 KB tail capture (BENCH_r06 and BENCH_r11 both
went "parsed": null when the line outgrew it), and its load-contamination
canary must flag a hot box (r11's driver numbers drifted 1.5-8x on
unchanged code and only a judge re-run could tell).
"""

from __future__ import annotations

import json

import bench


class TestLoadSkewCanary:
    def test_idle_box_not_flagged(self):
        # both probes at the pinned time -> clean
        assert not bench.is_load_skewed([0.14, 0.15])

    def test_mild_jitter_not_flagged(self):
        # under 2x pin is normal same-box spread, not contamination
        assert not bench.is_load_skewed([0.22, 0.29])

    def test_loaded_start_flagged(self):
        assert bench.is_load_skewed([0.95, 0.14])

    def test_loaded_end_flagged(self):
        # box got busy mid-window: the closing probe alone must flag
        assert bench.is_load_skewed([0.14, 0.43])

    def test_threshold_is_factor_times_pin(self):
        pin, factor = bench.CANARY_PINNED_SEC, bench.CANARY_SKEW_FACTOR
        assert not bench.is_load_skewed([pin * factor])
        assert bench.is_load_skewed([pin * factor + 0.001])

    def test_custom_pin_and_factor(self):
        assert bench.is_load_skewed([1.1], pinned=0.5, factor=2.0)
        assert not bench.is_load_skewed([1.1], pinned=0.6, factor=2.0)

    def test_canary_is_registered_and_cheap_shape(self):
        # the canary must be a bench-list member (so its pin stays honest
        # against the recorded per-round medians) with a sub-second pin
        assert bench.CANARY in bench.BENCH_QUERIES
        assert bench.CANARY_PINNED_SEC < 1.0
        assert bench.CANARY_RUNS >= 2


class TestFinalJsonLine:
    def _line(self, n_queries: int) -> str:
        # mirror main()'s final-line construction exactly: compact
        # separators, 2-dp floats, load_skewed flag present
        # 19-char names = the current BENCH_QUERIES average (18.9)
        names = [f"txn_query_name_{i:04d}" for i in range(n_queries)]
        return json.dumps(
            {"metric": "total_wall_seconds", "value": round(1234.56, 2),
             "unit": "sec",
             "queries": {n: round(12.345, 2) for n in names},
             "sf": 0.1, "load_skewed": False},
            separators=(",", ":"))

    def test_current_benchlist_fits_capture(self):
        # the REAL query names at worst-case 2-dp widths must fit the
        # driver's tail capture with margin
        line = json.dumps(
            {"metric": "total_wall_seconds", "value": 99999.99,
             "unit": "sec",
             "queries": {n: 99999.99 for n in bench.BENCH_QUERIES},
             "sf": 0.1, "load_skewed": False},
            separators=(",", ":"))
        assert len(line) <= 3500, (
            f"bench JSON line {len(line)}B; trim BENCH_QUERIES or widen "
            "the fallback — the driver tail capture is ~4 KB")

    def test_100_queries_fit_budget(self):
        # VERDICT r11 task 2: budget <= 3.5 KB at 100 queries
        assert len(self._line(100)) <= 3500

    def test_line_parses_back(self):
        d = json.loads(self._line(73))
        assert d["metric"] == "total_wall_seconds"
        assert len(d["queries"]) == 73
        assert d["load_skewed"] is False
