#!/usr/bin/env python3
"""Unit tests for the pure gate rule in tools/bench_gate.py — the
mechanical adjudication contract the bench self-retry feeds into.

Run: python3 -m unittest discover -s tools  (or python3 tools/test_bench_gate.py)
"""
import unittest

from bench_gate import gate, dispersion, DISPERSION_BAND


class GateRuleTest(unittest.TestCase):
    def test_within_budget_passes(self):
        fails, news, _ = gate({"q1": 1.9}, {"q1": 1.0})
        self.assertEqual(fails, [])
        self.assertEqual(news, [])

    def test_over_budget_fails(self):
        fails, _, lines = gate({"q1": 2.01}, {"q1": 1.0})
        self.assertEqual(fails, ["q1"])
        self.assertIn("ratio 2.01", lines[0])

    def test_exactly_at_budget_passes(self):
        # budget is strict-greater: current == 2x baseline is allowed
        fails, _, _ = gate({"q1": 2.0}, {"q1": 1.0})
        self.assertEqual(fails, [])

    def test_floor_protects_subsecond_queries(self):
        # baseline 0.05s, current 0.4s: 8x ratio but under the
        # 2 * max(0.05, 0.25) = 0.5s floored budget
        fails, _, _ = gate({"q1": 0.4}, {"q1": 0.05})
        self.assertEqual(fails, [])
        # ... and 0.51s is over it
        fails, _, _ = gate({"q1": 0.51}, {"q1": 0.05})
        self.assertEqual(fails, ["q1"])

    def test_new_query_is_informational(self):
        fails, news, lines = gate({"q1": 1.0, "q2": 9.0}, {"q1": 1.0})
        self.assertEqual(fails, [])
        self.assertEqual(news, ["q2"])
        self.assertTrue(any(l.startswith("NEW") for l in lines))

    def test_disappeared_query_fails(self):
        fails, _, lines = gate({"q1": 1.0}, {"q1": 1.0, "q2": 1.0})
        self.assertEqual(fails, ["q2"])
        self.assertIn("missing from current bench", lines[0])

    def test_custom_ratio(self):
        fails, _, _ = gate({"q1": 2.5}, {"q1": 1.0}, max_ratio=3.0)
        self.assertEqual(fails, [])
        fails, _, _ = gate({"q1": 3.1}, {"q1": 1.0}, max_ratio=3.0)
        self.assertEqual(fails, ["q1"])

    def test_retry_min_semantics_end_to_end(self):
        # the Bench contract: a 9x ambient burst on pass 1 with a ~1x
        # pass 2 reports min => passes the gate; a real regression is
        # slow in both passes => min still fails
        burst_min = min(9.3, 1.05)
        regression_min = min(4.2, 4.4)
        fails, _, _ = gate({"q": burst_min}, {"q": 1.0})
        self.assertEqual(fails, [])
        fails, _, _ = gate({"q": regression_min}, {"q": 1.0})
        self.assertEqual(fails, ["q"])


class TestDispersion(unittest.TestCase):
    # mirror of graft.Bench.dispersionReport (BenchLogicSpec owns the
    # Scala rules; these pin the python twin bench_gate prints from)

    def test_one_hot_query_alarms_via_outlier_leg(self):
        base = {f"q{i}": 1.0 for i in range(9)} | {"s23": 1.0}
        cur = {f"q{i}": 0.95 for i in range(9)} | {"s23": 2.23}
        spread, outliers, alarm = dispersion(cur, base)
        self.assertTrue(alarm)
        self.assertEqual([n for n, _ in outliers], ["s23"])

    def test_quiet_and_common_mode_hot_sweeps_stay_silent(self):
        base = {f"q{i}": 1.0 for i in range(8)}
        quiet = {f"q{i}": 0.9 + 0.02 * i for i in range(8)}
        _, outliers, alarm = dispersion(quiet, base)
        self.assertFalse(alarm)
        self.assertEqual(outliers, [])
        hot = {f"q{i}": 1.7 + 0.02 * i for i in range(8)}
        _, outliers, alarm = dispersion(hot, base)
        self.assertFalse(alarm)   # the canary's job, not this alarm's

    def test_wide_spread_alarms_via_band_leg(self):
        base = {f"q{i}": 1.0 for i in range(8)}
        # p50 = 0.5, p90 = 0.75: spread 1.5 over the band, yet no
        # single ratio crosses 1.0 — only the band leg can catch it
        cur = {f"q{i}": (0.5 if i < 6 else 0.75) for i in range(8)}
        spread, _, alarm = dispersion(cur, base)
        self.assertTrue(alarm)
        self.assertGreater(spread, DISPERSION_BAND)

    def test_under_five_samples_returns_none(self):
        base = {f"q{i}": 1.0 for i in range(4)}
        self.assertIsNone(dispersion(dict(base), base))


if __name__ == "__main__":
    unittest.main()
