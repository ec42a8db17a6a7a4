"""bench.py regression-gate semantics: ratio on the per-batch component
for stream keys, plus an absolute-delta noise floor so sub-noise wiggles
(especially after the fixed-startup subtraction) cannot flag."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import bench


def test_batch_key_needs_ratio_and_absolute_delta():
    assert bench._gate_flags("groupby_agg", 1.2, 0.5)        # 2.4x, +0.7s
    assert not bench._gate_flags("groupby_agg", 0.45, 0.2)   # 2.25x but +0.25s
    assert not bench._gate_flags("groupby_agg", 1.2, 1.0)    # 1.2x


def test_stream_key_gates_on_per_batch_component():
    key = "transform_with_state"
    fixed = bench.STREAM_FIXED_COST[key]
    # +0.8s per-batch: big ratio but under the 1s stream noise floor
    assert not bench._gate_flags(key, fixed + 1.6, fixed + 0.8)
    # +1.5s per-batch at >1.5x: a real regression
    assert bench._gate_flags(key, fixed + 2.5, fixed + 1.0)
    # startup-only growth with per-batch constant: never flags
    assert not bench._gate_flags(key, fixed + 0.9, fixed + 0.85)


def test_gate_ratio_subtracts_fixed_startup():
    key = "stream_replay"
    fixed = bench.STREAM_FIXED_COST[key]
    assert abs(bench._gate_ratio(key, fixed + 2.0, fixed + 1.0) - 2.0) < 1e-9
