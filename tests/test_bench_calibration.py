"""Load-normalized bench regression flags (bench.py needs_rerun,
round 12, VERDICT r11 next #7): a uniform environment slowdown — which
moves the calibration probe by the same factor as every query — must
NOT flag; a genuine per-query regression must. r11 burned a 62-entry
rerun table on exactly this distinction."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_uniform_environment_slowdown_never_flags():
    # the whole box got 1.7x slower: every query 1.7x, calibration 1.7x
    flag, norm = bench.needs_rerun(
        t_now=1.7, t_prev=1.0, calib_now=1.7, calib_prev=1.0
    )
    assert not flag and abs(norm - 1.0) < 1e-9


def test_genuine_regression_flags_on_a_steady_box():
    flag, norm = bench.needs_rerun(
        t_now=1.5, t_prev=1.0, calib_now=1.0, calib_prev=1.0
    )
    assert flag and abs(norm - 1.5) < 1e-9


def test_genuine_regression_flags_through_a_slowdown():
    # box 1.7x slower AND the query genuinely 1.5x worse: 2.55x raw,
    # 1.5x normalized — still flagged
    flag, norm = bench.needs_rerun(
        t_now=2.55, t_prev=1.0, calib_now=1.7, calib_prev=1.0
    )
    assert flag and abs(norm - 1.5) < 1e-9


def test_speedup_box_masks_nothing():
    # box got 2x FASTER; a query that only kept its old time is a 2x
    # normalized regression — flagged (a real slowdown hiding in a
    # faster environment)
    flag, norm = bench.needs_rerun(
        t_now=1.0, t_prev=1.0, calib_now=0.5, calib_prev=1.0
    )
    assert flag and abs(norm - 2.0) < 1e-9


def test_missing_calibration_falls_back_to_raw_ratio():
    flag, norm = bench.needs_rerun(
        t_now=1.3, t_prev=1.0, calib_now=None, calib_prev=None
    )
    assert flag and abs(norm - 1.3) < 1e-9
    flag, _ = bench.needs_rerun(
        t_now=1.1, t_prev=1.0, calib_now=1.0, calib_prev=None
    )
    assert not flag


def test_no_previous_timing_never_flags():
    flag, norm = bench.needs_rerun(
        t_now=9.9, t_prev=None, calib_now=1.0, calib_prev=1.0
    )
    assert not flag and norm is None
