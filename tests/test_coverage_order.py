"""Unit tests for __spark_entry__._coverage_order (driver-window rotation).

The driver checks a bounded prefix of ``queries()`` each round, so the
ordering logic decides which queries ever get a CORRECTNESS row. These
tests pin the tier semantics (err > never-checked > green-by-recency >
no-oracle) and the round-stamp fix: recency must stay strictly ordered
even when a round introduces no new query names (VERDICT r5 item 3).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")


def _load_entry():
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_round(tmp_path, n: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
ERR = {"rows_match": False, "schema_match": False, "hash_match": False, "err": "boom"}


def test_tiers_err_then_unchecked_then_recency_then_no_oracle(tmp_path):
    entry = _load_entry()
    names = ["a", "b", "c", "d", "e"]
    oracles = {n: "SELECT 1" for n in ["a", "b", "c", "d"]}  # e is rows-only
    _write_round(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write_round(tmp_path, 2, {"b": GREEN, "c": ERR})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    # c errored last → first; d never checked → second; a (checked r1) before
    # b (checked r2) by recency; e has no oracle → dead last.
    assert order == ["c", "d", "a", "b", "e"]


def test_recency_strict_when_round_adds_no_new_names(tmp_path):
    """The r5 bug: rnd = len(last_round)+1 stamped two rounds identically
    whenever the later round introduced no new names, collapsing recency
    into ties. With the enumerate fix, recency must stay strict."""
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {"a": "SELECT 1", "b": "SELECT 1"}
    _write_round(tmp_path, 1, {"a": GREEN, "b": GREEN})
    # Round 2 re-checks only 'b' — zero new names.
    _write_round(tmp_path, 2, {"b": GREEN})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    # 'a' was last checked in round 1, 'b' in round 2 → a strictly first.
    assert order == ["a", "b"]

    # And the opposite assignment to prove it isn't registration-order luck.
    _write_round(tmp_path, 3, {"a": GREEN})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    assert order == ["b", "a"]


def test_no_artifacts_degrades_to_registration_order(tmp_path):
    entry = _load_entry()
    names = ["x", "y", "z"]
    oracles = {n: "SELECT 1" for n in names}
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    assert order == names


HASH_RED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}


def test_hash_failed_sorts_ahead_of_unchecked_and_stale_green(tmp_path):
    """The r6 rotation bug: a hash-RED row kept its round stamp and sorted
    most-recently-checked = dead last, so a fixed oracle could never be
    re-proven. hash_match False must be tier 0, like err."""
    entry = _load_entry()
    names = ["stale_green", "never_checked", "hash_red"]
    oracles = {n: "SELECT 1" for n in names}
    _write_round(tmp_path, 1, {"stale_green": GREEN})
    _write_round(tmp_path, 2, {"hash_red": HASH_RED})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    assert order == ["hash_red", "never_checked", "stale_green"]


def test_rows_match_failed_is_tier_zero(tmp_path):
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {n: "SELECT 1" for n in names}
    bad = {"rows_match": False, "schema_match": True, "hash_match": True, "err": None}
    _write_round(tmp_path, 1, {"a": GREEN, "b": bad})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    assert order == ["b", "a"]


def test_null_hash_match_rows_only_row_is_not_bad(tmp_path):
    """Rows-only driver rows record hash_match null — that is a weaker
    check, not a failure; the query must stay in the recency tier."""
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {n: "SELECT 1" for n in names}
    _write_round(tmp_path, 1, {"a": ROWS_ONLY})
    _write_round(tmp_path, 2, {"b": GREEN})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    # a checked r1 (not bad) before b checked r2 — neither at tier 0.
    assert order == ["a", "b"]


def test_tombstone_names_in_artifacts_are_skipped(tmp_path):
    """Renamed/removed queries linger in old CORRECTNESS files
    (stratified_kfold_hash → kfold_hash in r5); they must not affect the
    computed order or crash tier building."""
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {n: "SELECT 1" for n in names}
    _write_round(tmp_path, 1, {"a": GREEN, "dead_old_name": ERR})
    _write_round(tmp_path, 2, {"b": GREEN, "another_ghost": HASH_RED})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    assert order == ["a", "b"]


def test_hash_red_cleared_by_later_green_row(tmp_path):
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {"a": "SELECT 1", "b": "SELECT 1"}
    _write_round(tmp_path, 1, {"a": HASH_RED, "b": GREEN})
    _write_round(tmp_path, 2, {"a": GREEN})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    # a's latest row is green (round 2), b green in round 1 → b first.
    assert order == ["b", "a"]


def test_err_cleared_by_later_green_row(tmp_path):
    entry = _load_entry()
    names = ["a", "b"]
    oracles = {"a": "SELECT 1", "b": "SELECT 1"}
    _write_round(tmp_path, 1, {"a": ERR, "b": GREEN})
    _write_round(tmp_path, 2, {"a": GREEN})
    order = entry._coverage_order(names, oracles, artifacts_dir=str(tmp_path))
    # a's latest row is green (round 2), b green in round 1 → b first by recency.
    assert order == ["b", "a"]
