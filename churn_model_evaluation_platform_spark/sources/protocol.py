"""Commit-log PROTOCOL VERSIONING — the reader feature guard (VERDICT
r10 missing #1, Delta's ``minReaderVersion`` / table-features model).

Before this module, every fold of the commit log (TxnTable._state, the
datasource's _replay, the change feeds) routed unrecognized commit
actions through the catch-all append branch: a pre-DV copy of this
library — or any foreign reader — replaying a ``dvdelete`` or a
column-mapped table would not error, it would SILENTLY resurrect
deleted rows or misname columns. Every durability claim the format
makes rests on readers refusing what they don't understand.

The contract, stamped into every commit and checkpoint at write time:

- ``min_reader``: the minimum protocol number a reader must implement
  to fold this commit without producing wrong rows. Version 1 is the
  base append/overwrite/meta log; version 2 adds row-level read
  semantics (deletion vectors, column mapping). Absent = 1 (every
  pre-guard commit is a version-1 commit by construction).
- ``reader_features``: the named features the commit's correct
  interpretation depends on. Row-level features (``dv``,
  ``column_map``) bump ``min_reader`` to 2; advisory features
  (``partitions``, ``constraints``, ``properties``) are listed but do
  not — a reader ignoring them still returns correct rows (stats carry
  pruning; constraints are write-time; properties are app-level).

Readers refuse three ways, all BEFORE any commit is folded:
unknown/too-new ``min_reader``, unknown ``reader_features`` entries,
unknown ``action``. Checkpoints carry the same stamp; an
incomprehensible checkpoint degrades to full log replay (where the
offending commit, if any, raises) — a checkpoint is an accelerator,
never an authority.

Pure Python, no Spark imports: the native sink's commit worker (no
SparkSession) and the datasource planner share it with the library.

Reference parity: the reference pipeline has no transactional store;
the guard mirrors the published Delta protocol spec (PROTOCOL.md's
reader-version/table-features rules) re-expressed for this log.
"""

from __future__ import annotations

# The protocol number THIS build reads and writes. Bump when a new
# action/feature changes how already-committed bytes must be
# interpreted at read time.
READER_VERSION = 2

# Every action any fold in this build knows how to apply.
KNOWN_ACTIONS = frozenset(
    {"append", "overwrite", "meta", "dvdelete", "mergedv", "updatedv"}
)

# Every feature name this build understands.
KNOWN_FEATURES = frozenset(
    {
        "dv",
        "column_map",
        "partitions",
        "constraints",
        "properties",
        "external_files",
        "generated",
    }
)

# Features that change ROW-LEVEL read results: a reader without them
# returns wrong rows, so they gate via min_reader = 2.
# external_files (shallow clones) is row-level not because plain reads
# break — path-join resolution of a '../'-form entry is correct in any
# build — but because row ADDRESSES do: a pre-feature reader running
# delete_dv against an externally-referenced file computes a garbage
# relpath from the table root, records a sidecar nothing ever matches,
# and silently deletes nothing.
ROW_LEVEL_FEATURES = frozenset({"dv", "column_map", "external_files"})

# Actions whose presence alone implies a feature (a dvdelete commit
# with an empty dv map still requires DV-aware folding of the table).
_ACTION_FEATURES = {
    "dvdelete": "dv",
    "mergedv": "dv",
    "updatedv": "dv",
}


class ProtocolError(RuntimeError):
    """This reader cannot interpret a commit/checkpoint without risking
    wrong rows. Upgrading the library — never ignoring the entry — is
    the only safe response; ``TxnTable.history()`` surfaces each
    commit's ``min_reader`` and ``reader_features`` without folding."""


def required_features(payload: dict) -> list[str]:
    """The feature set a commit payload's correct interpretation needs,
    derived from its CONTENT (never trusted from the wire)."""
    feats = set()
    act = _ACTION_FEATURES.get(payload.get("action"))
    if act:
        feats.add(act)
    if payload.get("dv"):
        feats.add("dv")
    if payload.get("column_map") or payload.get("dropped_physical"):
        feats.add("column_map")
    if payload.get("partition_by"):
        feats.add("partitions")
    if payload.get("constraints"):
        feats.add("constraints")
    if payload.get("properties"):
        feats.add("properties")
    # generated columns are a WRITE contract (reads are row-correct
    # without them), but a build that cannot see the contract cannot
    # safely write either — listed advisory, so guard-aware builds
    # without the feature refuse rather than append underived values
    if payload.get("generated"):
        feats.add("generated")
    # files referenced OUTSIDE the table root (shallow clones): commit
    # payloads carry them in `added`, checkpoint bodies in `live`
    refs = list(payload.get("added") or []) + list(payload.get("live") or [])
    if any(str(r).startswith(("../", "/")) for r in refs):
        feats.add("external_files")
    return sorted(feats)


def stamp(payload: dict) -> dict:
    """Stamp ``min_reader`` + ``reader_features`` onto a commit or
    checkpoint payload (in place; returned for chaining)."""
    feats = required_features(payload)
    payload["reader_features"] = feats
    payload["min_reader"] = (
        2 if any(f in ROW_LEVEL_FEATURES for f in feats) else 1
    )
    return payload


def check_commit(c: dict, where: str = "") -> None:
    """Raise ProtocolError unless THIS reader can fold commit ``c``
    correctly. Pre-guard commits (no ``min_reader`` key) are version-1
    by construction and pass; their action is still checked — an
    unknown action must never fold as an append."""
    loc = f" at {where}" if where else ""
    v = c.get("version", "?")
    mr = int(c.get("min_reader") or 1)
    if mr > READER_VERSION:
        raise ProtocolError(
            f"commit v{v}{loc} requires reader protocol {mr}; this "
            f"build reads protocol <= {READER_VERSION}. Upgrade the "
            f"library to read this table (history() shows each "
            f"commit's requirements without folding)."
        )
    unknown = set(c.get("reader_features") or []) - KNOWN_FEATURES
    if unknown:
        raise ProtocolError(
            f"commit v{v}{loc} requires table features "
            f"{sorted(unknown)} this build does not implement "
            f"(known: {sorted(KNOWN_FEATURES)}). Upgrade the library "
            f"to read this table."
        )
    action = c.get("action")
    if action not in KNOWN_ACTIONS:
        raise ProtocolError(
            f"commit v{v}{loc} has unknown action {action!r} (known: "
            f"{sorted(KNOWN_ACTIONS)}); folding it as an append could "
            f"resurrect deleted rows or misread the table. Upgrade "
            f"the library to read this table."
        )


def check_checkpoint(ck: dict, where: str = "") -> None:
    """Raise ProtocolError unless THIS reader can trust checkpoint
    ``ck``. Callers catch it and fall back to full log replay — the
    commits themselves re-raise if the table truly needs a newer
    reader, so the fallback is graceful exactly when it is safe."""
    loc = f" at {where}" if where else ""
    v = ck.get("version", "?")
    mr = int(ck.get("min_reader") or 1)
    if mr > READER_VERSION:
        raise ProtocolError(
            f"checkpoint v{v}{loc} requires reader protocol {mr}; "
            f"this build reads protocol <= {READER_VERSION}."
        )
    unknown = set(ck.get("reader_features") or []) - KNOWN_FEATURES
    if unknown:
        raise ProtocolError(
            f"checkpoint v{v}{loc} requires table features "
            f"{sorted(unknown)} this build does not implement."
        )


__all__ = [
    "READER_VERSION",
    "KNOWN_ACTIONS",
    "KNOWN_FEATURES",
    "ROW_LEVEL_FEATURES",
    "ProtocolError",
    "required_features",
    "stamp",
    "check_commit",
    "check_checkpoint",
]
