"""Cross-query BENCH FIXTURE CACHE (round 11, VERDICT r10 next #7).

Several registry queries exercise DML/scan paths on multi-commit
transactional fixtures (the six-5-day-bucket events table, the PQ
vector stores). Rebuilding those through the commit log for every
query — twice, under best-of-2 — put ~18 s of pure fixture
construction into an 86 s headline, so the bench tracked ingest noise
instead of measured work.

The cache builds each fixture ONCE per machine per content key and
serves it two ways:

- ``cached_fixture`` returns the pristine directory for READ-ONLY
  consumers (ANN top-k, the dedup gate);
- ``clone_fixture`` copytrees it for MUTATING consumers (DELETE /
  UPDATE / MERGE / restore burn versions) — the commit log stores only
  RELATIVE paths, so a cloned table replays identically at its new
  location, history and batch_ids included.

Correctness is unaffected by construction: the key hashes the SOURCE
TABLE FILES (path, mtime, size — recursive for directory parquet) AND
the builder's own source code, so a data refresh or a builder edit
rebuilds instead of serving a stale fixture; a torn build can never be
served because the key file is written into the staging dir and the
whole dir is renamed into place atomically."""

from __future__ import annotations

import hashlib
import inspect
import os
import shutil

_KEY_FILE = "_FIXTURE_KEY"


def _content_key(sf_dir: str, tables: list[str], salt: str) -> str:
    parts = [salt, os.path.normpath(sf_dir)]
    for t in sorted(tables):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _, files in sorted(os.walk(p)):
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    parts.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
        elif os.path.exists(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        else:
            parts.append(f"{t}:absent")
    return hashlib.md5("|".join(parts).encode("utf-8")).hexdigest()


def cached_fixture(sf_dir: str, name: str, tables: list[str], build) -> str:
    """The pristine fixture dir for (``name``, ``sf_dir`` content,
    ``build`` source). ``build(path)`` populates ``path`` on a miss.
    Returned dir is SHARED — mutate through ``clone_fixture`` only."""
    base = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/spark_graft_fix_{name}_{base}"
    key = _content_key(
        sf_dir,
        tables,
        hashlib.md5(inspect.getsource(build).encode("utf-8")).hexdigest(),
    )
    try:
        with open(os.path.join(root, _KEY_FILE)) as f:
            if f.read() == key:
                return root
    except OSError:
        pass
    tmp = f"{root}.building-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, _KEY_FILE), "w") as f:
        f.write(key)
    shutil.rmtree(root, ignore_errors=True)
    os.rename(tmp, root)
    return root


def clone_fixture(cache_root: str, dest: str) -> str:
    """A private mutable copy of a cached fixture at ``dest``."""
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(cache_root, dest)
    try:
        os.remove(os.path.join(dest, _KEY_FILE))
    except OSError:
        pass
    return dest


__all__ = ["cached_fixture", "clone_fixture"]
