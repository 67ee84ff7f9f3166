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

Staleness and concurrency (r11 review hardening):

- The content key hashes the SOURCE TABLE FILES (path, mtime, size —
  recursive for directory parquet), the builder's own source, AND the
  source of every library module the builder's output format depends
  on (``code_modules``) — a commit-log or encoder change rebuilds
  instead of serving a round-old fixture.
- The key is IN THE DIRECTORY NAME, and a build stages into a
  pid-suffixed dir that is atomically renamed into place. A live root
  is never deleted out from under a concurrent reader (a key change
  targets a different path; the loser of a same-key rename race keeps
  the winner's dir). Old-key dirs linger in /tmp — bounded by the
  number of key changes, reclaimed by /tmp hygiene."""

from __future__ import annotations

import hashlib
import inspect
import os
import shutil

_OK_FILE = "_FIXTURE_OK"


def _content_key(
    sf_dir: str, tables: list[str], salt: str, code_modules=()
) -> str:
    parts = [salt, os.path.normpath(sf_dir)]
    for mod in code_modules:
        try:
            src = inspect.getsource(mod)
        except (OSError, TypeError):  # builtins/frozen: name only
            src = getattr(mod, "__name__", repr(mod))
        parts.append(hashlib.md5(src.encode("utf-8")).hexdigest())
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


def cached_fixture(
    sf_dir: str, name: str, tables: list[str], build, code_modules=()
) -> str:
    """The pristine fixture dir for (``name``, ``sf_dir`` content,
    ``build`` + ``code_modules`` source). ``build(path)`` populates
    ``path`` on a miss. Returned dir is SHARED — mutate through
    ``clone_fixture`` only."""
    base = os.path.basename(os.path.normpath(sf_dir))
    key = _content_key(
        sf_dir,
        tables,
        hashlib.md5(inspect.getsource(build).encode("utf-8")).hexdigest(),
        code_modules,
    )
    root = f"/tmp/spark_graft_fix_{name}_{base}_{key[:10]}"
    if os.path.isfile(os.path.join(root, _OK_FILE)):
        return root
    tmp = f"{root}.building-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, _OK_FILE), "w") as f:
        f.write(key)
    try:
        os.rename(tmp, root)
    except OSError:
        # a rival completed the same key first: serve theirs, drop ours
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isfile(os.path.join(root, _OK_FILE)):
            raise
    return root


def clone_fixture(cache_root: str, dest: str) -> str:
    """A private mutable copy of a cached fixture at ``dest``."""
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(cache_root, dest)
    try:
        os.remove(os.path.join(dest, _OK_FILE))
    except OSError:
        pass
    return dest


__all__ = ["cached_fixture", "clone_fixture"]
