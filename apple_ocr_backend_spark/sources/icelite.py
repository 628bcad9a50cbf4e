"""icelite — an Iceberg-*semantics* local table layer.

No Iceberg/Delta jars ship in this environment (SURVEY.md §7), so this module
provides the same commit semantics over plain Parquet + a JSON snapshot log:

* data files are written to a staging dir and **atomically renamed** into
  place; a snapshot JSON (id, parent id, data dirs, summary, per-partition
  lineage) is also written via write-temp + ``os.rename`` — the rename is the
  commit point, so a killed job can never expose partial data (readers only
  see data dirs referenced by committed snapshots);
* ``read()`` unions the data dirs of the committed snapshot chain;
* the call sites (`append`, `read`, `last_snapshot`) bind 1:1 to a real
  Iceberg catalog (``df.writeTo(tbl).append()`` / ``spark.read.table``) when
  the runtime jar is present — only this module would change.

Reference analog: the SQLite results store + JSONL structured logs
(``app/db.py:61-91``, ``app/utils/logging.py:62-135``) — here commits carry
lineage + metrics instead of per-request log lines.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_RE = re.compile(r"^v(\d+)\.json$")


def _plain(v):
    """JSON-representable manifest stat value; temporal types become ISO
    strings (ISO-8601 compares lexicographically, so range pruning on them
    still works with string bounds)."""
    import datetime
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
            else v.isoformat()
    return v


class Table:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "_staging"), exist_ok=True)
        # serializes the commit point for same-process concurrent appends
        # (e.g. run_resumable bucket concurrency); a real Iceberg catalog
        # provides this via atomic snapshot CAS + commit retry
        self._commit_lock = threading.Lock()

    # ------------------------------------------------------------------ #
    def snapshots(self) -> list[dict]:
        snaps = []
        snap_dir = os.path.join(self.path, "snapshots")
        for name in os.listdir(snap_dir):
            m = _SNAP_RE.match(name)
            if m:
                with open(os.path.join(snap_dir, name)) as f:
                    snaps.append(json.load(f))
        snaps.sort(key=lambda s: s["snapshot_id"])
        # only the consecutive chain from 1 is committed state
        chain = []
        for i, s in enumerate(snaps, start=1):
            if s["snapshot_id"] != i:
                break
            chain.append(s)
        return chain

    def last_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # ------------------------------------------------------------------ #
    def append(self, df: DataFrame, operation: str = "append",
               summary: dict | None = None,
               lineage: list[dict] | None = None,
               stats_col: str | None = None,
               compacts_chain: bool = False,
               expect_parent: int | None = None,
               _carry_dirs: list[str] | None = None,
               _carry_stats: dict | None = None) -> int:
        """Write df as a new data dir + commit a snapshot. Returns snapshot id.

        ``stats_col`` records the min/max of that column over the written
        data dir in the snapshot manifest (Iceberg's per-file column stats
        analog, at data-dir granularity): readers with a range predicate
        then skip whole committed dirs without opening them
        (``read(between=...)`` / ``data_dirs``).  The stats scan reads the
        freshly written files once, column-pruned to one column.  Values
        must be JSON-representable; timestamps/dates are stored as ISO
        strings (pass ISO strings as the predicate bounds for those).

        ``expect_parent`` is an optimistic-concurrency precondition
        (Iceberg's snapshot CAS): the commit is refused if the current
        last snapshot id differs — required by read-modify-write commits
        like ``compact`` whose input resolved against a specific base.
        ``compacts_chain`` marks the snapshot as holding the FULL table
        state, so readers start from it (see ``_active_snapshots``).

        ``_carry_dirs`` (internal, used by tail-only ``compact``) lists
        ALREADY-COMMITTED data dirs (path-relative) the new snapshot
        re-references ahead of the freshly written one — no data is
        rewritten for them.  ``_carry_stats`` is the carried dirs' manifest
        stats entry, merged with the new dir's so range pruning stays
        correct; carried dirs WITHOUT compatible stats make the snapshot
        drop stats entirely (pruning is conservative — a statless snapshot
        is always read)."""
        data_name = f"{uuid.uuid4().hex}"
        staging = os.path.join(self.path, "_staging", data_name)
        df.write.mode("overwrite").parquet(staging)
        final = os.path.join(self.path, "data", data_name)
        os.rename(staging, final)  # atomic on one filesystem
        stats = None
        if stats_col is not None:
            from pyspark.sql import functions as F
            row = (df.sparkSession.read.parquet(final)
                   .agg(F.min(stats_col).alias("mn"),
                        F.max(stats_col).alias("mx")).first())
            stats = {"column": stats_col,
                     "min": _plain(row["mn"]), "max": _plain(row["mx"])}
            if _carry_dirs:
                if _carry_stats and _carry_stats.get("column") == stats_col:
                    for key, pick in (("min", min), ("max", max)):
                        a, b = stats[key], _carry_stats.get(key)
                        stats[key] = b if a is None else \
                            (a if b is None else pick(a, b))
                else:
                    # carried dirs are unaccounted for — recording the new
                    # dir's bounds as the snapshot's would prune rows the
                    # carried dirs hold
                    stats = None

        with self._commit_lock:
            parent = self.last_snapshot()
            if expect_parent is not None and \
                    (parent["snapshot_id"] if parent else None) \
                    != expect_parent:
                # the written data dir becomes an orphan; vacuum() GCs it
                raise RuntimeError(
                    f"commit conflict: expected parent {expect_parent}, "
                    f"found {parent['snapshot_id'] if parent else None} — "
                    "re-read and retry")
            sid = (parent["snapshot_id"] + 1) if parent else 1
            # an orphan snapshot file beyond the chain break (e.g. a v5
            # whose v4 was removed) would be RESURRECTED into committed
            # state if this append filled the gap with a fresh v4 — refuse
            # loudly instead of silently recommitting aborted data
            snap_dir = os.path.join(self.path, "snapshots")
            orphans = sorted(
                int(m.group(1)) for m in
                (_SNAP_RE.match(n) for n in os.listdir(snap_dir))
                if m and int(m.group(1)) >= sid)
            if orphans:
                raise RuntimeError(
                    f"orphan snapshot(s) v{orphans} exist beyond the "
                    f"committed chain (next id {sid}); appending would "
                    "resurrect them as committed state — run vacuum() "
                    "first")
            snap = {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "committed_at": time.time(),
                "operation": operation,
                "data_dirs": list(_carry_dirs or []) + [f"data/{data_name}"],
                "summary": summary or {},
                "lineage": lineage or [],
            }
            if stats is not None:
                snap["stats"] = stats
            if compacts_chain:
                snap["compacts_chain"] = True
            tmp = os.path.join(self.path, "_staging",
                               f"snap_{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(snap, f)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, os.path.join(self.path, "snapshots", f"v{sid}.json"))
            return sid

    # ------------------------------------------------------------------ #
    def _active_snapshots(self) -> list[dict]:
        """The snapshot suffix a reader needs: everything from the LATEST
        compacting snapshot (whose data dir holds the full table state as
        of its commit) onward; the whole chain when never compacted."""
        chain = self.snapshots()
        for i in range(len(chain) - 1, -1, -1):
            if chain[i].get("compacts_chain"):
                return chain[i:]
        return chain

    def data_dirs(self, between: tuple | None = None) -> list[str]:
        """Active data dirs, optionally pruned by manifest stats.

        ``between=(col, lo, hi)`` skips every dir whose recorded
        [min, max] for ``col`` cannot intersect [lo, hi] — including
        all-NULL dirs (a NULL never satisfies a range predicate).  Dirs
        committed without stats for ``col`` are always kept (pruning is
        conservative; the caller still applies the row filter)."""
        dirs = []
        for s in self._active_snapshots():
            if between is not None:
                st = s.get("stats")
                if st and st.get("column") == between[0]:
                    lo, hi = between[1], between[2]
                    mn, mx = st.get("min"), st.get("max")
                    if mn is None and mx is None:
                        continue
                    if mx < lo or mn > hi:
                        continue
            dirs.extend(os.path.join(self.path, d) for d in s["data_dirs"])
        return dirs

    def compact(self, spark: SparkSession,
                stats_col: str | None = None) -> int | None:
        """Bin-pack the UN-COMPACTED TAIL into one data dir and commit a
        compacting snapshot (Iceberg's rewrite-data-files analog).

        An append-per-micro-batch store (e.g. the streaming ingest-dedup
        corpus) accumulates one dir per epoch; after 10⁴ epochs every
        read unions 10⁴ parquet paths.  Compaction bounds that READ
        fan-in: readers start from the latest compacting snapshot, so
        ``data_dirs()`` is a handful of dirs plus post-compaction appends.

        Only the dirs committed SINCE the previous compacting snapshot are
        rewritten (round-4 verdict #2: the earlier full-store rewrite made
        every Nth epoch an O(store) write — quadratic cumulative write
        amplification on a continuously growing store).  The previous
        compaction's dirs are RE-REFERENCED by the new snapshot, not
        rewritten, so each row is rewritten at most once per compaction
        TIER (here: once), and bytes-written per compaction is O(tail),
        bounded by ``compact_every`` epochs of arrivals.  Read fan-in after
        k compactions is k + (epochs since the last one) — bound it
        further with a periodic full rewrite only if k itself ever grows
        past the read-union budget (10⁴ epochs / compact_every=10 → 10³
        dirs, still one Spark read call).

        History is retained (prior snapshots stay in the chain for lineage
        / ``committed_units``; their dirs remain referenced, so ``vacuum``
        keeps them — like Iceberg, storage is reclaimed only by snapshot
        expiration, which this layer deliberately does not implement
        because the chain's consecutive ids ARE its commit integrity).

        Returns the new snapshot id, or None when there is nothing to
        compact (empty table, or no appends since the last compaction).
        Raises on a concurrent commit between the base read and the
        compacting commit (``expect_parent`` CAS) — re-run to retry; the
        orphaned rewrite dir is vacuumable."""
        base = self.last_snapshot()
        if base is None:
            return None
        active = self._active_snapshots()
        carry_dirs, carry_stats, tail = [], None, active
        if active and active[0].get("compacts_chain"):
            carry_dirs = list(active[0]["data_dirs"])
            carry_stats = active[0].get("stats")
            tail = active[1:]
        tail_dirs = [d for s in tail for d in s["data_dirs"]]
        if not tail_dirs:
            return None
        df = spark.read.parquet(
            *(os.path.join(self.path, d) for d in tail_dirs))
        return self.append(
            df, operation="compact",
            summary={"compacted_dirs": len(tail_dirs),
                     "carried_dirs": len(carry_dirs)},
            stats_col=stats_col, compacts_chain=True,
            expect_parent=base["snapshot_id"],
            _carry_dirs=carry_dirs, _carry_stats=carry_stats)

    def read(self, spark: SparkSession, merge_schema: bool = False,
             between: tuple | None = None) -> DataFrame | None:
        """Union of the committed snapshot chain's data dirs.

        ``merge_schema=True`` is the legacy-row tolerance path (reference:
        rows with <9 fields get defaults at read time,
        ``app/routers/serials.py:249-263``): snapshots written before a
        column existed surface it as NULL instead of failing the read —
        the same imperative-migration tolerance Iceberg gives via schema
        evolution.

        ``between=(col, lo, hi)`` prunes whole data dirs by the manifest
        stats recorded at append time (see ``data_dirs``) — the file-
        skipping Iceberg does from its manifests; the caller still applies
        the row-level filter."""
        dirs = self.data_dirs(between)
        if not dirs:
            return None
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", True)
        return reader.parquet(*dirs)

    def vacuum(self, min_age_sec: float = 3600.0,
               now: float | None = None) -> dict:
        """GC unreferenced files — the Iceberg expire-snapshots /
        remove-orphan-files analog (round-2 verdict #10: without this,
        killed appends leave ``_staging`` dirs and post-chain-break
        snapshot files forever).

        Removes, when older than ``min_age_sec`` (grace period so an
        IN-FLIGHT append — data dir renamed but snapshot not yet committed —
        is never collected; Iceberg's orphan-file GC has the same
        older-than guard):

        * leftover ``_staging`` entries (data writes or snapshot temps that
          never reached their rename);
        * ``data/`` dirs referenced by NO committed-chain snapshot;
        * snapshot files beyond the chain break (e.g. a ``v5.json`` whose
          ``v4`` never committed — unreachable because ``append()`` refuses
          to fill the gap while the orphan exists, so it can never be
          resurrected into committed state).

        Committed state is untouched: ``read()`` before == after.  Returns
        ``{"staging": [...], "data": [...], "snapshots": [...]}`` of removed
        names."""
        import shutil
        if now is None:
            now = time.time()

        def expired(p: str) -> bool:
            try:
                return now - os.path.getmtime(p) >= min_age_sec
            except OSError:
                return False  # vanished concurrently — nothing to do

        removed = {"staging": [], "data": [], "snapshots": []}
        with self._commit_lock:
            chain = self.snapshots()
            referenced = {os.path.basename(d)
                          for s in chain for d in s["data_dirs"]}
            chain_len = len(chain)
            staging = os.path.join(self.path, "_staging")
            for name in os.listdir(staging):
                p = os.path.join(staging, name)
                if expired(p):
                    (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
                    removed["staging"].append(name)
            data_root = os.path.join(self.path, "data")
            for name in os.listdir(data_root):
                p = os.path.join(data_root, name)
                if name not in referenced and expired(p):
                    shutil.rmtree(p)
                    removed["data"].append(name)
            snap_dir = os.path.join(self.path, "snapshots")
            for name in os.listdir(snap_dir):
                m = _SNAP_RE.match(name)
                p = os.path.join(snap_dir, name)
                if m and int(m.group(1)) > chain_len and expired(p):
                    os.remove(p)
                    removed["snapshots"].append(name)
        return removed

    def committed_units(self, key: str = "unit") -> set:
        """Set of work-unit markers recorded in snapshot summaries (the
        resume done-set)."""
        return {s["summary"][key] for s in self.snapshots()
                if key in s.get("summary", {})}
