"""Snapshot-versioned Parquet tables — Iceberg table semantics, Spark-first.

The reference's whole table model is Iceberg: namespaced tables, integer
``snapshot_id`` time travel, append / replace / upsert commits
(reference: ``components/ex-iceberg/src/component.py:30-40``,
``components/wr-iceberg/src/component.py:90-126``). In production this
engine uses the Iceberg Spark connector (see
:mod:`component_iceberg_spark.io.iceberg`); this module provides the same
semantics when the connector jar is absent (as in the test container):
a warehouse directory of Parquet data files plus JSON snapshot manifests.

Layout::

    <warehouse>/<namespace>/<table>/
        data/commit-<sid>/part-*.parquet     # files written by commit <sid>
        snapshots/<sid>.json                 # manifest: files visible at <sid>
        _current                             # latest snapshot id

Design notes (what makes this 100 TB-shaped even though it's small):

- A snapshot manifest lists *data directories*, not rows: commits are
  metadata-only (no rewrite of prior data on append), exactly Iceberg's
  trick. Reading snapshot N is ``spark.read.parquet(*dirs)`` — a normal
  distributed scan with pushdown/pruning intact.
- Upsert rewrites only via a distributed anti-join + union (one shuffle on
  the key), never driver-side row handling; at scale the same plan is what
  Iceberg's copy-on-write MERGE produces.
- Commits are atomic via write-temp-then-rename of the manifest; the
  single-writer assumption matches the reference component. A real
  multi-writer deployment swaps this for the Iceberg REST catalog's
  optimistic commit — which is why the public API mirrors the connector's.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from component_iceberg_spark.io import partition_spec
from component_iceberg_spark.session import local_relation


class SnapshotNotFound(Exception):
    pass


# -- manifest column statistics (Iceberg per-file metrics analogue) ---------
#
# Each commit records, per data directory, the min/max of every leaf column
# (harvested from the Parquet footers — metadata-only, no data scan). Reads
# and copy-on-write mutations use them to SKIP whole directories whose value
# range cannot satisfy a predicate — Iceberg's metrics-based file pruning,
# the layer below hive partition pruning.

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")
_CONJ_RE = re.compile(r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*(.+?)\s*$")


def _nullable_schema_json(t):
    """Recursively force every nullability flag in a Spark schema JSON
    tree to True — the shape parquet INFERENCE returns for any file
    (file sources read all columns as nullable). Commit-time stamped
    dir schemas are normalized through this so an explicit-schema scan
    (:meth:`SnapCatalog._scan_schema`'s uniform fast path) produces a
    read schema bit-identical to the mergeSchema inference it replaces."""
    if isinstance(t, dict):
        tt = t.get("type")
        if tt == "struct":
            return {
                **t,
                "fields": [
                    {
                        **f,
                        "nullable": True,
                        "type": _nullable_schema_json(f["type"]),
                    }
                    for f in t.get("fields", [])
                ],
            }
        if tt == "array":
            return {
                **t,
                "containsNull": True,
                "elementType": _nullable_schema_json(t["elementType"]),
            }
        if tt == "map":
            return {
                **t,
                "valueContainsNull": True,
                "keyType": _nullable_schema_json(t["keyType"]),
                "valueType": _nullable_schema_json(t["valueType"]),
            }
    return t


def _stat_jsonable(v):
    """Normalize a Parquet footer stat value for JSON + comparison.
    Timestamps → fixed-width strings (lexicographic == chronological),
    dates → ISO strings, bytes → utf-8 or None (skip column)."""
    if isinstance(v, _dt.datetime):
        return v.strftime(_TS_FMT)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)):
        return v
    return None


def dir_row_count(path: str) -> int:
    """Total rows under a data dir from Parquet footers (metadata only)."""
    import pyarrow.parquet as pq

    n = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return n


def dir_column_stats(path: str) -> dict[str, list]:
    """Per-column [min, max] over every Parquet file under ``path``, read
    from row-group footers only. Driver-side here (metadata-sized: one
    footer per file); a real deployment distributes footer reads the way
    Iceberg writes metrics at commit time — inside the writing tasks."""
    import pyarrow.parquet as pq

    stats: dict[str, list] = {}
    dropped: set[str] = set()
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    if "." in name or name in dropped:
                        continue  # nested leaves: not prunable by top name
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        dropped.add(name)
                        stats.pop(name, None)
                        continue
                    mn, mx = _stat_jsonable(st.min), _stat_jsonable(st.max)
                    if mn is None or mx is None:
                        dropped.add(name)
                        stats.pop(name, None)
                        continue
                    if name in stats:
                        stats[name][0] = min(stats[name][0], mn)
                        stats[name][1] = max(stats[name][1], mx)
                    else:
                        stats[name] = [mn, mx]
    return stats


# manifest bounds-records bloat cap, shared by the fresh-stamp walk
# (dir_file_bounds) and the compact_manifests fold concatenation — the
# cap must hold whichever path produced the records
DIR_BOUNDS_MAX_GROUPS = 512


def dir_file_bounds(
    path: str, max_groups: int = DIR_BOUNDS_MAX_GROUPS,
    max_stat_len: int = 64
) -> list[dict] | None:
    """Per-ROW-GROUP bounds records for a freshly written data dir —
    the manifest metrics Iceberg stamps at commit time
    (``lower_bounds`` / ``upper_bounds`` / ``null_value_counts``), at
    the granularity ``_dispatch_bounds`` evaluates. Each record is
    ``{"n": rows, "c": {col: [min, max, null_count]}}`` (null_count
    None when the footer omits it). Computed once per commit from the
    same footers ``dir_column_stats`` already walks; serving dispatch
    from the manifest afterwards costs zero I/O (VERDICT r14 finding
    #1 — the per-statement driver-side footer walk).

    Bloat guards: a dir with more than ``max_groups`` row groups
    returns None (no stamp; dispatch falls back to memoized footer
    reads) — at the default parquet row-group size that is ~64 GB in
    one commit dir, where a few hundred manifest records are noise but
    unbounded growth is not. String stats longer than ``max_stat_len``
    are dropped per-column (Iceberg truncates with carry-up instead;
    skipping is sound — absent stats only disable the shortcut)."""
    import pyarrow.parquet as pq

    records: list[dict] = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet") or fn.startswith((".", "_")):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            for rg in range(md.num_row_groups):
                if len(records) >= max_groups:
                    return None
                row_group = md.row_group(rg)
                cols: dict[str, list] = {}
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    if "." in name:
                        # nested leaves: simple_conjuncts can never
                        # reference them (\\w+ column names only), so
                        # stamping them is pure manifest weight — same
                        # exclusion dir_column_stats makes
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    mn = _stat_jsonable(st.min)
                    mx = _stat_jsonable(st.max)
                    if mn is None or mx is None:
                        continue
                    if isinstance(mn, str) and (
                        len(mn) > max_stat_len or len(str(mx)) > max_stat_len
                    ):
                        continue
                    cols[name] = [
                        mn,
                        mx,
                        st.null_count if st.has_null_count else None,
                    ]
                records.append({"n": row_group.num_rows, "c": cols})
    return records


def dir_footer_metrics(
    path: str, max_groups: int = DIR_BOUNDS_MAX_GROUPS,
    max_stat_len: int = 64,
) -> tuple[dict[str, list], int, list[dict] | None]:
    """One-pass fusion of :func:`dir_column_stats`, :func:`dir_row_count`
    and :func:`dir_file_bounds`: every data commit needs all three, and
    running them separately opened every footer three times on the
    driver inside the statement's wall (guide §1.2 "per-task work" at
    the driver: same metadata, one open). Returns
    ``(stats, rows, bounds)`` with each output exactly what its
    standalone function computes — the standalones remain as the
    single-metric entry points and as the semantics spec this fusion is
    pinned against (``test_dir_footer_metrics_matches_standalones``)."""
    import pyarrow.parquet as pq

    stats: dict[str, list] = {}
    dropped: set[str] = set()
    rows = 0
    records: list[dict] | None = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            rows += md.num_rows
            bounds_file = records is not None and not fn.startswith((".", "_"))
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                if bounds_file and len(records) >= max_groups:
                    records, bounds_file = None, False
                cols: dict[str, list] = {}
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    if "." in name:
                        continue  # nested leaves: not prunable by top name
                    st = col.statistics
                    ok = st is not None and st.has_min_max
                    mn = _stat_jsonable(st.min) if ok else None
                    mx = _stat_jsonable(st.max) if ok else None
                    if mn is None or mx is None:
                        if name not in dropped:
                            dropped.add(name)
                            stats.pop(name, None)
                        continue
                    if name not in dropped:
                        if name in stats:
                            stats[name][0] = min(stats[name][0], mn)
                            stats[name][1] = max(stats[name][1], mx)
                        else:
                            stats[name] = [mn, mx]
                    if bounds_file and not (
                        isinstance(mn, str)
                        and (len(mn) > max_stat_len or len(str(mx)) > max_stat_len)
                    ):
                        cols[name] = [
                            mn,
                            mx,
                            st.null_count if st.has_null_count else None,
                        ]
                if bounds_file:
                    records.append({"n": row_group.num_rows, "c": cols})
    return stats, rows, records


# Floating-point footer stats ignore NaN, and Spark orders NaN GREATER
# than every other value (and NaN = NaN) — so a row group [1.0, 2.0,
# NaN] is out of range for ``v > 5`` by its stats while its NaN row
# matches (ADVICE r14 #2). Per-operator soundness with a possible
# unrecorded NaN in the group:
#   may-match  (skip when False): '='  (NaN never equals a real
#     literal), '<', '<=' (NaN sorts high, never satisfies) — sound;
#     '!=', '>', '>=' — a NaN row satisfies them, never skip.
#   must-match (count toward the lower bound when True): '!=', '>',
#     '>=' — the NaN row satisfies them too, sound; '=', '<', '<=' —
#     a NaN row would fail, never certain.
_FLOAT_TYPES = frozenset({"float", "double"})
_FLOAT_MAY_SOUND = frozenset({"=", "<", "<="})
_FLOAT_MUST_SOUND = frozenset({"!=", "<>", ">", ">="})


def _session_tz_is_utc() -> bool:
    """True when the active Spark session evaluates timestamp literals
    in UTC — the only zone where the engine's naive footer-stat domain
    (``_stat_jsonable`` strftime of UTC instants) and the predicate
    literal's session-zone parse coincide for tz-adjusted TIMESTAMP
    columns (ADVICE r14 #1). Conservative: no active session counts
    as non-UTC (timestamp conjuncts then prune/bound nothing)."""
    s = SparkSession.getActiveSession()
    if s is None:
        return False
    try:
        tz = s.conf.get("spark.sql.session.timeZone") or "UTC"
    except Exception:
        return False
    return tz.upper() in ("UTC", "ETC/UTC", "GMT", "ETC/GMT", "Z", "+00:00")


def _bloom_key(v) -> bytes | None:
    """Canonical hash input for a bloom-filter value. Ints and strings
    only — float/timestamp equality lookups are not a pruning use case
    (range stats cover them); bools are too low-cardinality to help.
    The representation is shared by the build side (parquet values) and
    the probe side (parsed predicate literals), so int 5 and the literal
    5 always hash identically."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return b"i:%d" % v
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    return None


def _bloom_indices(key: bytes, bits: int) -> list[int]:
    """k=4 bit positions from one md5 digest (4-byte words mod bits —
    bits is a power of two, so the mod is unbiased enough for pruning)."""
    d = hashlib.md5(key).digest()
    return [
        int.from_bytes(d[i : i + 4], "little") % bits for i in (0, 4, 8, 12)
    ]


def dir_column_blooms(
    path: str, cols: list[str], max_bits: int = 2**18
) -> dict[str, dict]:
    """Per-column bloom filter over every Parquet file under ``path`` —
    the point-lookup complement to :func:`dir_column_stats`: min/max
    cannot skip a directory for ``col = 'x'`` when values interleave
    across commits (every dir's range covers 'x'), a bloom can. Unlike
    the footer-only stats this reads the column pages, so it runs only
    for columns the table explicitly registered (``bloom_cols``) and
    only over the freshly written directory — the same moment Iceberg
    computes its write-time metrics (a real deployment pushes this into
    the writing tasks; driver-side here, like ``dir_column_stats``).

    Sizing: bits = next power of two ≥ 16 × distinct (k=4 → ~2% false
    positives), capped at ``max_bits`` (32 KB of filter, ~44 KB base64
    in the manifest) — an overloaded bloom degrades to fewer skips,
    never to wrong results. Returns {col: {"bits": n, "b64": filter}};
    columns with unhashable types are silently absent (no pruning)."""
    import base64

    import pyarrow.parquet as pq

    values: dict[str, set] = {c: set() for c in cols}
    bad: set[str] = set()
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            f = pq.ParquetFile(os.path.join(root, fn))
            present = [
                c for c in cols
                if c not in bad and c in f.schema_arrow.names
            ]
            if not present:
                continue
            t = f.read(columns=present)
            for c in present:
                for v in t.column(c).to_pylist():
                    if v is None:
                        continue
                    k = _bloom_key(v)
                    if k is None:
                        bad.add(c)
                        values.pop(c, None)
                        break
                    values[c].add(k)
    out: dict[str, dict] = {}
    for c, keys in values.items():
        if not keys:
            continue
        kinds = {k[:1] for k in keys}
        if len(kinds) != 1:
            continue  # cannot happen for one parquet column; be safe
        bits = 64
        while bits < 16 * len(keys) and bits < max_bits:
            bits *= 2
        buf = bytearray(bits // 8)
        for k in keys:
            for i in _bloom_indices(k, bits):
                buf[i >> 3] |= 1 << (i & 7)
        out[c] = {
            "bits": bits,
            "kind": kinds.pop().decode(),
            "b64": base64.b64encode(bytes(buf)).decode(),
        }
    return out


def bloom_maybe_contains(bloom: dict, lit) -> bool:
    """Probe a manifest bloom entry for a predicate literal. Conservative:
    True (dir stays a candidate) for unhashable literals AND for
    literal/column type mismatches — ``v = 5`` against a STRING column
    would hash the int key while the bloom holds string keys, and the
    engine's cast semantics could still match the row, so a kind
    mismatch must never skip (the bloom records its value kind; the
    range-stats path gets the same safety from its TypeError catch). A
    numeric literal parsed as float but integral probes the int key —
    simple_conjuncts yields 5 for ``= 5`` but 5.0 for ``= 5.0``.

    The float→int probe is only sound below 2**53: the engine compares
    ``long_col = double_lit`` by casting the long to double, so beyond
    double precision a stored long can be double-equal yet
    integer-different from the literal — it would hash to a different
    bloom key and the dir would be wrongly skipped while the engine
    filter matches the row. Above that magnitude, never skip."""
    import base64

    if isinstance(lit, float) and lit.is_integer():
        if abs(lit) >= 2.0**53:
            return True  # double-equality is coarser than int identity
        lit = int(lit)
    key = _bloom_key(lit)
    if key is None:
        return True
    if bloom.get("kind") != key[:1].decode():
        return True  # type mismatch or legacy entry: never skip
    buf = base64.b64decode(bloom["b64"])
    return all(
        buf[i >> 3] & (1 << (i & 7))
        for i in _bloom_indices(key, bloom["bits"])
    )


def _merge_dir_blooms(per_dir: list[dict | None]) -> dict:
    """OR-merge per-directory blooms for manifest folding: a column
    survives only if every folded dir carries it at the SAME size (the
    union of the value sets is exactly the OR of the bitarrays). Columns
    that don't line up drop out — absent blooms only disable skipping."""
    import base64

    if any(not b for b in per_dir):
        return {}
    common = set.intersection(*(set(b) for b in per_dir))
    merged: dict[str, dict] = {}
    for c in common:
        sizes = {b[c]["bits"] for b in per_dir}
        kinds = {b[c].get("kind") for b in per_dir}
        if len(sizes) != 1 or len(kinds) != 1 or kinds == {None}:
            continue
        acc = bytearray(base64.b64decode(per_dir[0][c]["b64"]))
        for b in per_dir[1:]:
            for i, byte in enumerate(base64.b64decode(b[c]["b64"])):
                acc[i] |= byte
        merged[c] = {
            "bits": sizes.pop(),
            "kind": kinds.pop(),
            "b64": base64.b64encode(bytes(acc)).decode(),
        }
    return merged


def _merge_dir_stats(per_dir: list[dict | None]) -> dict | None:
    """Merge per-directory [min, max] column stats for manifest
    compaction: min-of-mins / max-of-maxs over columns present in EVERY
    input. A column missing somewhere (schema evolution, no-stats files)
    is dropped — absent stats only disable pruning, never correctness
    (NULL rows from pre-evolution dirs can't match a range predicate
    anyway). Returns None when any input dir carries no stats at all."""
    if any(s is None or not s for s in per_dir):
        return None
    common = set.intersection(*(set(s) for s in per_dir))
    merged: dict[str, list] = {}
    for col in common:
        try:
            merged[col] = [
                min(s[col][0] for s in per_dir),
                max(s[col][1] for s in per_dir),
            ]
        except TypeError:  # mixed jsonable types: no pruning for this col
            continue
    return merged


def simple_conjuncts(predicate: str) -> list[tuple[str, str, object]]:
    """Best-effort decomposition of ``a AND b AND …`` into
    ``(column, op, literal)`` tuples for stats pruning. Returns ``[]``
    whenever the predicate is more complex (OR / NOT / parens / functions):
    no pruning then — never wrong results, just no skipping."""
    if re.search(r"\bOR\b|\(|\bNOT\b|\bIN\b|\bLIKE\b", predicate, re.I):
        return []
    out = []
    for part in re.split(r"\bAND\b", predicate, flags=re.I):
        m = _CONJ_RE.match(part)
        if not m:
            return []
        col, op, raw = m.groups()
        raw = raw.strip()
        if raw.upper().startswith("TIMESTAMP"):
            raw = raw[len("TIMESTAMP"):].strip()
        if len(raw) >= 2 and raw[0] == "'" and raw[-1] == "'":
            # SQL escaping: '' inside the literal is one quote — the
            # engine's filter sees O'Brien, so stats/bloom probes must
            # hash/compare the UNESCAPED value or they wrongly skip
            lit: object = raw[1:-1].replace("''", "'")
        elif _NUM_RE.match(raw):
            lit = float(raw) if "." in raw else int(raw)
        else:
            return []  # column-vs-column or expression: not prunable
        out.append((col, op, lit))
    return out


def _range_may_match(mn, mx, op: str, lit) -> bool:
    """Can any value in [mn, mx] satisfy ``value <op> lit``? Conservative:
    True on any type mismatch."""
    try:
        if op == "=":
            return mn <= lit <= mx
        if op in ("!=", "<>"):
            return not (mn == lit == mx)
        if op == "<":
            return mn < lit
        if op == "<=":
            return mn <= lit
        if op == ">":
            return mx > lit
        if op == ">=":
            return mx >= lit
    except TypeError:
        return True
    return True


def _range_must_match(mn, mx, op: str, lit) -> bool:
    """Does EVERY value in [mn, mx] satisfy ``value <op> lit``? The dual
    of :func:`_range_may_match`, used for count-free LOWER bounds on
    predicate selectivity (``_dispatch_bounds``). NULL rows never satisfy
    a comparison, so callers must separately require a zero null count.
    Conservative: False on any type mismatch or unknown operator."""
    try:
        if op == "=":
            return mn == lit == mx
        if op in ("!=", "<>"):
            return mx < lit or mn > lit
        if op == "<":
            return mx < lit
        if op == "<=":
            return mx <= lit
        if op == ">":
            return mn > lit
        if op == ">=":
            return mn >= lit
    except TypeError:
        return False
    return False


class CommitConflict(Exception):
    """A concurrent commit won the race and this operation's inputs are
    stale. Appends retry transparently (their data is independent of the
    table state); replace/upsert/delete/update/compact must be re-run by
    the caller on the new state — the same contract as Iceberg's
    validation-failed commit exception."""


class SnapCatalog:
    """Filesystem-backed catalog of snapshot-versioned tables.

    API parity with the reference's catalog usage: namespaces
    (``wr-iceberg/src/component.py:90-91``), create/replace/append/upsert
    (``:104-126``), snapshot enumeration
    (``ex-iceberg/src/component.py:148-157``), time-travel reads (``:38``).
    """

    # -- deletion-vector apply gate (see _dv_apply_mode) -----------------
    #
    # The broadcast membership probe (`array_contains`) costs O(rows ×
    # positions-per-file) comparisons per data file and broadcasts one
    # long PER DELETED ROW — both fine at sparse density, both scale-
    # killers at dense density (a 2M-row file with 667k doomed ordinals
    # is ~10^12 comparisons, and a table-wide dense DV is a row-count-
    # sized broadcast payload that can OOM the driver). Above any of
    # these thresholds the read explodes the DV into a (file, pos)
    # anti-join instead: one hash exchange, linear work, no broadcast.
    DV_PROBE_MAX_DENSITY = 0.05          # doomed fraction of scoped rows
    DV_PROBE_MAX_FILE_POSITIONS = 8192   # per-file probe work bound
    DV_PROBE_MAX_TOTAL_POSITIONS = 2_000_000  # broadcast bytes bound (~16 MB)
    # rewrite_deletes_to_dv write parallelism: one output task per this
    # many folded positions (~32 MB of longs) — sparse folds keep the
    # single-file layout, a large accreted backlog fans out
    DV_FOLD_POSITIONS_PER_TASK = 4_000_000
    # a DENSE delete whose ordinals form few contiguous RUNS (the
    # realistic dense shapes: time-range deletes, partition drops,
    # compaction-era tombstones) can still broadcast — as (start, end)
    # ranges, whose bytes and per-row probe work are RUN-count-bounded
    # at any density. Above this many runs in one file, ranges stop
    # compressing and the dense apply falls back to the anti-join; the
    # TOTAL bound caps the broadcast payload across files (a band delete
    # touching 100k files would otherwise broadcast 100k × per-file
    # arrays — the same OOM vector the positions cap closes).
    DV_RANGE_PROBE_MAX_PER_FILE = 128
    DV_RANGE_PROBE_MAX_TOTAL_RANGES = 1_000_000  # ~16 MB of (start, end)
    # prefer the range probe over the ordinal probe at ANY density once
    # positions outnumber runs by this factor (contiguity beats density
    # — the range probe's payload and per-row work are both run-bounded)
    DV_RANGES_PREFER_FACTOR = 64
    # STORAGE layout choice (r15, the Iceberg-v3 roaring-bitmap
    # analogue): once positions outnumber runs by this factor AND the
    # run counts fit the range-probe bounds, the DV file stores
    # (file_path, starts, ends) directly — entry ``layout: "ranges"`` —
    # instead of explicit ordinal arrays. Storage bytes drop from
    # positions-sized to runs-sized, and the read applies the stored
    # ranges with NO derivation pass. The factor is lower than the
    # read-side prefer factor (8 vs 64) because storage pays the
    # compression once at write time while the probe pays its shape on
    # every read: at 8x the stored bytes already shrink 4x (two longs
    # per run vs one per position), and any stored-ranges entry is
    # forced through the ranges apply, which at >=8x is never worse
    # than the ordinal probe. Requiring the probe bounds at WRITE time
    # keeps the invariant that a ranges-layout entry is always
    # broadcastable as-is.
    DV_STORE_RANGES_FACTOR = 8

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        # per-delete-file stat memo for pre-stamp DV entries (immutable
        # files, so the cache can never go stale) — see _dv_apply_mode
        self._legacy_dv_stats: dict[str, tuple[int, int]] = {}
        # per-data-dir footer bounds memo for pre-stamp (legacy/adopted)
        # dirs — data dirs are immutable once published, same staleness
        # argument as _legacy_dv_stats; dirs with an unreadable file are
        # NOT cached (a repaired adopted link changes content without
        # changing the dir name) — see _dispatch_bounds / ADVICE r14 #3
        self._footer_bounds_cache: dict[tuple[str, str, str], list] = {}

    # -- namespaces ---------------------------------------------------------

    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)

    def namespace_exists(self, namespace: str) -> bool:
        return os.path.isdir(os.path.join(self.warehouse, namespace))

    def list_namespaces(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_dir):
            return []
        return sorted(
            d for d in os.listdir(ns_dir)
            if os.path.isdir(os.path.join(ns_dir, d, "snapshots"))
        )

    def table_exists(self, namespace: str, table: str) -> bool:
        return os.path.isfile(self._tbl(namespace, table, "_current"))

    def drop_table(self, namespace: str, table: str) -> None:
        path = os.path.join(self.warehouse, namespace, table)
        if os.path.isdir(path):
            shutil.rmtree(path)

    # -- commits ------------------------------------------------------------

    def check_constraint(self, df: DataFrame, predicate: str) -> None:
        """Plan-level CHECK constraint utility: fail if any row of ``df``
        violates ``predicate`` (the Delta-style table constraint the
        reference's strict-cast gate is the type-level version of). The
        first violation found carries a sample row into the error.
        NOTE: this evaluates the INPUT PLAN in its own job; for commit
        gating, ``append(check=...)`` instead validates the already-
        written files inside :meth:`_commit`, which is immune to
        nondeterministic sources re-executing differently between the
        check job and the write job."""
        bad = df.filter(f"NOT ({predicate})")
        sample = bad.limit(1).collect()
        if sample:
            raise ValueError(
                f"CHECK constraint violated: ({predicate}); "
                f"sample offending row: {sample[0].asDict()}"
            )

    def append(
        self, namespace: str, table: str, df: DataFrame,
        partition_by: list[str] | None = None,
        partition_spec: list[str] | None = None,
        sort_by: list[str] | None = None,
        sort_partitions: int | None = None,
        check: str | None = None,
        bloom_cols: list[str] | None = None,
    ) -> int:
        """Append commit: write new data files, new manifest = old files +
        new dir. No existing data is touched (metadata-only append).

        ``sort_by`` is the ``preserve_insertion_order=true`` writer path
        (``ex-iceberg/src/component.py:106-107``): the commit's files are
        range-partitioned and sorted on the given columns, so a reader
        ordering by ``(_metadata.file_path, _metadata.row_index)`` within
        the commit recovers the insertion order exactly — no single-file
        coalesce, so the ordered export scales like any other write
        (``sort_partitions`` sizes the files). Ordering is per-commit;
        ACROSS commits the data dir names are uuids, so file_path alone
        cannot recover commit order — use :meth:`read_ordered`, whose
        ``_commit_seq`` column exposes the manifest's file-list order.

        ``check`` is a CHECK-constraint predicate: a violating batch
        fails with a sample row and the table is untouched. Validation
        runs against the WRITTEN (still-unpublished) files inside
        :meth:`_commit`, so a nondeterministic source cannot pass a
        pre-write check and then write different rows."""
        return self._commit(
            namespace, table, df, operation="append", carry=True,
            partition_by=partition_by, transform_spec=partition_spec,
            sort_by=sort_by, sort_partitions=sort_partitions, check=check,
            bloom_cols=bloom_cols,
        )

    def create_or_replace(
        self, namespace: str, table: str, df: DataFrame,
        partition_by: list[str] | None = None,
        partition_spec: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> int:
        """Replace commit (drop-and-recreate parity,
        ``wr-iceberg/src/component.py:115-124`` — but as one atomic snapshot
        flip: readers of older snapshots are unaffected).

        ``partition_by`` lays the commit out hive-style by the given
        columns; reads that filter on them prune whole directories
        (PartitionFilters in the scan) — the Iceberg partition-spec
        analogue. ``partition_spec`` is the *hidden* form: transform
        expressions like ``["day(o_orderdate)", "bucket(8, o_custkey)"]``
        (Iceberg hidden partitioning). Readers never see the derived
        columns; ``read(where=...)`` on the SOURCE column converts the
        predicate into partition pruning automatically — see
        :mod:`component_iceberg_spark.io.partition_spec`."""
        self.create_namespace(namespace)
        return self._commit(
            namespace, table, df, operation="replace", carry=False,
            partition_by=partition_by, transform_spec=partition_spec,
            bloom_cols=bloom_cols,
        )

    def add_files(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        src_dir: str,
        compute_stats: bool = True,
        allow_symlink: bool = False,
    ) -> int:
        """Metadata-only import of an EXISTING parquet directory — the
        Iceberg ``add_files`` procedure analogue (pyiceberg 0.9.1, the
        library the reference embeds via
        ``components/common/pyproject.toml:7-18``, exposes it; the
        reference itself has no call site). This is the 100 TB
        *onboarding* verb: adopting a pre-existing lake directory must
        cost one commit, not a rewrite of the bytes.

        No data byte is read into Spark or copied: each parquet file is
        HARD-LINKED into a new data dir of the table (the filesystem
        twin of Iceberg's adopt-in-place manifest entry), and the
        commit carries every parent dir untouched. Hard links make the
        table co-own the bytes — deleting or rewriting the SOURCE
        afterwards cannot corrupt table reads. Across devices no hard
        link is possible; by default that REFUSES rather than silently
        weakening the durability contract. ``allow_symlink=True`` opts
        into a symlink fallback, where the source keeps sole ownership
        of the bytes (delete the source and the table's reads break);
        the adoption marker records ``link_mode`` so an operator can
        audit which contract each adoption carries. Footer-only work on the driver: schema gate,
        row counts, and — when ``compute_stats`` — min/max stats and
        registered blooms for the adopted dir. ``compute_stats=False``
        declares stats absent: :meth:`files` surfaces NULLs and pruning
        keeps the dir a candidate (the documented degradation contract),
        exactly as Iceberg treats metrics-free adopted files.

        Refused: a source inside the table's own layout, a source
        already adopted by this table (double-adoption would double
        rows silently), a hive-partitioned table (adopted flat files
        carry no partition values in their paths), and any schema
        mismatch — (name, type) pairs must equal the table's CURRENT
        logical schema, so adoption composes with rename/drop/widen
        lineage the same way a post-evolution append does.

        Lifecycle composition: the adopted dir is a first-class manifest
        entry — pruning, compaction, expiry, and orphan GC treat it like
        any written dir. GC of a snapshot that drops it removes only the
        links; the source files keep their data (link count)."""
        src_dir = os.path.realpath(src_dir)
        if not os.path.isdir(src_dir):
            raise ValueError(f"add_files source is not a directory: {src_dir}")
        tbl_root = os.path.realpath(self._tbl(namespace, table))
        if os.path.commonpath([src_dir, tbl_root]) == tbl_root:
            raise ValueError(
                "add_files source lies inside the table's own layout: "
                f"{src_dir}"
            )
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if manifest.get("partition_by") or manifest.get("partition_spec"):
            raise ValueError(
                "add_files into a hive-partitioned table is not "
                "supported: adopted files carry no partition values in "
                "their paths"
            )
        # one marker per adoption records the source realpath; a second
        # adoption of the same (or a nested/enclosing) source is refused
        adopt_root = self._tbl(namespace, table, "adopted")
        os.makedirs(adopt_root, exist_ok=True)
        for fn in os.listdir(adopt_root):
            with open(os.path.join(adopt_root, fn)) as f:
                rec = json.load(f)
            prior = rec["src"]
            common = os.path.commonpath([src_dir, prior])
            if common in (src_dir, prior):
                if rec.get("committed") is False:
                    # marker-before-publish leftover of a hard crash:
                    # whether the commit landed is unknown — refuse
                    # loudly with the recovery step instead of risking
                    # silently doubled rows
                    raise ValueError(
                        "add_files found a PENDING adoption marker for "
                        f"{prior} (a prior attempt crashed between marker "
                        "and commit); check list_snapshots for an "
                        "'add_files' commit, then delete "
                        f"{os.path.join(adopt_root, fn)} to retry"
                    )
                raise ValueError(
                    f"add_files source overlaps an already-adopted path: "
                    f"{src_dir} vs {prior}"
                )
        parquet_files = []
        for root, _dirs, fns in os.walk(src_dir):
            for fn in fns:
                if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                    parquet_files.append(os.path.join(root, fn))
        if not parquet_files:
            raise ValueError(f"add_files source has no parquet files: {src_dir}")
        # schema gate against the CURRENT logical schema — plan-only
        # (spark.read.parquet resolves footers, collects nothing)
        self._validate_source_schema(
            namespace, table, manifest, spark.read.parquet(src_dir),
            "add_files",
        )
        nd = f"adopted-{uuid.uuid4().hex[:12]}"
        dst_root = os.path.join(self._tbl(namespace, table, "data"), nd)
        marker = os.path.join(adopt_root, f"{nd}.json")
        link_mode = "hardlink"
        try:
            for src in parquet_files:
                rel = os.path.relpath(src, src_dir)
                dst = os.path.join(dst_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(src, dst)  # adopt-in-place: zero bytes copied
                except OSError:
                    if not allow_symlink:
                        raise ValueError(
                            f"add_files cannot hard-link {src!r} into the "
                            "table (cross-device?); pass "
                            "allow_symlink=True to adopt by symlink — "
                            "NOTE the source then keeps sole ownership "
                            "of the bytes, so deleting or rewriting it "
                            "corrupts table reads"
                        ) from None
                    os.symlink(src, dst)
                    link_mode = "symlink"
            extra_stats: dict[str, dict] = {}
            extra_blooms: dict[str, dict] = {}
            extra_bounds: dict[str, list] = {}
            if compute_stats:
                stats, n_rows, bounds = dir_footer_metrics(dst_root)
                extra_rows = {nd: n_rows}
                if stats:
                    extra_stats[nd] = stats
                if bounds is not None:
                    extra_bounds[nd] = bounds
                bloom_cols = manifest.get("bloom_cols") or []
                if bloom_cols:
                    bl = dir_column_blooms(dst_root, bloom_cols)
                    if bl:
                        extra_blooms[nd] = bl
            else:
                extra_rows = {nd: dir_row_count(dst_root)}
            # marker BEFORE publish: a crash after the commit can no
            # longer leave the adoption unrecorded (the silent-double
            # failure a retry would hit); a crash between the marker
            # and the commit instead leaves a committed=false marker
            # that refuses the retry LOUDLY — the strictly safer side.
            with open(marker, "w") as f:
                json.dump(
                    {"src": src_dir, "dir": nd, "link_mode": link_mode,
                     "committed": False},
                    f,
                )
            sid = self._commit(
                namespace, table, None, operation="add_files",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=manifest["files"] + [nd],
                extra_dir_stats=extra_stats, extra_dir_rows=extra_rows,
                extra_dir_blooms=extra_blooms,
                extra_dir_bounds=extra_bounds,
            )
        except Exception:
            shutil.rmtree(dst_root, ignore_errors=True)
            if os.path.exists(marker):
                os.remove(marker)  # in-band failure: retry stays legal
            raise
        with open(marker, "w") as f:
            json.dump(
                {"src": src_dir, "dir": nd, "link_mode": link_mode,
                 "committed": True, "snapshot_id": sid},
                f,
            )
        return sid

    def upsert(
        self,
        namespace: str,
        table: str,
        delta: DataFrame,
        keys: list[str],
        order_by: str | None = None,
        evolve: bool = False,
    ) -> int:
        """MERGE semantics of pyiceberg ``upsert``
        (``wr-iceberg/src/component.py:107-108``): matched rows take all
        columns from the delta, unmatched delta rows insert; delta-internal
        key duplicates resolve last-wins by ``order_by`` (cross-batch
        last-wins parity, SURVEY §7).

        ``evolve=True`` is the Iceberg ``MERGE … WITH SCHEMA EVOLUTION``
        analogue: the delta may carry ADDITIVE columns (a strict
        superset of the target's), which join the table schema; rows
        from untouched/carried files surface the new columns as NULL on
        read (mergeSchema — same mechanism as append-path evolution in
        ``snap_schema_evolution``). Dropping target columns or changing
        a common column's type stays refused either way — evolution is
        additive only, exactly Iceberg's safe subset.

        Plan: dedupe delta (window over keys) → target anti-join delta →
        union. One shuffle on the key columns; the small side broadcasts
        automatically under AQE.

        Determinism: without ``order_by``, delta-internal key duplicates
        resolve by the md5 of the remaining columns — a partition-layout-
        independent tie-break, so repeated runs of the same upsert always
        keep the same row (``dropDuplicates`` would keep whichever row a
        task saw first). Pass ``order_by`` to express intent (the
        reference's batch pump is deterministic last-by-arrival); the
        hash fallback only guarantees *a* stable winner, not which one.
        """
        spark = delta.sparkSession
        if order_by is not None:
            rank_key = F.col(order_by).desc()
        else:
            non_keys = [c for c in delta.columns if c not in keys]
            # Unambiguous row encoding: to_json escapes separators and
            # distinguishes NULL from any string, so two *distinct* rows
            # can never hash equal (a concat_ws encoding would collide on
            # values containing the separator, silently reverting to
            # arbitrary-winner nondeterminism). Handles complex types too.
            rank_key = F.md5(
                F.to_json(F.struct(*[F.col(c) for c in non_keys]))
            ).desc() if non_keys else F.lit(1).asc()
        w = Window.partitionBy(*keys).orderBy(rank_key)
        delta = (
            delta.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if not self.table_exists(namespace, table):
            return self._commit(
                namespace, table, delta, operation="upsert", carry=False,
                inherit_spec=True,
            )
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        self._validate_source_schema(
            namespace, table, manifest, delta, "upsert", additive_ok=evolve
        )
        candidates, untouched = self._delta_key_pruning(manifest, delta, keys)
        if candidates:
            target = self._read_with_deletes(
                spark, namespace, table, manifest, candidates
            )
            survivors = target.join(delta.select(*keys), keys, "left_anti")
            merged = survivors.unionByName(delta, allowMissingColumns=evolve)
        else:
            merged = delta
        return self._commit(
            namespace, table, merged, operation="upsert", carry=False,
            base_sid=base, inherit_spec=True, carry_dirs=untouched,
        )

    def _validate_source_schema(
        self,
        namespace: str,
        table: str,
        manifest: dict,
        source: DataFrame,
        op: str,
        additive_ok: bool = False,
    ) -> None:
        """Source-vs-target schema gate shared by merge and upsert, run
        BEFORE key-range pruning: on the no-candidate path the source
        commits as a new data dir beside carried target dirs, so a
        divergent source must fail HERE — the candidate path at least
        fails later via unionByName, the no-candidate path would commit
        a mixed-schema table silently. Compares (name, type) pairs: the
        manifest schema is the user schema as Spark JSON (``_commit``),
        so same-name/different-type divergence is caught too, not just
        missing/extra columns. A manifest with no recorded schema
        (legacy snapshot) falls back to the table's physical read schema
        instead of skipping the check. ``additive_ok`` (schema
        evolution): extra source columns are allowed — the source must
        still COVER every target column, and common columns must still
        type-match; evolution never drops or retypes."""
        fields = (manifest.get("schema") or {}).get("fields") or []
        if fields:
            t_types = {f["name"]: f["type"] for f in fields}
        else:
            t_types = {
                f.name: f.dataType.jsonValue()
                for f in self.read(
                    source.sparkSession, namespace, table
                ).schema.fields
            }
        s_types = {
            f.name: f.dataType.jsonValue() for f in source.schema.fields
        }
        if additive_ok:
            missing = set(t_types) - set(s_types)
            if missing:
                raise ValueError(
                    f"{op} with evolve=True: source must cover every "
                    f"target column (evolution is additive only); "
                    f"missing={sorted(missing)}"
                )
        elif set(t_types) != set(s_types):
            raise ValueError(
                f"{op} source schema must match the target: "
                f"target={sorted(t_types)} source={sorted(s_types)}"
            )
        diverged = {
            n: {"target": t_types[n], "source": s_types[n]}
            for n in t_types
            if n in s_types and t_types[n] != s_types[n]
        }
        if diverged:
            raise ValueError(
                f"{op} source column types must match the target: {diverged}"
            )

    def _delta_key_pruning(
        self, manifest: dict, delta: DataFrame, keys: list[str]
    ) -> tuple[list[str], list[str]]:
        """File-pruned copy-on-write (Iceberg MERGE cost shape): a data dir
        whose key-range stats cannot overlap the delta's key range cannot
        contain a matched row — carry it into the new snapshot untouched.
        The bounds job is a column-pruned min/max agg over the delta
        (metadata-sized result; the delta plan runs once more in the
        merge itself). Returns (candidate_dirs, untouched_dirs)."""
        conjuncts: list[tuple[str, str, object]] = []
        aggs = [F.min(k).alias(f"_mn_{k}") for k in keys] + [
            F.max(k).alias(f"_mx_{k}") for k in keys
        ]
        bounds = delta.agg(*aggs).collect()[0]
        # collect() renders tz-adjusted TimestampType in the SYSTEM
        # timezone (datetime.fromtimestamp), while dir_stats live in
        # naive UTC — on a non-UTC host the raw strftime would shift
        # the key range by the host offset and the prune could skip a
        # dir holding matched keys (lost updates; review r15). Anchor
        # the naive local value to the system zone, convert to UTC,
        # drop tzinfo. NTZ timestamps collect as the literal naive
        # value and need no conversion.
        ntz_keys = {
            f.name
            for f in delta.schema.fields
            if f.dataType.typeName() == "timestamp_ntz"
        }

        def to_stats_domain(v, k):
            if isinstance(v, _dt.datetime) and k not in ntz_keys:
                return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v

        for k in keys:
            mn = _stat_jsonable(to_stats_domain(bounds[f"_mn_{k}"], k))
            mx = _stat_jsonable(to_stats_domain(bounds[f"_mx_{k}"], k))
            if mn is None or mx is None:
                conjuncts = []
                break
            conjuncts += [(k, ">=", mn), (k, "<=", mx)]
        if conjuncts:
            return self._split_by_stats(manifest, conjuncts)
        return list(manifest["files"]), []

    def merge(
        self,
        namespace: str,
        table: str,
        source: DataFrame,
        keys: list[str],
        *,
        delete_when: str | None = None,
        update_when: str | None = None,
        insert_when: str | None = None,
        order_by: str | None = None,
        evolve: bool = False,
    ) -> int:
        """Multi-action MERGE (Iceberg ``MERGE INTO`` with several WHEN
        clauses — the general form of :meth:`upsert`, which is the
        two-clause UPDATE*/INSERT* special case the reference drives
        through pyiceberg ``table.upsert``,
        ``wr-iceberg/src/component.py:107-108``):

        - matched  & ``delete_when``            → target row deleted
        - matched  & else & ``update_when``     → row replaced by source
        - matched  & else & not ``update_when`` → target row kept
        - unmatched source & ``insert_when``    → source row inserted
        - unmatched target                      → kept

        Conditions are SQL boolean expressions over the SOURCE row's
        columns (the CDC-apply shape: the source carries the op
        discriminator). Defaults: no deletes, update all matched, insert
        all unmatched — i.e. plain upsert.

        Plan: ONE shuffle — a full-outer join on the key columns with both
        sides packed into structs, then a single CASE projection picks the
        surviving row. File-pruned copy-on-write carries data dirs whose
        key-range stats cannot overlap the source untouched, exactly like
        :meth:`upsert`; source-internal key duplicates resolve with the
        same deterministic last-wins rule.

        ``evolve=True``: additive schema evolution, same contract as
        :meth:`upsert` — extra source columns join the table schema,
        kept/carried target rows surface them as NULL (the target side
        of the full-outer join packs NULL-typed lanes for the new
        columns so both structs share one shape; old files are never
        rewritten).
        """
        spark = source.sparkSession
        if order_by is not None:
            rank_key = F.col(order_by).desc()
        else:
            non_keys = [c for c in source.columns if c not in keys]
            rank_key = F.md5(
                F.to_json(F.struct(*[F.col(c) for c in non_keys]))
            ).desc() if non_keys else F.lit(1).asc()
        w = Window.partitionBy(*keys).orderBy(rank_key)
        source = (
            source.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # action flags evaluated on the source row BEFORE packing, so the
        # conditions see plain column names
        flagged = (
            source.withColumn("_del", F.expr(delete_when or "false"))
            .withColumn("_upd", F.expr(update_when or "true"))
            .withColumn("_ins", F.expr(insert_when or "true"))
        )
        cols = source.columns
        s_pack = flagged.select(
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            F.struct(*[F.col(c) for c in cols]).alias("_s"),
            "_del", "_upd", "_ins",
        )
        if not self.table_exists(namespace, table):
            # every source row is unmatched: insert_when is the only guard
            # (matched-clause conditions never apply, same as below)
            inserts = s_pack.filter(F.col("_ins")).select("_s.*")
            return self._commit(
                namespace, table, inserts, operation="merge", carry=False,
                inherit_spec=True,
            )
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        self._validate_source_schema(
            namespace, table, manifest, source, "merge", additive_ok=evolve
        )
        candidates, untouched = self._delta_key_pruning(
            manifest, source, keys
        )
        if candidates:
            target = self._read_with_deletes(
                spark, namespace, table, manifest, candidates
            )
            # evolution: the target packs NULL-typed lanes for columns
            # only the source carries, so _t and _s share one struct type
            s_types = {f.name: f.dataType for f in source.schema.fields}
            t_lanes = [
                (
                    F.col(c) if c in target.columns
                    else F.lit(None).cast(s_types[c])
                ).alias(c)
                for c in cols
            ]
            t_pack = target.select(
                *[F.col(k).alias(f"_k_{k}") for k in keys],
                F.struct(*t_lanes).alias("_t"),
            )
            joined = t_pack.join(
                s_pack, on=[f"_k_{k}" for k in keys], how="full_outer"
            )
            # Iceberg MERGE clause order: matched rows consult the
            # matched-clauses only (delete wins over update); unmatched
            # source rows consult insert_when only.
            survivor = (
                F.when(F.col("_s").isNull(), F.col("_t"))
                .when(
                    F.col("_t").isNull(),
                    F.when(F.col("_ins"), F.col("_s")),
                )
                .when(F.col("_del"), F.lit(None))
                .when(F.col("_upd"), F.col("_s"))
                .otherwise(F.col("_t"))
            )
            merged = (
                joined.withColumn("_row", survivor)
                .filter(F.col("_row").isNotNull())
                .select("_row.*")
            )
        else:
            merged = s_pack.filter(F.col("_ins")).select("_s.*")
        return self._commit(
            namespace, table, merged, operation="merge", carry=False,
            base_sid=base, inherit_spec=True, carry_dirs=untouched,
        )

    def compact(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        target_partitions: int | None = None,
    ) -> int:
        """Compaction commit: rewrite the current snapshot's (possibly
        many, possibly small) data directories into one coalesced
        directory — content-identical, metadata flipped atomically.

        The Iceberg analogue is ``rewrite_data_files``; the point at scale
        is the same: appends/upserts accrete small files, and scan cost is
        dominated by file count once files are smaller than
        ``maxPartitionBytes``. Readers of prior snapshots are unaffected
        (their manifests still reference the old directories).
        """
        base = self._current_sid(namespace, table)
        df = self.read(spark, namespace, table, snapshot_id=base)
        if target_partitions:
            df = df.coalesce(target_partitions)
        # compaction MATERIALIZES pending merge-on-read deletes (the read
        # above applied them) and clears the entries — Iceberg's
        # rewrite_data_files + rewrite_position_delete_files in one
        return self._commit(
            namespace, table, df, operation="compact", carry=False,
            base_sid=base, inherit_spec=True, clear_deletes=True,
        )

    def compact_manifests(self, namespace: str, table: str) -> int:
        """Manifest compaction (Iceberg ``rewrite_manifests`` analogue):
        fold the current snapshot's many data-directory entries into one
        consolidated directory of HARD LINKS — a pure metadata rewrite.
        No data file is read, decoded, or copied; no Spark job runs.

        This is the cure for the many-tiny-commits pathology the
        reference's per-batch commit loop produces (one commit per 5M-row
        client batch, ``wr-iceberg/src/component.py:97-110``): after k
        batches every scan plans k directory listings and every commit
        carries k manifest entries. ``compact()`` fixes that by REWRITING
        data (useful when the files themselves are small);
        ``compact_manifests`` fixes the metadata half for free when the
        files are fine and only the entry count is the problem.

        Semantics preserved:
        - prior snapshots still reference the original directories
          (time travel intact; hard links mean later GC of either side is
          safe — the inode survives until both are gone),
        - per-dir column stats and row counts are MERGED from the parent
          manifest (min-of-mins / max-of-maxs / sum), so stats pruning and
          metadata-only ``row_count`` keep working without a scan,
        - pending equality deletes: directories are grouped by their
          applicable delete-entry signature and folded PER GROUP, so a
          delete registered before a later append still applies to exactly
          the rows it did before (folding across that boundary would wrongly
          delete the newer rows); entries are remapped to the folded names.
        """
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        files = manifest["files"]
        deletes = manifest.get("deletes", [])
        # dirs covered by a POSITIONAL delete entry must never fold:
        # folding hard-links data files under new basenames, which would
        # orphan the (file_path, pos) addresses the delete file stores.
        # Each such dir gets a unique singleton signature so it is
        # carried as-is (equality entries scope by dir name and survive
        # folding; positional entries scope by file path and don't).
        pos_covered = {
            d
            for e in deletes
            if e.get("mode") in ("positional", "dv")
            for d in e["applies_to"]
        }
        groups: dict[frozenset, list[str]] = {}
        for d in files:
            sig = frozenset(
                i for i, e in enumerate(deletes) if d in e["applies_to"]
            )
            if d in pos_covered:
                # singleton group: the ("solo", d) marker makes the key
                # unique per dir so it can never fold, while the entry
                # INDICES stay in the key — an equality entry covering
                # the same dir must keep it through the remap below
                groups[sig | {("solo", d)}] = [d]
                continue
            groups.setdefault(sig, []).append(d)
        if len(groups) >= len(files):
            return base  # already one entry per delete-signature: no-op
        data_root = self._tbl(namespace, table, "data")
        parent_stats = manifest.get("dir_stats", {})
        parent_rows = manifest.get("dir_rows", {})
        parent_blooms = manifest.get("dir_blooms", {})
        parent_bounds = manifest.get("dir_bounds", {})
        parent_schemas_cm = manifest.get("dir_schemas", {})
        new_files: list[str] = []
        sig_to_dir: dict[frozenset, str] = {}
        extra_stats: dict[str, dict] = {}
        extra_rows: dict[str, int] = {}
        extra_blooms: dict[str, dict] = {}
        extra_bounds: dict[str, list] = {}
        extra_schemas: dict[str, dict] = {}
        linked_dirs: list[str] = []
        for sig, dirs in sorted(groups.items(), key=lambda kv: sorted(kv[1])):
            if len(dirs) == 1:
                sig_to_dir[sig] = dirs[0]
                new_files.append(dirs[0])
                continue
            nd = f"manifest-{uuid.uuid4().hex[:12]}"
            out = os.path.join(data_root, nd)
            for d in dirs:
                src_root = os.path.join(data_root, d)
                for rootdir, _subdirs, fns in os.walk(src_root):
                    rel = os.path.relpath(rootdir, src_root)
                    for fn in fns:
                        if fn.startswith((".", "_")):
                            continue  # _SUCCESS / .crc sidecars
                        dst_dir = (
                            out if rel == "." else os.path.join(out, rel)
                        )
                        os.makedirs(dst_dir, exist_ok=True)
                        # source-dir prefix keeps basenames collision-free
                        # (two commits can share a hive partition subdir)
                        dst = os.path.join(dst_dir, f"{d}__{fn}")
                        src = os.path.join(rootdir, fn)
                        try:
                            os.link(src, dst)
                        except OSError:  # FS without hard links
                            shutil.copy2(src, dst)
            linked_dirs.append(out)
            sig_to_dir[sig] = nd
            new_files.append(nd)
            merged = _merge_dir_stats([parent_stats.get(d) for d in dirs])
            if merged is not None:
                extra_stats[nd] = merged
            if all(d in parent_rows for d in dirs):
                extra_rows[nd] = sum(parent_rows[d] for d in dirs)
            mb = _merge_dir_blooms([parent_blooms.get(d) for d in dirs])
            if mb:
                extra_blooms[nd] = mb
            # a fold hard-links the SAME physical files under the new
            # dir, so per-row-group bounds records concatenate exactly
            # (records carry no file names); any dir without a stamp —
            # or a concatenation exceeding the same bloat cap fresh
            # stamps honor — leaves the folded dir unstamped: absent
            # bounds only disable the dispatch shortcut
            if all(d in parent_bounds for d in dirs):
                cat_records = [
                    r for d in dirs for r in parent_bounds[d]
                ]
                if len(cat_records) <= DIR_BOUNDS_MAX_GROUPS:
                    extra_bounds[nd] = cat_records
            # folded files are the same physical bytes, so when every
            # source dir carried one identical schema stamp the folded
            # dir inherits it (keeps the explicit-schema scan fast path
            # across manifest folds); any disagreement or missing stamp
            # leaves the folded dir unstamped — reads fall back to
            # mergeSchema inference there
            src_schemas = [parent_schemas_cm.get(d) for d in dirs]
            if src_schemas[0] is not None and all(
                s == src_schemas[0] for s in src_schemas[1:]
            ):
                extra_schemas[nd] = src_schemas[0]
        remapped = []
        for i, e in enumerate(deletes):
            if e.get("mode") in ("positional", "dv"):
                # path-scoped dirs never fold (singleton signatures
                # above), so the entry carries its surviving dirs
                # unchanged
                applies = sorted(d for d in e["applies_to"] if d in set(files))
            else:
                applies = sorted(sig_to_dir[sig] for sig in groups if i in sig)
            if applies:
                remapped.append({**e, "applies_to": applies})
        try:
            return self._commit(
                namespace, table, None, operation="compact_manifests",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=new_files, clear_deletes=True,
                extra_deletes=remapped, extra_dir_stats=extra_stats,
                extra_dir_rows=extra_rows, extra_dir_blooms=extra_blooms,
                extra_dir_bounds=extra_bounds, extra_dir_schemas=extra_schemas,
            )
        except CommitConflict:
            for d in linked_dirs:  # don't leave link dirs for orphan GC
                shutil.rmtree(d, ignore_errors=True)
            raise

    def cluster_rewrite(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        sort_col: str,
        n_buckets: int = 8,
    ) -> int:
        """Sort-order data rewrite (Iceberg ``rewrite_data_files`` with a
        sort order — the engine half of ``ALTER TABLE … WRITE ORDERED
        BY``): range-partition the table on ``sort_col`` into
        ``n_buckets`` data directories, each sorted within, and commit
        them as one new snapshot. Content-identical; what changes is the
        STATS SHAPE: every directory's min/max interval on ``sort_col``
        becomes narrow and disjoint, so a predicate scan
        (``read(where=…)``) skips ~(n_buckets − 1)/n_buckets of the data
        via manifest pruning instead of opening every file. This is the
        standard cure for append-order tables where each commit spans the
        full key range and stats pruning can never skip anything — at
        100 TB the difference between a clustered and an append-ordered
        table on a range query is the difference between reading one
        bucket and reading everything.

        One Spark job: ``repartitionByRange`` (range boundaries by
        sampling — layout, not content, so determinism of results is
        unaffected) + per-partition sort, written once via a hive
        ``partitionBy`` on the bucket id, whose subdirectories are then
        promoted to top-level data dirs of the new manifest with their
        own footer-derived stats. Pending merge-on-read deletes are
        materialized (the read applies them) and cleared, as in
        :meth:`compact`. Tables with a hive partition spec are refused —
        cluster order and hive layout are competing physical designs;
        Iceberg tracks them separately and so do we."""
        return self._clustered_rewrite(
            spark, namespace, table, n_buckets, "cluster_rewrite",
            lambda df: F.col(sort_col),
        )

    def zorder_rewrite(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        cols: list[str],
        n_buckets: int = 8,
        bits: int = 8,
    ) -> int:
        """Z-order data rewrite (Iceberg ``rewrite_data_files`` with a
        ``zorder(...)`` strategy): cluster on the bit-interleaved
        space-filling-curve value of SEVERAL columns, so every data
        directory's min/max interval is narrow on EACH of them and a
        predicate on ANY clustered column prunes directories —
        single-column ``cluster_rewrite`` can only ever serve its one
        sort column. This is the standard physical design for tables
        queried along two+ independent dimensions (user × time,
        key × price): at 100 TB the z-curve turns either filter into a
        ~(1 − 1/√n_buckets) directory skip instead of a full scan on
        the unsorted dimension.

        Mechanics: each column is affinely mapped onto a ``bits``-wide
        integer rank using its table-wide min/max (one metadata-sized
        agg), the ranks' bits are interleaved into the z-value with pure
        bit expressions (stays inside whole-stage codegen — no UDF),
        and the shared clustered-commit tail range-partitions on it.
        The z column itself is never written; only the layout changes.
        """
        if not cols or len(cols) < 2:
            raise ValueError("zorder_rewrite needs >= 2 columns")

        def make_z(df: DataFrame) -> Column:
            aggs = []
            for c in cols:
                aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
            b = df.agg(*aggs).collect()[0]  # 1-row bounds: metadata-sized
            max_rank = (1 << bits) - 1
            ranks = []
            for c in cols:
                mn, mx = b[f"_mn_{c}"], b[f"_mx_{c}"]
                if mn is None or mx is None or mx == mn:
                    ranks.append(F.lit(0).cast("long"))
                    continue
                span = float(mx) - float(mn)
                scaled = F.floor(
                    (F.col(c).cast("double") - float(mn)) / span * max_rank
                ).cast("long")
                ranks.append(
                    F.least(F.greatest(scaled, F.lit(0)), F.lit(max_rank))
                )
            z = F.lit(0).cast("long")
            n = len(cols)
            for bit in range(bits):
                for ci, r in enumerate(ranks):
                    z = z.bitwiseOR(
                        F.shiftleft(
                            F.shiftright(r, bit).bitwiseAND(F.lit(1)),
                            bit * n + ci,
                        )
                    )
            return z

        return self._clustered_rewrite(
            spark, namespace, table, n_buckets, "zorder_rewrite", make_z
        )

    def _clustered_rewrite(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        n_buckets: int,
        operation: str,
        make_cluster_col,
    ) -> int:
        """Shared clustered-commit tail for :meth:`cluster_rewrite` /
        :meth:`zorder_rewrite`: range-partition the current content on
        the cluster expression, sort within partitions, hive-write by
        bucket id, promote the bucket dirs to manifest entries with
        footer-derived stats. The cluster column is internal: dropped
        before write (a Project above Sort preserves partition order),
        and the hive bucket column never lands in the data files."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if manifest.get("partition_by") or manifest.get("partition_spec"):
            raise ValueError(
                f"{operation} on a partitioned table: drop the "
                "partition spec first (competing physical layouts)"
            )
        df = self.read(spark, namespace, table, snapshot_id=base)
        bloom_cols = manifest.get("bloom_cols") or []
        bucketed = (
            df.withColumn("_ck", make_cluster_col(df))
            .repartitionByRange(n_buckets, F.col("_ck"))
            .sortWithinPartitions("_ck")
            .drop("_ck")
            .withColumn("_cluster_bucket", F.spark_partition_id())
        )
        data_root = self._tbl(namespace, table, "data")
        tmp_name = f"cluster-{uuid.uuid4().hex[:12]}"
        tmp_root = os.path.join(data_root, f"_tmp_{tmp_name}")
        bucketed.write.mode("overwrite").partitionBy(
            "_cluster_bucket"
        ).parquet(tmp_root)
        new_files: list[str] = []
        extra_stats: dict[str, dict] = {}
        extra_rows: dict[str, int] = {}
        extra_blooms: dict[str, dict] = {}
        extra_bounds: dict[str, list] = {}
        try:
            for sub in sorted(os.listdir(tmp_root)):
                if not sub.startswith("_cluster_bucket="):
                    continue
                nd = f"{tmp_name}-b{sub.split('=')[1]}"
                dst = os.path.join(data_root, nd)
                os.rename(os.path.join(tmp_root, sub), dst)
                new_files.append(nd)
                stats, extra_rows[nd], bounds = dir_footer_metrics(dst)
                if stats is not None:
                    extra_stats[nd] = stats
                if bounds is not None:
                    extra_bounds[nd] = bounds
                if bloom_cols:
                    bl = dir_column_blooms(dst, bloom_cols)
                    if bl:
                        extra_blooms[nd] = bl
            shutil.rmtree(tmp_root, ignore_errors=True)
            return self._commit(
                namespace, table, None, operation="cluster_rewrite",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=new_files,
                clear_deletes=True, extra_dir_stats=extra_stats,
                extra_dir_rows=extra_rows, extra_dir_blooms=extra_blooms,
                extra_dir_bounds=extra_bounds,
                # every dir above is freshly written from a RESOLVED
                # read — logical names/types are materialized, so the
                # rename chain resets (compact()'s semantics); only
                # compact_manifests, which hard-links OLD files, keeps it
                reset_schema_lineage=True,
            )
        except CommitConflict:
            for d in new_files:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
            raise
        finally:
            shutil.rmtree(tmp_root, ignore_errors=True)

    def rollback_to(self, namespace: str, table: str, snapshot_id: int) -> int:
        """Iceberg ``rollback_to_snapshot``: publish a NEW snapshot whose
        content is the target snapshot's manifest verbatim (files, spec,
        schema, stats, pending deletes). History is preserved — the
        intervening snapshots remain time-travelable — and the operation
        is metadata-only: no data file is read, written, or moved.

        Like replace, rollback is last-writer-wins by contract ("set the
        table to state X"), so a publish collision just retries at the
        next id. Fails if the target's data directories were already
        garbage-collected by :meth:`expire_snapshots`."""
        target = self._manifest(namespace, table, snapshot_id)
        for d in target["files"]:
            if not os.path.isdir(self._tbl(namespace, table, "data", d)):
                raise SnapshotNotFound(
                    f"{namespace}.{table}@{snapshot_id}: data dir {d} was "
                    "garbage-collected; rollback target no longer exists"
                )
        while True:
            snaps = self._snapshots(namespace, table)
            sid = snaps[-1]["snapshot_id"] + 1
            manifest = {
                **target,
                "snapshot_id": sid,
                "parent_id": snaps[-1]["snapshot_id"],
                # lineage pointer for the history metadata table: the
                # rollback's CONTENT ancestor is the target, so the
                # undone snapshots fall off the current-ancestor chain
                # (Iceberg history semantics)
                "rollback_of": target["snapshot_id"],
                "timestamp_ms": int(time.time() * 1000),
                "operation": "rollback",
            }
            snap_path = self._tbl(namespace, table, "snapshots", f"{sid}.json")
            try:
                with open(snap_path, "x") as f:
                    json.dump(manifest, f)
                break
            except FileExistsError:
                continue
        cur_tmp = self._tbl(
            namespace, table, f"_current.tmp-{uuid.uuid4().hex}"
        )
        with open(cur_tmp, "w") as f:
            f.write(str(sid))
        os.replace(cur_tmp, self._tbl(namespace, table, "_current"))
        return sid

    def cherry_pick(
        self, namespace: str, table: str, snapshot_id: int
    ) -> int:
        """Iceberg ``cherrypick_snapshot``: re-apply the DELTA an append
        snapshot introduced (its data dirs minus its parent's) onto the
        CURRENT state as a new metadata-only commit. The canonical use
        is rollback recovery: an append gets rolled back, the table
        advances with other work, and the orphaned snapshot's rows are
        recovered WITHOUT re-reading or re-writing its bytes — the dirs
        are re-referenced, stats/blooms carried from the source
        manifest.

        Only append snapshots cherry-pick: a replace/delete/compact
        delta is defined relative to its parent's whole state and
        re-applying it elsewhere silently loses or resurrects rows
        (Iceberg restricts cherry-pick the same way). Refused when the
        delta is already referenced by the current snapshot (double
        apply would double rows), when the source schema differs from
        the current logical schema (the delta's physical names must
        mean the same thing today), and when the delta's dirs were
        garbage-collected."""
        src = self._manifest(namespace, table, snapshot_id)
        # add_files commits are purely additive like appends (their delta
        # is the adopted dirs), so a rolled-back adoption is recoverable
        if src.get("operation") not in ("append", "add_files"):
            raise ValueError(
                f"cherry_pick: snapshot {snapshot_id} is "
                f"{src.get('operation')!r}; only additive snapshots "
                "(append / add_files) have a well-defined re-applicable "
                "delta"
            )
        if src.get("parent_id") is not None:
            parent_files = set(
                self._manifest(namespace, table, src["parent_id"])["files"]
            )
        else:
            parent_files = set()
        delta = [d for d in src["files"] if d not in parent_files]
        if not delta:
            raise ValueError(
                f"cherry_pick: snapshot {snapshot_id} added no data dirs"
            )
        base = self._current_sid(namespace, table)
        cur = self._manifest(namespace, table, base)
        present = [d for d in delta if d in set(cur["files"])]
        if present:
            raise ValueError(
                f"cherry_pick: delta dirs already referenced by the "
                f"current snapshot: {present}"
            )
        src_fields = [
            (f["name"], f["type"])
            for f in (src.get("schema") or {}).get("fields", [])
        ]
        cur_fields = [
            (f["name"], f["type"])
            for f in (cur.get("schema") or {}).get("fields", [])
        ]
        if src_fields != cur_fields:
            raise ValueError(
                "cherry_pick: source snapshot schema differs from the "
                "current schema; evolve/compact first"
            )
        for d in delta:
            if not os.path.isdir(self._tbl(namespace, table, "data", d)):
                raise ValueError(
                    f"cherry_pick: delta dir {d} was garbage-collected"
                )
        src_stats = src.get("dir_stats") or {}
        src_rows = src.get("dir_rows") or {}
        src_blooms = src.get("dir_blooms") or {}
        src_bounds = src.get("dir_bounds") or {}
        return self._commit(
            namespace, table, None, operation="cherry_pick",
            carry=False, base_sid=base, inherit_spec=True,
            carry_dirs=cur["files"] + delta,
            extra_dir_stats={d: src_stats[d] for d in delta if d in src_stats},
            extra_dir_rows={d: src_rows[d] for d in delta if d in src_rows},
            extra_dir_blooms={
                d: src_blooms[d] for d in delta if d in src_blooms
            },
            extra_dir_bounds={
                d: src_bounds[d] for d in delta if d in src_bounds
            },
            extra_dir_schemas={
                d: s
                for d, s in (src.get("dir_schemas") or {}).items()
                if d in delta
            },
        )

    def delete_where(
        self, spark: SparkSession, namespace: str, table: str, predicate: str
    ) -> int:
        """Row-level DELETE (Iceberg ``DELETE FROM`` analogue, copy-on-write):
        survivors are rewritten as a new snapshot; prior snapshots still
        see the deleted rows (time-travelable deletes). At scale Iceberg's
        merge-on-read would write delete files instead — same API."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        # File-pruned rewrite: dirs whose stats cannot satisfy the predicate
        # contain no doomed rows — carried untouched (byte-identical).
        candidates, untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return self._commit(
                namespace, table, None, operation="delete", carry=False,
                base_sid=base, inherit_spec=True, carry_dirs=untouched,
            )
        df = self._read_with_deletes(
            spark, namespace, table, manifest, candidates
        ).filter(f"NOT ({predicate})")
        return self._commit(
            namespace, table, df, operation="delete", carry=False,
            base_sid=base, inherit_spec=True, carry_dirs=untouched,
        )

    def delete_where_mor(
        self, spark: SparkSession, namespace: str, table: str, predicate: str
    ) -> int:
        """Row-level DELETE, merge-on-read as a DELETION VECTOR — the
        MoR twin of :meth:`delete_where` (Iceberg ``DELETE FROM`` with
        ``write.delete.mode=merge-on-read`` on a v3/DV table): doomed
        rows' physical addresses are computed from a positional scan of
        only the PREDICATE-CANDIDATE dirs (stats/bloom pruning — dirs
        that cannot match contribute nothing and are never scanned) and
        committed as one DV entry. No data file is rewritten; the read
        applies the DV as a broadcast membership probe. This is the
        DELETE shape for a small-to-moderate doomed fraction of a huge
        table: delete cost is one pruned scan + a file-count-sized
        metadata write, with the rewrite deferred to compaction.
        Refused while other deletes are pending (positional addressing
        over masked rows is ambiguous — same contract as
        ``read_with_positions``)."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if self._pending_deletes(manifest, manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}: delete_where_mor with pending "
                "merge-on-read deletes is ambiguous — compact() first"
            )
        candidates, _untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return base  # no dir can match: nothing to delete
        scan = self._read_dirs(
            spark, namespace, table, candidates,
            bool(manifest.get("partition_by")), with_positions=True,
            read_schema=self._scan_schema(manifest),
        )
        doomed = self._resolve_schema(scan, manifest).filter(
            predicate
        ).select(self.POS_FILE_COL, self.POS_IDX_COL)
        return self.delete_positions_dv(spark, namespace, table, doomed)

    def _dispatch_bounds(
        self,
        namespace: str,
        table: str,
        manifest: dict,
        candidates: list[str],
        predicate: str,
    ) -> tuple[int, int, int] | None:
        """Count-free ``(lower, upper, total)`` bounds on the rows the
        predicate matches inside the candidate dirs, from parquet FOOTER
        row-group stats — min/max plus null_count, metadata-only, no
        Spark job. This is what feeds the auto-dispatch verbs on their
        stats-served path: a row group whose range can't satisfy some
        conjunct contributes zero matches (NULLs fail comparisons too);
        one where every conjunct is satisfied by the WHOLE range and the
        column has zero nulls contributes all its rows; anything else is
        indeterminate (counts toward ``upper`` only).

        Cost is O(files under the candidate dirs) footer reads,
        driver-side — the same class of work ``dir_column_stats`` does
        at commit time, and always cheaper than the predicate-pushed
        count job it replaces (which scans those same dirs' pages). A
        real deployment stamps these per-file metrics into the manifest
        at write time (Iceberg's manifest ``lower_bounds`` /
        ``upper_bounds`` / ``null_value_counts``) and evaluates the same
        bounds there; reading footers here keeps the layout unchanged.

        Served from the MANIFEST when the statement's dirs carry
        ``dir_bounds`` records (stamped by ``_commit`` /
        ``add_files`` / rewrites — the Iceberg manifest-metrics
        pattern: zero per-statement I/O); pre-stamp dirs fall back to a
        footer walk MEMOIZED per (namespace, table, dir) — data dirs
        are immutable once published, so the cache can never go stale,
        and repeated statements against a legacy snapshot pay the walk
        once (ADVICE r14 #3). A dir with an unreadable file (broken
        symlink-adopted source) is not cached and yields no bounds —
        but only after the remaining candidate dirs have warmed the
        memo, so the work is degraded per-file, not discarded.

        Soundness guards (ADVICE r14 #1/#2): conjuncts on
        FLOAT/DOUBLE columns use only the NaN-sound operator subset
        (footer stats ignore NaN while Spark orders NaN above
        everything — see ``_FLOAT_MAY_SOUND`` / ``_FLOAT_MUST_SOUND``);
        conjuncts on tz-adjusted TIMESTAMP columns are usable only
        when the session timezone is UTC (the literal parses in the
        session zone, the stats are naive UTC instants) — an unusable
        conjunct contributes no skips and no certainty, it never
        disables the other conjuncts.

        Returns None when the bounds machinery can't run at all: a
        non-simple predicate, an unparseable timestamp literal, or an
        unreadable file. Columns renamed since a dir was written
        resolve through the manifest rename chain — the name-reuse
        guard in ``_commit`` makes old physical names unambiguous."""
        conjuncts = simple_conjuncts(predicate)
        if not conjuncts:
            return None
        types = {
            f["name"]: str(f.get("type", ""))
            for f in (manifest.get("schema") or {}).get("fields", [])
        }
        tz_utc = None  # resolved lazily: only timestamp conjuncts care
        normed = []  # (col, op, lit, usable, is_float)
        for col, op, lit in conjuncts:
            t = types.get(col, "")
            usable = True
            if "timestamp" in t and isinstance(lit, str):
                try:
                    dt = _dt.datetime.fromisoformat(lit)
                except ValueError:
                    return None
                if dt.tzinfo is not None:
                    # the literal carries its OWN zone: on a
                    # tz-adjusted column the instant is unambiguous
                    # whatever the session zone — convert to the naive
                    # UTC stats domain (strftime alone would silently
                    # DROP the offset and shift the compare, review
                    # r15); on an NTZ column an explicit offset has no
                    # engine-defined meaning — decline the conjunct
                    if t == "timestamp":
                        dt = dt.astimezone(_dt.timezone.utc).replace(
                            tzinfo=None
                        )
                    else:
                        usable = False
                elif t == "timestamp":  # naive literal, tz-adjusted col:
                    # parses in the session zone — only UTC matches the
                    # stats domain
                    if tz_utc is None:
                        tz_utc = _session_tz_is_utc()
                    usable = tz_utc
                lit = dt.strftime(_TS_FMT)
            normed.append((col, op, lit, usable, t in _FLOAT_TYPES))
        # logical → acceptable physical footer names: a dir written
        # before a rename keeps the old name; retired names can never be
        # reintroduced, so every ancestor along the chain is the same
        # column
        phys: dict[str, set] = {c: {c} for c, _o, _l, _u, _f in normed}
        for old, new in reversed(manifest.get("renames") or []):
            for names in phys.values():
                if new in names:
                    names.add(old)
        dir_bounds = manifest.get("dir_bounds") or {}
        lower = upper = total = 0
        broken = False
        for d in candidates:
            records = dir_bounds.get(d)
            if records is None:
                records = self._footer_bounds_records(namespace, table, d)
            if records is None:
                broken = True  # keep walking: warm the memo for the rest
                continue
            for rec in records:
                n = rec["n"]
                total += n
                stats = rec["c"]
                trips = [
                    next((stats[p] for p in phys[c] if p in stats), None)
                    if usable
                    else None
                    for c, _op, _lit, usable, _f in normed
                ]
                if any(
                    t is not None
                    and not (is_f and op not in _FLOAT_MAY_SOUND)
                    and not _range_may_match(t[0], t[1], op, lit)
                    for t, (_c, op, lit, _u, is_f) in zip(trips, normed)
                ):
                    continue  # no row of this group can match
                upper += n
                if all(
                    t is not None
                    and t[2] == 0
                    and not (is_f and op not in _FLOAT_MUST_SOUND)
                    and _range_must_match(t[0], t[1], op, lit)
                    for t, (_c, op, lit, _u, is_f) in zip(trips, normed)
                ):
                    lower += n  # every row of this group matches
        if broken:
            return None
        return lower, upper, total

    def _footer_bounds_records(
        self, namespace: str, table: str, d: str
    ) -> list[dict] | None:
        """Row-group bounds records for a pre-stamp data dir, from
        parquet footers — the legacy path ``_dispatch_bounds`` takes
        when the manifest carries no ``dir_bounds`` for ``d``.
        Memoized per (namespace, table, dir): data dirs are immutable
        once published. A dir with an unreadable file returns None and
        is NOT cached — repairing a broken adopted link changes the
        dir's content without changing its name, so caching the
        failure (or a partial read) could serve stale bounds forever.
        No record cap here, unlike ``dir_file_bounds`` — nothing is
        persisted, so the only cost is this process's memory."""
        key = (namespace, table, d)
        cached = self._footer_bounds_cache.get(key)
        if cached is not None:
            return cached
        import pyarrow.parquet as pq

        records: list[dict] = []
        root = self._tbl(namespace, table, "data", d)
        for rdir, _sub, fns in os.walk(root):
            for fn in sorted(fns):
                if not fn.endswith(".parquet") or fn.startswith((".", "_")):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(rdir, fn)).metadata
                except OSError:
                    return None  # degrade this dir only; do not cache
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    cols = {}
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        st = col.statistics
                        if st is not None and st.has_min_max:
                            mn = _stat_jsonable(st.min)
                            mx = _stat_jsonable(st.max)
                            if mn is not None and mx is not None:
                                cols[col.path_in_schema] = (
                                    mn,
                                    mx,
                                    st.null_count
                                    if st.has_null_count
                                    else None,
                                )
                    records.append({"n": row_group.num_rows, "c": cols})
        self._footer_bounds_cache[key] = records
        return records

    def delete_where_auto(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        predicate: str,
        cow_density: float = 0.2,
    ) -> int:
        """Row-level DELETE with the physical strategy chosen by MEASURED
        doom density — the auto-selection layer over the two DELETE
        shapes (Iceberg exposes the same choice as a static table
        property, ``write.delete.mode``; here the engine measures and
        picks per statement, the way Spark's AQE picks join strategies
        at runtime). One predicate-pushed count over only the
        stats/bloom-pruned candidate dirs yields the doomed fraction:
        at or below ``cow_density`` the delete is merge-on-read as a
        deletion vector (:meth:`delete_where_mor` — metadata-sized
        commit, rewrite deferred to compaction); above it, copy-on-write
        (:meth:`delete_where` — deleting most of a dir means the
        deferred rewrite dominates anyway, and a dense DV would tax
        every read with an anti-join until compaction). Pending
        merge-on-read deletes force the CoW path (DV authoring over
        masked rows is refused; CoW is always legal).

        The decision is served COUNT-FREE whenever footer row-group
        stats bound the doomed fraction decisively on one side of
        ``cow_density`` (:meth:`_dispatch_bounds` — metadata reads, no
        job), so the common equality/range statement pays exactly ONE
        candidate-dir scan: the chosen verb's own. Only when the bounds
        straddle the threshold does one combined aggregate measure the
        real density (matched and total in the SAME job — the predicate
        reaches the parquet reader as a pushed filter), still small next
        to either delete's own work."""
        if not 0.0 < cow_density <= 1.0:
            raise ValueError(f"cow_density must be in (0, 1]: {cow_density}")
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if self._pending_deletes(manifest, manifest["files"]):
            return self.delete_where(spark, namespace, table, predicate)
        candidates, _untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return base  # no dir can match: nothing to delete
        bounds = self._dispatch_bounds(
            namespace, table, manifest, candidates, predicate
        )
        if bounds is not None:
            lower, upper, total = bounds
            if upper == 0:
                return base  # footer proof: no row can match
            if total and lower / total > cow_density:
                return self.delete_where(spark, namespace, table, predicate)
            if total and upper / total <= cow_density:
                return self.delete_where_mor(
                    spark, namespace, table, predicate
                )
        # bounds straddle the threshold (or can't run): measure — one
        # combined aggregate yields matched AND total in a single job
        scan = self._resolve_schema(
            self._read_dirs(
                spark, namespace, table, candidates,
                bool(manifest.get("partition_by")),
                read_schema=self._scan_schema(manifest),
            ),
            manifest,
        )
        row = scan.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.expr(predicate)).alias("m"),
        ).first()
        cand_rows, doomed_n = int(row["n"]), int(row["m"] or 0)
        if doomed_n == 0:
            return base
        if cand_rows and doomed_n / cand_rows > cow_density:
            return self.delete_where(spark, namespace, table, predicate)
        return self.delete_where_mor(spark, namespace, table, predicate)

    def update_where(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        predicate: str,
        assignments: dict[str, str],
    ) -> int:
        """Row-level UPDATE (Iceberg ``UPDATE … SET`` analogue, copy-on-write):
        matching rows get the SET expressions, others pass through, one new
        snapshot. ``assignments`` maps column → SQL expression."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        # File-pruned rewrite, same as delete_where: only dirs that can
        # contain predicate matches are rewritten.
        candidates, untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return self._commit(
                namespace, table, None, operation="update", carry=False,
                base_sid=base, inherit_spec=True, carry_dirs=untouched,
            )
        df = self._read_with_deletes(
            spark, namespace, table, manifest, candidates
        )
        for col_name, expr in assignments.items():
            df = df.withColumn(
                col_name,
                F.when(F.expr(predicate), F.expr(expr)).otherwise(F.col(col_name)),
            )
        return self._commit(
            namespace, table, df, operation="update", carry=False,
            base_sid=base, inherit_spec=True, carry_dirs=untouched,
        )

    def update_where_mor(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        predicate: str,
        assignments: dict[str, str],
    ) -> int:
        """Row-level UPDATE, merge-on-read — the MoR twin of
        :meth:`update_where` (Iceberg ``UPDATE … SET`` with
        ``write.update.mode=merge-on-read``): ONE atomic commit that
        (a) masks the matched rows' physical addresses with a deletion
        vector and (b) appends their updated images as one new small
        data dir. No candidate dir is rewritten — update cost is one
        stats/bloom-pruned scan plus a matched-rows-sized write, with
        the rewrite deferred to compaction, exactly the delete-file +
        re-insert pair Iceberg's MoR UPDATE emits. The DV scopes only
        the dirs the addresses touch, so the appended images (a new
        dir) are never masked. Readers see old rows masked and new rows
        visible atomically because both land in the same manifest
        publish. Refused while other deletes are pending (positional
        addressing over masked rows is ambiguous — the
        ``read_with_positions`` contract)."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if self._pending_deletes(manifest, manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}: update_where_mor with pending "
                "merge-on-read deletes is ambiguous — compact() first"
            )
        candidates, _untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return base  # no dir can match: nothing to update
        scan = self._read_dirs(
            spark, namespace, table, candidates,
            bool(manifest.get("partition_by")), with_positions=True,
            read_schema=self._scan_schema(manifest),
        )
        doomed = self._resolve_schema(scan, manifest).filter(predicate)
        # SET targets must exist — the CoW twin fails on an unknown
        # column (unresolvable in its otherwise() branch); silently
        # accepting one here would fork the schema on a typo
        user_cols = {
            c for c in doomed.columns
            if c not in (self.POS_FILE_COL, self.POS_IDX_COL)
            and not c.startswith("_pt_")
        }
        unknown = sorted(set(assignments) - user_cols)
        if unknown:
            raise ValueError(
                f"update_where_mor SET targets not in the table schema: "
                f"{unknown}"
            )
        # ONE evaluation of the predicate feeds BOTH jobs (the DV write
        # and the image append): without the checkpoint, a
        # nondeterministic predicate would mask one row set and append
        # images of another — silent loss/duplication (the same
        # double-execution hazard _commit's `check` closes for writes)
        doomed = doomed.localCheckpoint()
        updated = doomed
        for col_name, expr in assignments.items():
            updated = updated.withColumn(col_name, F.expr(expr))
        drop = [self.POS_FILE_COL, self.POS_IDX_COL] + [
            c for c in updated.columns if c.startswith("_pt_")
        ]
        updated = updated.drop(*drop)
        out, entry = self._dv_write_entry(
            spark, namespace, table, manifest, doomed
        )
        if entry is None:
            return base  # predicate matched zero rows
        try:
            return self._commit(
                namespace, table, updated, operation="update",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), extra_deletes=[entry],
            )
        except Exception:
            # safe to sweep on ANY failure: _commit can no longer raise
            # after publish (the _current hint write is best-effort), so
            # an exception here means no manifest references the file
            shutil.rmtree(out, ignore_errors=True)
            raise

    def update_where_auto(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        predicate: str,
        assignments: dict[str, str],
        cow_density: float = 0.2,
    ) -> int:
        """Row-level UPDATE with the physical strategy chosen by MEASURED
        match density — the UPDATE twin of :meth:`delete_where_auto`,
        completing the auto-dispatch matrix (Iceberg pins the choice
        statically via ``write.update.mode``; here one predicate-pushed
        count picks per statement): at or below ``cow_density`` the
        update is merge-on-read (:meth:`update_where_mor` — DV mask +
        image append, no dir rewritten); above it, copy-on-write
        (:meth:`update_where` — updating most of a dir means MoR would
        nearly double its bytes AND tax every read with a dense apply
        until compaction). Pending merge-on-read deletes force the CoW
        path (MoR authoring is refused over masked rows).

        Dispatch cost matches :meth:`delete_where_auto`: COUNT-FREE from
        footer row-group bounds when they land decisively on one side of
        ``cow_density`` (one candidate-dir scan total — the chosen
        verb's own), one combined matched+total aggregate otherwise."""
        if not 0.0 < cow_density <= 1.0:
            raise ValueError(f"cow_density must be in (0, 1]: {cow_density}")
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        if self._pending_deletes(manifest, manifest["files"]):
            return self.update_where(
                spark, namespace, table, predicate, assignments
            )
        candidates, _untouched = self._prune_dirs(manifest, predicate)
        if not candidates:
            return base  # no dir can match: nothing to update
        bounds = self._dispatch_bounds(
            namespace, table, manifest, candidates, predicate
        )
        if bounds is not None:
            lower, upper, total = bounds
            if upper == 0:
                return base  # footer proof: no row can match
            if total and lower / total > cow_density:
                return self.update_where(
                    spark, namespace, table, predicate, assignments
                )
            if total and upper / total <= cow_density:
                return self.update_where_mor(
                    spark, namespace, table, predicate, assignments
                )
        # bounds straddle the threshold (or can't run): measure — one
        # combined aggregate yields matched AND total in a single job
        scan = self._resolve_schema(
            self._read_dirs(
                spark, namespace, table, candidates,
                bool(manifest.get("partition_by")),
                read_schema=self._scan_schema(manifest),
            ),
            manifest,
        )
        row = scan.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.expr(predicate)).alias("m"),
        ).first()
        cand_rows, matched_n = int(row["n"]), int(row["m"] or 0)
        if matched_n == 0:
            return base
        if cand_rows and matched_n / cand_rows > cow_density:
            return self.update_where(
                spark, namespace, table, predicate, assignments
            )
        return self.update_where_mor(
            spark, namespace, table, predicate, assignments
        )

    def delete_keys(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        keys_df: DataFrame,
        key_cols: list[str],
    ) -> int:
        """Merge-on-read DELETE (Iceberg v2 equality-delete analogue):
        write the doomed keys as a SMALL delete file and publish a
        metadata-only commit — no data rewrite. The entry records which
        data dirs it applies to (those visible at delete time), so rows
        of the same key appended LATER are not masked — Iceberg's
        sequence-number scoping. Reads anti-join the delete keys;
        ``compact`` materializes pending deletes and clears them.

        This is the right DELETE shape when the doomed set is small
        relative to the table (the common case): copy-on-write
        ``delete_where`` rewrites whole candidate dirs, merge-on-read
        writes KBs and defers the rewrite to the next compaction."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        del_dir_name = f"delete-{uuid.uuid4().hex[:12]}"
        out = self._tbl(namespace, table, "deletes", del_dir_name)
        keys_df.select(*key_cols).distinct().coalesce(1).write.parquet(out)
        entry = {
            "dir": del_dir_name,
            "key_cols": list(key_cols),
            "applies_to": list(manifest["files"]),
        }
        return self._commit(
            namespace, table, None, operation="delete", carry=False,
            base_sid=base, inherit_spec=True,
            carry_dirs=list(manifest["files"]), extra_deletes=[entry],
        )

    # column names a positional scan exposes to delete authors
    POS_FILE_COL = "_pos_file"
    POS_IDX_COL = "_pos_idx"

    def read_with_positions(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Scan exposing each row's physical address — (data file path,
        row ordinal within the file) as ``_pos_file``/``_pos_idx`` — the
        handle a caller needs to author Iceberg-v2-style POSITIONAL
        deletes (``delete_positions``). Addresses come from Spark's
        ``_metadata.file_path``/``row_index`` hidden columns, so the
        scan stays fully distributed and adds no shuffle.

        Refuses while merge-on-read deletes are pending: a position
        authored against a masked row would be ambiguous — compact (or
        author against a clean snapshot) first, matching the
        ``read_ordered``/``row_count`` pending-delete contracts."""
        sid = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, sid)
        if self._pending_deletes(manifest, manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}: read_with_positions with pending "
                "merge-on-read deletes is ambiguous — compact() first"
            )
        out = self._resolve_schema(
            self._read_dirs(
                spark, namespace, table, list(manifest["files"]),
                bool(manifest.get("partition_by")), with_positions=True,
                read_schema=self._scan_schema(manifest),
            ),
            manifest,
        )
        # hidden transform-partition columns never reach callers (the
        # read() contract) — the POS columns are the only additions
        hidden = [c for c in out.columns if c.startswith("_pt_")]
        return out.drop(*hidden) if hidden else out

    def delete_positions(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        pos_df: DataFrame,
    ) -> int:
        """Merge-on-read POSITIONAL delete (the other Iceberg v2 delete
        format, reference ex-iceberg's pyiceberg table contract: v2
        tables carry equality deletes AND (file_path, pos) delete files
        — the format compaction engines emit). ``pos_df`` carries the
        doomed rows' physical addresses as ``_pos_file``/``_pos_idx``
        (author them with ``read_with_positions``). The delete file is
        written with Iceberg's positional-delete schema (file_path,
        pos); the commit is metadata-only — no data rewrite.

        Scoping is TIGHTER than ``delete_keys``: the entry records only
        the data dirs the addresses actually touch (derived from the
        file paths), so untouched dirs keep folding in
        ``compact_manifests`` and their read groups never pay this
        entry's anti-join. Positions are additionally physical — they
        name files — so rows appended later can never be masked even
        inside a scoped dir. Reads anti-join on (file, pos);
        ``compact`` materializes and clears pending positional deletes
        exactly like equality ones. ``compact_manifests`` never folds a
        dir covered by a positional entry (folding hard-links data files
        under new basenames, which would orphan the stored paths)."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        del_dir_name = f"posdelete-{uuid.uuid4().hex[:12]}"
        out = self._tbl(namespace, table, "deletes", del_dir_name)
        (
            pos_df.select(
                F.col(self.POS_FILE_COL).alias("file_path"),
                F.col(self.POS_IDX_COL).cast("long").alias("pos"),
            )
            .distinct()
            .coalesce(1)
            .write.parquet(out)
        )
        # scope to the dirs the addresses actually TOUCH (derivable from
        # the file paths for free), not every dir visible at delete
        # time: untouched dirs stay foldable by compact_manifests and
        # their read groups skip this entry's anti-join entirely. The
        # dir-name extraction is representation-safe — commit dir names
        # are uuid hex, never URI-escaped.
        touched = {
            r["d"]
            for r in spark.read.parquet(out)
            .select(
                F.regexp_extract(
                    F.col("file_path"), r"/data/([^/]+)/", 1
                ).alias("d")
            )
            .distinct()
            .collect()
        }
        entry = {
            "dir": del_dir_name,
            "mode": "positional",
            "applies_to": sorted(
                d for d in manifest["files"] if d in touched
            ),
        }
        if not entry["applies_to"]:
            # nothing addressed: don't publish a dead entry (and don't
            # leave the empty delete file for orphan GC to chase)
            shutil.rmtree(out, ignore_errors=True)
            return base
        try:
            return self._commit(
                namespace, table, None, operation="delete", carry=False,
                base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), extra_deletes=[entry],
            )
        except CommitConflict:
            shutil.rmtree(out, ignore_errors=True)  # no manifest refs it
            raise

    def compact_position_deletes(
        self, spark: SparkSession, namespace: str, table: str
    ) -> int:
        """Iceberg ``rewrite_position_delete_files`` analogue: merge all
        pending POSITIONAL delete files into one, dropping dead
        addresses, without touching data files. Every streaming upsert /
        CDC-style pipeline accretes small delete files; at read time
        each costs one anti-join pass over its scoped group, so
        maintenance folds them.

        Two properties make the merge safe that would NOT hold for
        equality entries: a positional address can only ever mask its
        exact (file, ordinal) row, so (a) widening ``applies_to`` to the
        union of the sources' scopes cannot mask later-appended rows
        (their files are different), and (b) addresses whose file no
        longer sits under a live scoped dir are DEAD — a CoW rewrite
        already materialized them — and are dropped here. Equality
        entries are semantic (key-scoped) and are carried unchanged.

        No-op (returns the current snapshot id) with fewer than two
        pending positional entries."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        entries = manifest.get("deletes", [])
        pos = [e for e in entries if e.get("mode") == "positional"]
        if len(pos) < 2:
            return base
        keep = [e for e in entries if e.get("mode") != "positional"]
        merged = None
        for e in pos:
            df = spark.read.parquet(
                self._tbl(namespace, table, "deletes", e["dir"])
            )
            merged = df if merged is None else merged.unionByName(df)
        # drop dead addresses: only files under a live scoped dir can
        # still be masked. Match on the /data/<dirname>/ COMPONENT, not
        # the absolute warehouse path: stored addresses are Spark
        # _metadata URIs (file:…, percent-encoded), so an absolute-path
        # substring silently misses on any warehouse path with
        # URI-escaped characters and would drop LIVE addresses —
        # dir names are uuid hex and never escape, so the component
        # match is representation-safe (a false keep is harmless: the
        # address simply never matches a scanned row).
        scope = sorted({d for e in pos for d in e["applies_to"]})
        live = [
            F.col("file_path").contains(f"/data/{d}/") for d in scope
        ]
        alive = live[0]
        for cond in live[1:]:
            alive = alive | cond
        del_dir_name = f"posdelete-{uuid.uuid4().hex[:12]}"
        out = self._tbl(namespace, table, "deletes", del_dir_name)
        merged.filter(alive).distinct().coalesce(1).write.parquet(out)
        entry = {
            "dir": del_dir_name,
            "mode": "positional",
            "applies_to": [d for d in scope if d in set(manifest["files"])],
        }
        try:
            return self._commit(
                namespace, table, None,
                operation="rewrite_position_deletes",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), clear_deletes=True,
                extra_deletes=keep + [entry],
            )
        except CommitConflict:
            # no manifest references the merged file yet — sweep it
            # (the compact_manifests link-dir discipline)
            shutil.rmtree(out, ignore_errors=True)
            raise

    def _dv_write_relation(
        self,
        spark: SparkSession,
        out: str,
        pos_rel: DataFrame,
        live_dirs: list[str],
        namespace: str,
        table: str,
    ) -> tuple[list[str], dict, str | None]:
        """Runs-first DV writer shared by every DV-authoring path
        (``_dv_write_entry`` per-statement, ``rewrite_deletes_to_dv``
        fold): ONE gaps-and-islands pass over the (file_path, pos)
        relation yields per-file run arrays plus the position/run stats
        the read gate consumes — computed BEFORE any bytes land, so the
        storage layout is chosen from the same numbers the apply gate
        reads and nothing is ever written twice.

        Layout choice (r15): positions >= ``DV_STORE_RANGES_FACTOR`` x
        runs AND runs inside the range-probe bounds stores
        ``(file_path, starts, ends)`` directly (``layout "ranges"`` —
        runs-sized bytes, the Iceberg-v3 roaring-bitmap analogue; the
        read applies it with no derivation pass). Otherwise the
        explicit sorted ordinal form (``layout "positions"``), expanded
        from the run arrays with vectorized ``sequence``/``flatten``
        (positions < factor x runs bounds the per-row expansion).

        Write parallelism: the positions form fans out one task per
        ``DV_FOLD_POSITIONS_PER_TASK`` positions — the exact volume is
        already known from the stats pass, so per-statement writes get
        the same protection the fold got in r14 (a huge scattered DV no
        longer serializes through one task). The ranges form is
        run-bounded (<= ~16 MB by the probe caps) and keeps one file.

        Plan cost: one shuffle total — the window's hash exchange on
        file_path also satisfies both downstream groupBys (subset
        clustering), where the r14 flow paid the write shuffle AND a
        second full pass for ``_dv_stats``. The file-count-sized runs
        relation is localCheckpoint'ed so the stats aggregate and the
        write both read it without recomputing the source scan (the
        ``update_where_mor`` one-evaluation discipline).

        Returns ``(applies_to, stats, layout)``; layout None (nothing
        written) when no position addresses a live dir."""
        # duplicates would both split runs (the row_number offset jumps)
        # and inflate counts — dedup here so every caller is covered
        pos_rel = pos_rel.dropDuplicates(["file_path", "pos"])
        runs = (
            pos_rel.withColumn(
                "_grp",
                F.col("pos")
                - F.row_number().over(
                    Window.partitionBy("file_path").orderBy("pos")
                ),
            )
            .groupBy("file_path", "_grp")
            .agg(
                F.min("pos").alias("s"),
                F.max("pos").alias("e"),
                F.count(F.lit(1)).alias("c"),
            )
        )
        per_file = (
            runs.groupBy("file_path")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("s"), F.col("e")))
                ).alias("_runs"),
                F.sum("c").alias("_n"),
                F.count(F.lit(1)).alias("_nr"),
            )
            .select(
                "file_path",
                F.col("_runs.s").alias("starts"),
                F.col("_runs.e").alias("ends"),
                "_n",
                "_nr",
            )
            .localCheckpoint()
        )
        # dir extraction is anchored to THIS table's data root, not a
        # bare /data/ match — a warehouse path that itself contains a
        # /data/ segment would capture the wrong component, empty the
        # applies_to scope, and silently drop the delete (review r15)
        dir_re = (
            re.escape(f"/{namespace}/{table}/data/") + r"([^/]+)/"
        )
        row = per_file.select(
            F.regexp_extract("file_path", dir_re, 1).alias("d"),
            "_n",
            "_nr",
        ).agg(
            F.collect_set("d").alias("dirs"),
            F.sum("_n").alias("n"),
            F.max("_n").alias("mx"),
            F.sum("_nr").alias("nrt"),
            F.max("_nr").alias("nrm"),
        ).first()
        stats = {
            "n_positions": int(row["n"] or 0),
            "max_file_positions": int(row["mx"] or 0),
            "n_ranges": int(row["nrt"] or 0),
            "max_file_ranges": int(row["nrm"] or 0),
        }
        touched = set(row["dirs"] or [])
        applies_to = sorted(d for d in live_dirs if d in touched)
        try:
            if not applies_to or stats["n_positions"] == 0:
                return [], stats, None
            if (
                stats["n_ranges"] > 0
                and stats["n_positions"]
                >= self.DV_STORE_RANGES_FACTOR * stats["n_ranges"]
                and stats["max_file_ranges"]
                <= self.DV_RANGE_PROBE_MAX_PER_FILE
                and stats["n_ranges"]
                <= self.DV_RANGE_PROBE_MAX_TOTAL_RANGES
            ):
                per_file.select("file_path", "starts", "ends").coalesce(
                    1
                ).write.parquet(out)
                return applies_to, stats, "ranges"
            tasks = max(
                1,
                -(-stats["n_positions"] // self.DV_FOLD_POSITIONS_PER_TASK),
            )
            pos_out = per_file.select(
                "file_path",
                F.flatten(
                    F.zip_with(
                        "starts", "ends", lambda s, e: F.sequence(s, e)
                    )
                ).alias("positions"),
            )
            # explicit keyed repartition, not coalesce, when fanning
            # out: AQE collapses tiny partitions and coalesce can only
            # shrink — the user repartition pins the write parallelism
            # (r14 fold contract, now shared by per-statement writes)
            pos_out = (
                pos_out.repartition(tasks, "file_path")
                if tasks > 1
                else pos_out.coalesce(1)
            )
            pos_out.write.parquet(out)
            return applies_to, stats, "positions"
        finally:
            # release the checkpointed blocks eagerly: for a scattered
            # DV the starts/ends arrays are effectively positions-sized
            # and a long-lived session authoring many DVs would
            # otherwise hold every statement's blocks until the JVM-side
            # ContextCleaner gets to them (review r15)
            per_file.unpersist()

    @staticmethod
    def _dv_positions_relation(keys_df: DataFrame, layout: str) -> DataFrame:
        """Expand a stored DV relation of either layout back to
        (file_path, pos) rows — the fold/merge path's layout bridge.
        Ranges expand with vectorized ``sequence`` (two explodes, no
        struct field names to depend on)."""
        if layout == "ranges":
            return keys_df.select(
                "file_path",
                F.explode(
                    F.zip_with(
                        "starts", "ends", lambda s, e: F.sequence(s, e)
                    )
                ).alias("_run"),
            ).select("file_path", F.explode("_run").alias("pos"))
        return keys_df.select(
            "file_path", F.explode("positions").alias("pos")
        )

    def _dv_write_entry(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        manifest: dict,
        pos_df: DataFrame,
    ) -> tuple[str, dict | None]:
        """Write a DV delete file from (``POS_FILE_COL``,
        ``POS_IDX_COL``) rows and build its STAMPED manifest entry —
        the one authoring path ``delete_positions_dv`` and
        ``update_where_mor`` share, so the position/run stats the read
        gate consumes can never drift between writers. Returns
        ``(delete file path, entry)``; entry is None (and nothing
        written) when no live dir is addressed. The entry records the
        storage ``layout`` (``_dv_write_relation``'s choice) so the
        read side dispatches without inspecting file schemas."""
        del_dir_name = f"dvdelete-{uuid.uuid4().hex[:12]}"
        out = self._tbl(namespace, table, "deletes", del_dir_name)
        pos_rel = pos_df.select(
            F.col(self.POS_FILE_COL).alias("file_path"),
            F.col(self.POS_IDX_COL).cast("long").alias("pos"),
        )
        applies_to, stats, layout = self._dv_write_relation(
            spark, out, pos_rel, list(manifest["files"]), namespace, table
        )
        if layout is None:
            return out, None
        return out, {
            "dir": del_dir_name,
            "mode": "dv",
            "layout": layout,
            "applies_to": applies_to,
            **stats,
        }

    def delete_positions_dv(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        pos_df: DataFrame,
    ) -> int:
        """Merge-on-read DELETE as a DELETION VECTOR — the Iceberg v3 /
        Delta-DV evolution of the positional delete file
        (``delete_positions``): instead of one (file_path, pos) ROW per
        doomed row, ONE row per touched data file carrying the sorted
        int array of its deleted ordinals (the explicit-array form of
        the roaring bitmap; this container has no roaring codec, and
        the array keeps the entry a plain parquet value).

        Why a third format: positional-file density is the failure mode
        of the r11 format — a delete touching 1M rows of one file costs
        1M delete ROWS and an anti-join whose build side is
        row-count-sized. The DV entry for the same delete is ONE row
        whose array is run-length-friendly parquet. The relation is
        file-count-sized in ROWS but positions-sized in BYTES, so the
        read-side apply is DENSITY-GATED (``_dv_apply_mode``): at
        sparse density it broadcasts and rows probe their file's sorted
        ordinal array with NO shuffle; at dense density (where the
        probe's O(rows × positions-per-file) work and the broadcast
        payload both blow up) the read explodes it back into a
        (file, pos) anti-join. Writers stamp ``n_positions`` /
        ``max_file_positions`` on the entry so the gate costs reads
        nothing. Storage stays DV either way — the gate picks the apply
        PLAN, not the format.
        Same scoping, folding, and maintenance contracts as positional
        entries: scoped to touched dirs, never folded by
        ``compact_manifests``, materialized + cleared by ``compact``,
        rewritten by ``rewrite_deletes_to_dv``."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        out, entry = self._dv_write_entry(
            spark, namespace, table, manifest, pos_df
        )
        if entry is None:
            return base
        try:
            return self._commit(
                namespace, table, None, operation="delete", carry=False,
                base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), extra_deletes=[entry],
            )
        except CommitConflict:
            shutil.rmtree(out, ignore_errors=True)
            raise

    def rewrite_deletes_to_dv(
        self, spark: SparkSession, namespace: str, table: str
    ) -> int:
        """Maintenance: fold EVERY pending path-scoped delete entry —
        r11 positional files and existing DVs alike — into ONE deletion
        vector, dropping dead addresses, without touching data files
        (the DV-era successor of ``compact_position_deletes``: same
        dead-address and scope-union contracts, but the output is the
        one-row-per-file format, so k accreted delete files collapse to
        ONE entry and the read side goes from k apply passes to one —
        a shuffle-free broadcast probe at sparse density, a single
        anti-join at dense density; the folded entry carries the
        position stats the gate reads, see ``_dv_apply_mode``).

        Address-level safety is identical to the positional fold: a
        (file, ordinal) can only mask its exact row, so unioning scopes
        masks nothing new, and addresses whose file no longer lives
        under a scoped dir are dead (a CoW rewrite materialized them) —
        dropped here. Equality entries are semantic and carried
        unchanged. No-op when there is nothing to fold (no path-scoped
        entries, or already exactly one DV)."""
        base = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, base)
        entries = manifest.get("deletes", [])
        pos = [e for e in entries if e.get("mode") in ("positional", "dv")]
        if not pos or (len(pos) == 1 and pos[0]["mode"] == "dv"):
            return base
        keep = [e for e in entries if e.get("mode") not in ("positional", "dv")]
        merged = None
        for e in pos:
            df = spark.read.parquet(
                self._tbl(namespace, table, "deletes", e["dir"])
            )
            if e["mode"] == "dv":
                df = self._dv_positions_relation(
                    df, e.get("layout", "positions")
                )
            merged = df if merged is None else merged.unionByName(df)
        # dead-address drop: same representation-safe /data/<dir>/
        # component match as compact_position_deletes
        scope = sorted({d for e in pos for d in e["applies_to"]})
        live_scope = [d for d in scope if d in set(manifest["files"])]
        if not live_scope:
            # every scoped dir was since rewritten: all addresses are
            # dead — publish the equality entries only, no DV at all
            return self._commit(
                namespace, table, None, operation="rewrite_to_dv",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), clear_deletes=True,
                extra_deletes=keep,
            )
        alive = F.col("file_path").contains(f"/data/{scope[0]}/")
        for d in scope[1:]:
            alive = alive | F.col("file_path").contains(f"/data/{d}/")
        del_dir_name = f"dvdelete-{uuid.uuid4().hex[:12]}"
        out = self._tbl(namespace, table, "deletes", del_dir_name)
        # the shared runs-first writer (r15) handles everything the r14
        # fold special-cased: layout choice (an accreted backlog of
        # band deletes folds into a runs-sized ``ranges`` entry),
        # size-aware write fan-out for the scattered form (from the
        # EXACT folded volume — the stats pass runs before the write —
        # not the r14 footer estimate), and the gate stats stamp (the
        # fold must not launder a dense DV into an unstamped entry)
        applies_to, stats, layout = self._dv_write_relation(
            spark, out, merged.filter(alive), live_scope, namespace, table
        )
        if layout is None:
            # every address was dead after all: equality entries only
            return self._commit(
                namespace, table, None, operation="rewrite_to_dv",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), clear_deletes=True,
                extra_deletes=keep,
            )
        entry = {
            "dir": del_dir_name,
            "mode": "dv",
            "layout": layout,
            "applies_to": applies_to,
            **stats,
        }
        try:
            return self._commit(
                namespace, table, None, operation="rewrite_to_dv",
                carry=False, base_sid=base, inherit_spec=True,
                carry_dirs=list(manifest["files"]), clear_deletes=True,
                extra_deletes=keep + [entry],
            )
        except CommitConflict:
            shutil.rmtree(out, ignore_errors=True)
            raise

    def _pending_deletes(
        self, manifest: dict, dir_names: list[str]
    ) -> list[dict]:
        return [
            e for e in manifest.get("deletes", [])
            if set(e["applies_to"]) & set(dir_names)
        ]

    def _dv_apply_mode(
        self, manifest: dict, entry: dict, keys_df: DataFrame
    ) -> str:
        """Representation choice for the DV read apply — three plans by
        measured shape, all decided from entry-stamped stats (no job):

        - ``probe`` (sparse): the file-count-sized relation broadcasts,
          rows probe their file's sorted ordinal array. Shuffle-free;
          per-row work O(positions-per-file), payload positions-sized —
          both fine below the density/size gates.
        - ``ranges`` (dense but contiguous): positions collapse to few
          (start, end) runs — time-range deletes, partition drops — so
          the broadcast payload and the per-row ``exists`` probe are
          RUN-count-bounded at ANY density. Still shuffle-free.
        - ``anti`` (dense and scattered): the only shape where nothing
          small exists to broadcast; explode into a (file, pos)
          anti-join — one hash exchange, linear work, bounded memory.

        Dense means ANY of: doomed fraction of the scoped dirs' rows
        above ``DV_PROBE_MAX_DENSITY``, a single file carrying more than
        ``DV_PROBE_MAX_FILE_POSITIONS`` ordinals, or total positions
        above ``DV_PROBE_MAX_TOTAL_POSITIONS``.

        Contiguity beats density (r14): whenever positions outnumber
        runs by ``DV_RANGES_PREFER_FACTOR`` and the run counts fit the
        probe bounds, ``ranges`` wins outright — even at sparse density
        the ordinal probe pays O(positions-per-file) per row while the
        range probe pays O(runs-per-file), so a sparse-but-contiguous
        band (a range delete over a range-organized file) must not fall
        into the sparse ordinal plan."""
        n = entry.get("n_positions")
        mx = entry.get("max_file_positions")
        if n is None or mx is None:
            # legacy unstamped entry: one tiny aggregate, memoized per
            # delete file (they are immutable) so repeat reads of an
            # old warehouse don't pay a Spark job per scan forever
            cached = self._legacy_dv_stats.get(entry["dir"])
            if cached is None:
                row = keys_df.select(
                    F.sum(F.size("positions")).alias("n"),
                    F.max(F.size("positions")).alias("mx"),
                ).first()
                cached = (int(row["n"] or 0), int(row["mx"] or 0))
                self._legacy_dv_stats[entry["dir"]] = cached
            n, mx = cached
        mfr = entry.get("max_file_ranges")
        nrt = entry.get("n_ranges")
        ranges_fit = (
            mfr is not None
            and mfr <= self.DV_RANGE_PROBE_MAX_PER_FILE
            and nrt is not None
            and nrt <= self.DV_RANGE_PROBE_MAX_TOTAL_RANGES
        )
        # CONTIGUITY BEATS DENSITY (r14): when the ordinals collapse to
        # far fewer runs than positions, the range probe strictly
        # dominates the ordinal probe — payload AND per-row work drop
        # from O(positions-per-file) to O(runs-per-file) — so prefer it
        # even at sparse density. The motivating shape is a range
        # predicate's MoR delete over a range-organized file: ~6k
        # contiguous ordinals are ONE run, and probing a 6k-long array
        # per row is ~6000× the work of one between() check (measured:
        # snap_delete_auto's range lane, bench r14).
        if ranges_fit and nrt and n >= self.DV_RANGES_PREFER_FACTOR * nrt:
            return "ranges"
        dense = (
            mx > self.DV_PROBE_MAX_FILE_POSITIONS
            or n > self.DV_PROBE_MAX_TOTAL_POSITIONS
        )
        if not dense:
            dir_rows = manifest.get("dir_rows") or {}
            scoped = [dir_rows.get(d) for d in entry["applies_to"]]
            if scoped and all(s is not None for s in scoped):
                total = sum(scoped)
                dense = bool(total) and n / total > self.DV_PROBE_MAX_DENSITY
        if not dense:
            return "probe"
        if ranges_fit:
            return "ranges"
        return "anti"

    @staticmethod
    def _runs_of(positions) -> tuple[list[int], list[int]]:
        """Collapse a SORTED, duplicate-free ordinal array into maximal
        contiguous runs: returns (starts, ends), inclusive on both ends.
        The pure kernel under the ranges apply — property-pinned in
        tests/test_snaptable.py (every ordinal covered by exactly one
        run, no run covers a non-member, runs are maximal)."""
        import numpy as np

        a = np.asarray(positions, dtype=np.int64)
        if a.size == 0:
            return [], []
        brk = np.where(np.diff(a) != 1)[0]
        starts = np.concatenate(([a[0]], a[brk + 1]))
        ends = np.concatenate((a[brk], [a[-1]]))
        return starts.tolist(), ends.tolist()

    @staticmethod
    def _dv_ranges_relation(keys_df: DataFrame) -> DataFrame:
        """Collapse a DV relation's per-file sorted ordinal arrays into
        (starts, ends) run arrays — executed over the FILE-count-sized
        delete relation (Arrow-batched numpy diff per file row, never
        per data row), so deriving ranges costs one tiny pass however
        many rows they delete."""
        import pandas as pd

        runs_of = SnapCatalog._runs_of

        def gen(batches):
            for pdf in batches:
                rows = []
                for fp, arr in zip(pdf["file_path"], pdf["positions"]):
                    starts, ends = runs_of(arr)
                    rows.append((fp, starts, ends))
                yield pd.DataFrame(
                    rows, columns=["file_path", "starts", "ends"]
                )

        return keys_df.select("file_path", "positions").mapInPandas(
            gen,
            schema="file_path string, starts array<long>, ends array<long>",
        )

    def _read_with_deletes(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        manifest: dict,
        dir_names: list[str],
        partition_filters: list[str] | None = None,
    ) -> DataFrame:
        """Scan with pending equality deletes applied: dirs are grouped by
        their applicable delete-entry set; each group anti-joins its
        delete keys (small side — broadcasts), groups union back. With no
        pending deletes this is a plain scan.

        ``partition_filters`` are predicates over the *hidden* partition
        columns of a transform-partitioned table (see
        :mod:`partition_spec`); they are applied while those columns are
        still visible — Spark turns them into PartitionFilters, pruning
        directories at file-listing time — and the hidden columns are then
        dropped so callers always see the user schema."""
        partitioned = bool(manifest.get("partition_by"))
        deletes = self._pending_deletes(manifest, dir_names)
        scan_schema = self._scan_schema(manifest)
        if not deletes:
            out = self._resolve_schema(
                self._read_dirs(
                    spark, namespace, table, dir_names, partitioned,
                    read_schema=scan_schema,
                ),
                manifest,
            )
        else:
            groups: dict[frozenset, list[str]] = {}
            for d in dir_names:
                key = frozenset(
                    i for i, e in enumerate(deletes) if d in e["applies_to"]
                )
                groups.setdefault(key, []).append(d)
            out = None
            for key, dirs in sorted(groups.items(), key=lambda kv: sorted(kv[0])):
                # positional entries anti-join on the rows' physical
                # (file, ordinal) address, which must be projected at
                # SCAN time (hidden _metadata columns don't survive a
                # union), so the group's read carries them when needed
                needs_pos = any(
                    deletes[i].get("mode") in ("positional", "dv")
                    for i in key
                )
                # schema resolution runs BEFORE the anti-joins: delete
                # entries authored after a rename reference logical names
                # (pre-rename entries refuse the rename — compact first)
                part = self._resolve_schema(
                    self._read_dirs(
                        spark, namespace, table, dirs, partitioned,
                        with_positions=needs_pos, read_schema=scan_schema,
                    ),
                    manifest,
                )
                for i in sorted(key):
                    e = deletes[i]
                    keys_df = spark.read.parquet(
                        self._tbl(namespace, table, "deletes", e["dir"])
                    )
                    if e.get("mode") == "positional":
                        doomed = keys_df.select(
                            F.col("file_path").alias(self.POS_FILE_COL),
                            F.col("pos").alias(self.POS_IDX_COL),
                        )
                        part = part.join(
                            doomed,
                            [self.POS_FILE_COL, self.POS_IDX_COL],
                            "left_anti",
                        )
                    elif e.get("mode") == "dv":
                        # deletion vector: one row per touched file.
                        # SHAPE-GATED apply (_dv_apply_mode): sparse →
                        # broadcast ordinal probe (shuffle-free);
                        # dense-but-contiguous → broadcast RANGE probe
                        # (run-count-bounded bytes and work at any
                        # density, still shuffle-free);
                        # dense-and-scattered → exploded (file, pos)
                        # anti-join (one hash exchange, linear work).
                        # A ``layout: "ranges"`` entry (r15 storage)
                        # holds (starts, ends) run arrays, guaranteed
                        # inside the probe bounds by its writer — the
                        # ranges apply is forced (the other plans would
                        # read a ``positions`` column that does not
                        # exist, and at the stored >= 8x compression
                        # the range probe dominates them anyway).
                        layout = e.get("layout", "positions")
                        mode = (
                            "ranges"
                            if layout == "ranges"
                            else self._dv_apply_mode(manifest, e, keys_df)
                        )
                        if mode == "anti":
                            doomed = keys_df.select(
                                F.col("file_path").alias(self.POS_FILE_COL),
                                F.explode("positions").alias(
                                    self.POS_IDX_COL
                                ),
                            )
                            part = part.join(
                                doomed,
                                [self.POS_FILE_COL, self.POS_IDX_COL],
                                "left_anti",
                            )
                        elif mode == "ranges":
                            # stored-ranges entries broadcast the file
                            # AS IS — zero derivation; positions-layout
                            # entries that the contiguity gate routed
                            # here derive runs once over the
                            # file-count-sized relation
                            rng_src = (
                                keys_df
                                if layout == "ranges"
                                else self._dv_ranges_relation(keys_df)
                            )
                            rng = rng_src.select(
                                F.col("file_path").alias(
                                    self.POS_FILE_COL
                                ),
                                F.col("starts").alias("_dv_starts"),
                                F.col("ends").alias("_dv_ends"),
                            )
                            pos_col = F.col(self.POS_IDX_COL)
                            # zip_with, not arrays_zip: arrays_zip names
                            # its struct fields after the input columns,
                            # which is version-sensitive Spark behavior —
                            # a rename to '0'/'1' would silently break
                            # the lambda's field access. zip_with carries
                            # no field names to depend on.
                            in_a_run = F.exists(
                                F.zip_with(
                                    F.col("_dv_starts"),
                                    F.col("_dv_ends"),
                                    lambda s, e: (pos_col >= s)
                                    & (pos_col <= e),
                                ),
                                lambda hit: hit,
                            )
                            part = (
                                part.join(
                                    F.broadcast(rng),
                                    [self.POS_FILE_COL],
                                    "left",
                                )
                                .filter(
                                    F.col("_dv_starts").isNull()
                                    | ~in_a_run
                                )
                                .drop("_dv_starts", "_dv_ends")
                            )
                        else:
                            dv = keys_df.select(
                                F.col("file_path").alias(self.POS_FILE_COL),
                                F.col("positions").alias("_dv_positions"),
                            )
                            part = (
                                part.join(
                                    F.broadcast(dv),
                                    [self.POS_FILE_COL],
                                    "left",
                                )
                                .filter(
                                    F.col("_dv_positions").isNull()
                                    | ~F.array_contains(
                                        F.col("_dv_positions"),
                                        F.col(self.POS_IDX_COL),
                                    )
                                )
                                .drop("_dv_positions")
                            )
                    else:
                        part = part.join(keys_df, e["key_cols"], "left_anti")
                if needs_pos:
                    part = part.drop(self.POS_FILE_COL, self.POS_IDX_COL)
                out = part if out is None else out.unionByName(
                    part, allowMissingColumns=True
                )
        for col, pred in partition_filters or []:
            # a filter is only applicable when its derived column survived
            # stats pruning / spec evolution into this scan
            if col in out.columns:
                out = out.filter(pred)
        # drop EVERY hidden transform column, not just the current spec's:
        # after partition-spec evolution, directories written under older
        # specs surface their own _pt_* columns through the union
        hidden = [c for c in out.columns if c.startswith("_pt_")]
        if hidden:
            out = out.drop(*hidden)
        return out

    def expire_snapshots(
        self, namespace: str, table: str, keep_last: int = 1
    ) -> list[int]:
        """Snapshot GC (Iceberg ``expire_snapshots`` analogue): drop all but
        the newest ``keep_last`` snapshot manifests, then delete data
        directories no retained snapshot references. Returns expired ids.

        Metadata-first ordering makes the physical delete safe: a reader
        holding an expired id fails fast on the missing manifest rather
        than scanning half-deleted data.
        """
        snaps = self._snapshots(namespace, table)
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        # ref-reachable snapshots are never expired (Iceberg semantics:
        # branches/tags pin their snapshots through GC)
        pinned = {r["snapshot_id"] for r in self.list_refs(namespace, table)}
        expired = [
            s for s in snaps[:-keep_last] if s["snapshot_id"] not in pinned
        ]
        retained = snaps[-keep_last:] + [
            s for s in snaps[:-keep_last] if s["snapshot_id"] in pinned
        ]
        return self._drop_snapshots(namespace, table, expired, retained)

    def expire_snapshots_policy(
        self,
        namespace: str,
        table: str,
        keep_last: int = 1,
        branch_keep: dict[str, int] | None = None,
    ) -> list[int]:
        """Per-branch retention GC (the Iceberg branch-level
        ``min-snapshots-to-keep`` property applied through
        ``expire_snapshots``): beyond the main history's newest
        ``keep_last``, each branch named in ``branch_keep`` retains its
        newest N ANCESTORS — the snapshots at-or-before the branch head
        in history order — so a long-lived audit/staging branch keeps
        its own rollback window while the main line is trimmed
        aggressively. Every ref head (branch or tag) stays pinned
        regardless, same as :meth:`expire_snapshots`. Returns expired
        ids."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self._snapshots(namespace, table)
        refs = {r["name"]: r for r in self.list_refs(namespace, table)}
        retained_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
        retained_ids.update(r["snapshot_id"] for r in refs.values())
        for name, keep in (branch_keep or {}).items():
            if keep < 1:
                raise ValueError(f"branch_keep[{name!r}] must be >= 1")
            if name not in refs:
                raise SnapshotNotFound(
                    f"{namespace}.{table} has no ref {name!r}"
                )
            if refs[name]["type"] != "branch":
                # a tag is immutable: granting it an ancestor-retention
                # window would pin history forever behind a ref that can
                # never advance — refuse, like retarget_branch does
                raise ValueError(
                    f"ref {name!r} is a tag; branch_keep applies to "
                    "branches only (tag heads are always pinned)"
                )
            head = refs[name]["snapshot_id"]
            ancestors = [s for s in snaps if s["snapshot_id"] <= head]
            retained_ids.update(
                s["snapshot_id"] for s in ancestors[-keep:]
            )
        expired = [s for s in snaps if s["snapshot_id"] not in retained_ids]
        retained = [s for s in snaps if s["snapshot_id"] in retained_ids]
        return self._drop_snapshots(namespace, table, expired, retained)

    def _drop_snapshots(
        self,
        namespace: str,
        table: str,
        expired: list[dict],
        retained: list[dict],
    ) -> list[int]:
        """Shared physical GC tail: remove expired manifests
        metadata-first, then data/delete directories no retained
        manifest still references."""
        for s in expired:
            os.remove(
                self._tbl(namespace, table, "snapshots", f"{s['snapshot_id']}.json")
            )
        # Delete ONLY directories the expired manifests referenced and no
        # retained manifest still does (Iceberg expire_snapshots semantics).
        # A directory referenced by NO manifest is either a failed commit's
        # orphan or a concurrent commit's data written before its manifest
        # publishes — deleting it here would corrupt the winner's table;
        # that cleanup belongs to remove_orphans() with an age threshold.
        live_dirs = {d for s in retained for d in s["files"]}
        expired_dirs = {d for s in expired for d in s["files"]}
        data_root = self._tbl(namespace, table, "data")
        for d in sorted(expired_dirs - live_dirs):
            shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
        # same rule for equality-delete files: drop only those the expired
        # manifests referenced and no retained manifest still does
        live_del = {
            e["dir"] for s in retained for e in s.get("deletes", [])
        }
        expired_del = {
            e["dir"] for s in expired for e in s.get("deletes", [])
        }
        del_root = self._tbl(namespace, table, "deletes")
        for d in sorted(expired_del - live_del):
            shutil.rmtree(os.path.join(del_root, d), ignore_errors=True)
        return [s["snapshot_id"] for s in expired]

    # -- refs: named snapshots (Iceberg branch/tag API analogue) ------------

    def create_tag(self, namespace: str, table: str, name: str,
                   snapshot_id: int | None = None) -> None:
        """Immutable named ref to a snapshot (Iceberg ``CREATE TAG``).
        Defaults to the current snapshot."""
        self._write_ref(namespace, table, name, "tag", snapshot_id,
                        overwrite=False)

    def create_branch(self, namespace: str, table: str, name: str,
                      snapshot_id: int | None = None) -> None:
        """Movable named ref (Iceberg ``CREATE BRANCH``)."""
        self._write_ref(namespace, table, name, "branch", snapshot_id,
                        overwrite=False)

    def retarget_branch(self, namespace: str, table: str, name: str,
                        snapshot_id: int) -> None:
        """Move a branch to another snapshot (fast-forward/rollback).
        Tags refuse — they are immutable by contract."""
        ref = self._read_ref(namespace, table, name)
        if ref["type"] != "branch":
            raise ValueError(f"ref {name!r} is a tag; tags are immutable")
        self._write_ref(namespace, table, name, "branch", snapshot_id,
                        overwrite=True)

    def drop_ref(self, namespace: str, table: str, name: str) -> None:
        os.remove(self._tbl(namespace, table, "refs", f"{name}.json"))

    def list_refs(self, namespace: str, table: str) -> list[dict]:
        ref_dir = self._tbl(namespace, table, "refs")
        if not os.path.isdir(ref_dir):
            return []
        out = []
        for fn in sorted(os.listdir(ref_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(ref_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def resolve_ref(self, namespace: str, table: str, name: str) -> int:
        if name == "main":  # implicit current branch, same as refs() lists
            # a PHYSICAL ref literally named 'main' (creatable only by a
            # warehouse that predates the reserved-name rule) must not be
            # silently shadowed — its reader would move from the pinned
            # snapshot to head. Refuse with the migration step instead.
            stale = self._tbl(namespace, table, "refs", "main.json")
            if os.path.isfile(stale):
                raise ValueError(
                    f"{namespace}.{table} has a persisted ref named "
                    "'main' from before the name was reserved for the "
                    "implicit current branch; rename it (create a ref "
                    "at the same snapshot under another name, then "
                    f"delete {stale}) before resolving 'main'"
                )
            return self._current_sid(namespace, table)
        return self._read_ref(namespace, table, name)["snapshot_id"]

    def _read_ref(self, namespace: str, table: str, name: str) -> dict:
        path = self._tbl(namespace, table, "refs", f"{name}.json")
        if not os.path.isfile(path):
            raise SnapshotNotFound(f"{namespace}.{table} has no ref {name!r}")
        with open(path) as f:
            return json.load(f)

    def _write_ref(self, namespace: str, table: str, name: str, kind: str,
                   snapshot_id: int | None, overwrite: bool) -> None:
        if name == "main":
            # 'main' is the implicit current-snapshot branch (refs()
            # synthesizes its row); a user ref of the same name would
            # make refs() list two conflicting 'main' rows and
            # resolve_ref('main') disagree with the refs() row.
            raise ValueError(
                "'main' is the implicit current branch and cannot be "
                "created as a ref; tag or branch another name"
            )
        if snapshot_id is None:
            snapshot_id = self._current_sid(namespace, table)
        else:
            self._manifest(namespace, table, snapshot_id)  # must exist
        ref_dir = self._tbl(namespace, table, "refs")
        os.makedirs(ref_dir, exist_ok=True)
        path = os.path.join(ref_dir, f"{name}.json")
        if not overwrite and os.path.exists(path):
            raise FileExistsError(f"ref {name!r} already exists")
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"name": name, "type": kind,
                       "snapshot_id": snapshot_id}, f)
        os.replace(tmp, path)

    def remove_orphans(
        self, namespace: str, table: str, older_than_ms: int = 24 * 3600 * 1000
    ) -> list[str]:
        """Delete data directories referenced by no snapshot manifest and
        older than the threshold (Iceberg ``remove_orphan_files`` analogue).
        The age threshold is what makes this safe to run concurrently with
        commits: an in-flight commit's data dir exists before its manifest,
        but it is necessarily younger than any sane threshold."""
        live = {
            d for s in self._snapshots(namespace, table) for d in s["files"]
        }
        data_root = self._tbl(namespace, table, "data")
        removed = []
        if os.path.isdir(data_root):
            cutoff = time.time() - older_than_ms / 1000.0
            for d in sorted(os.listdir(data_root)):
                path = os.path.join(data_root, d)
                if d not in live and os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
                    removed.append(d)
        return removed

    # -- reads --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        where: str | None = None,
        ref: str | None = None,
    ) -> DataFrame:
        """Scan the table at the current / given / timestamp-resolved /
        ref-named snapshot (``snapshot-id`` / ``as-of-timestamp`` /
        ``branch``/``tag`` read options of the Iceberg connector).

        ``where`` is applied as a normal Spark filter AND, when it is a
        simple conjunction, used to SKIP whole data directories whose
        manifest min/max stats cannot satisfy it (Iceberg metrics pruning:
        the scan never opens files that cannot contain matches)."""
        sid = snapshot_id
        if sid is None and ref is not None:
            sid = self.resolve_ref(namespace, table, ref)
        if sid is None and as_of_ms is not None:
            candidates = [
                s for s in self._snapshots(namespace, table)
                if s["timestamp_ms"] <= as_of_ms
            ]
            if not candidates:
                raise SnapshotNotFound(f"no snapshot at or before {as_of_ms}")
            sid = candidates[-1]["snapshot_id"]
        if sid is None:
            sid = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, sid)
        dir_names = manifest["files"]
        part_filters: list[str] = []
        if where:
            dir_names, _skipped = self._prune_dirs(manifest, where)
            spec = manifest.get("partition_spec")
            if spec:
                # hidden-partitioning predicate conversion: rewrite simple
                # source-column conjuncts onto the derived partition
                # columns so the hive layout prunes directories — the
                # user's filter itself still applies for exactness
                part_filters = partition_spec.derive_predicates(
                    partition_spec.parse_spec(spec), simple_conjuncts(where)
                )
        if not dir_names and manifest.get("schema"):
            # pruning (stats or bloom) excluded EVERY directory — the
            # normal outcome for a point lookup of an absent value. A
            # zero-path parquet read cannot infer a schema, so answer
            # from the manifest schema directly: 0 rows, right columns.
            from pyspark.sql import types as T

            return spark.createDataFrame(
                [], T.StructType.fromJson(manifest["schema"])
            )
        df = self._read_with_deletes(
            spark, namespace, table, manifest, dir_names,
            partition_filters=part_filters,
        )
        if where:
            df = df.filter(where)
        return df

    def read_ordered(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        snapshot_id: int | None = None,
        with_position: bool = False,
    ) -> DataFrame:
        """Scan with a ``_commit_seq`` column: the position of each data
        directory in the manifest's file list, i.e. COMMIT ORDER. This is
        the cross-commit half of the ordered-read contract — data dir
        names are collision-free uuids, so ``_metadata.file_path`` alone
        orders files arbitrarily ACROSS commits; a reader recovering full
        insertion order sorts by ``(_commit_seq, _metadata.file_path,
        _metadata.row_index)`` (within an ordered commit the range
        partitioner made file order = key order — see ``append(sort_by)``).

        Per-dir scans union by name, so the plan is one branch per commit
        — the same shape ``_read_dirs`` uses for partitioned tables.
        Pending equality deletes would break per-dir attribution; ordered
        readers must compact first (explicit error, not silent misorder)."""
        sid = snapshot_id or self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, sid)
        if self._pending_deletes(manifest, manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}: read_ordered with pending equality "
                "deletes is unsupported — run compact() first"
            )
        partitioned = bool(manifest.get("partition_by"))
        out = None
        ordered_schema = self._scan_schema(manifest)
        for i, d in enumerate(manifest["files"]):
            part = self._resolve_schema(
                self._read_dirs(
                    spark, namespace, table, [d], partitioned,
                    read_schema=ordered_schema,
                ),
                manifest,
            ).withColumn("_commit_seq", F.lit(i))
            if with_position:
                # _metadata is only resolvable on the scan-backed frame —
                # capture it per branch, BEFORE the union erases it
                part = part.withColumn(
                    "_file_path", F.col("_metadata.file_path")
                ).withColumn("_row_index", F.col("_metadata.row_index"))
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        if out is None:
            raise SnapshotNotFound(
                f"{namespace}.{table} snapshot {sid} has no data"
            )
        return out

    def _prune_dirs(
        self, manifest: dict, predicate: str
    ) -> tuple[list[str], list[str]]:
        """Split the manifest's data dirs into (candidates, skipped) for a
        predicate, using per-dir column min/max stats. Dirs without stats
        are always candidates; complex predicates prune nothing."""
        dirs = manifest["files"]
        conjuncts = simple_conjuncts(predicate)
        if not conjuncts:
            return list(dirs), []
        # normalize timestamp literals to the stats' fixed-width format so
        # string comparison is chronological (schema tells us the type)
        types = {
            f["name"]: str(f.get("type", ""))
            for f in (manifest.get("schema") or {}).get("fields", [])
        }
        normed = []
        for col, op, lit in conjuncts:
            t = types.get(col, "")
            if "timestamp" in t and isinstance(lit, str):
                try:
                    dt = _dt.datetime.fromisoformat(lit)
                except ValueError:
                    return list(dirs), []
                if dt.tzinfo is not None:
                    # explicit offset: unambiguous instant on a
                    # tz-adjusted column → convert to the naive-UTC
                    # stats domain (never strftime the offset away —
                    # review r15); meaningless on NTZ → conjunct prunes
                    # nothing
                    if t == "timestamp":
                        dt = dt.astimezone(_dt.timezone.utc).replace(
                            tzinfo=None
                        )
                    else:
                        continue
                lit = dt.strftime(_TS_FMT)
            normed.append((col, op, lit))
        return self._split_by_stats(manifest, normed)

    def _split_by_stats(
        self, manifest: dict, conjuncts: list[tuple[str, str, object]]
    ) -> tuple[list[str], list[str]]:
        """Dir-level interval check: (candidates, skipped). Literals must
        already be normalized to the stats' comparison domain.

        Soundness guards (ADVICE r14 #1/#2, shared with
        ``_dispatch_bounds`` — a wrong skip HERE loses rows from
        reads): conjuncts on FLOAT/DOUBLE columns only skip via the
        NaN-sound operators ('=', '<', '<=' — footer/dir stats ignore
        NaN while Spark orders NaN above everything, so a max-based
        skip for 'v > 5' would drop a matching NaN row); conjuncts on
        tz-adjusted TIMESTAMP columns skip nothing unless the session
        timezone is UTC (dir stats are naive UTC instants, the
        predicate literal parses in the session zone)."""
        types = {
            f["name"]: str(f.get("type", ""))
            for f in (manifest.get("schema") or {}).get("fields", [])
        }
        tz_utc = None  # lazily resolved: only timestamp conjuncts care
        usable: list[tuple[str, str, object]] = []
        for col, op, lit in conjuncts:
            t = types.get(col, "")
            if t == "timestamp":  # tz-adjusted (timestamp_ntz is naive)
                if tz_utc is None:
                    tz_utc = _session_tz_is_utc()
                if not tz_utc:
                    continue
            if t in _FLOAT_TYPES and op not in _FLOAT_MAY_SOUND:
                continue
            usable.append((col, op, lit))
        conjuncts = usable
        dir_stats = manifest.get("dir_stats", {})
        dir_blooms = manifest.get("dir_blooms", {})
        candidates, skipped = [], []
        for d in manifest["files"]:
            stats = dir_stats.get(d)
            keep = True
            if stats:
                for col, op, lit in conjuncts:
                    if col in stats and not _range_may_match(
                        stats[col][0], stats[col][1], op, lit
                    ):
                        keep = False
                        break
            if keep:
                # point-lookup skipping past what min/max can see: a
                # registered bloom answers "value definitely absent"
                blooms = dir_blooms.get(d) or {}
                for col, op, lit in conjuncts:
                    if (
                        op == "="
                        and col in blooms
                        and not bloom_maybe_contains(blooms[col], lit)
                    ):
                        keep = False
                        break
            (candidates if keep else skipped).append(d)
        return candidates, skipped

    def _resolve_schema(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Apply the manifest's column-rename chain and logical-schema
        projection to a raw multi-dir scan — the read half of
        METADATA-ONLY rename/drop (:meth:`rename_column` /
        :meth:`drop_column`): directories written before a rename keep
        their physical names forever (no data rewrite at any scale); the
        scan surfaces both generations via mergeSchema and this step
        folds them into the logical column (coalesce is exact — a dir
        contains at most ONE generation of a column, enforced by the
        retired-name reuse guard), then projects to the logical schema so
        dropped columns vanish. Tables that never renamed/dropped skip
        this entirely — their plans are untouched."""
        renames = manifest.get("renames") or []
        if not renames and not manifest.get("retired"):
            return df
        for old, new in renames:
            if old in df.columns:
                if new in df.columns:
                    df = df.withColumn(
                        new, F.coalesce(F.col(new), F.col(old))
                    ).drop(old)
                else:
                    df = df.withColumnRenamed(old, new)
        fields = [
            f["name"]
            for f in (manifest.get("schema") or {}).get("fields", [])
        ]
        if fields:
            extras = [
                c
                for c in df.columns
                if c.startswith("_pt_")
                or c in (self.POS_FILE_COL, self.POS_IDX_COL)
            ]
            df = df.select(
                *[c for c in fields if c in df.columns], *extras
            )
        return df

    def _publish_metadata_commit(self, namespace: str, table: str, build) -> int:
        """Optimistic publish loop for METADATA-ONLY commits derived from
        the current head: ``build(cur_manifest)`` returns the new
        manifest body (id/parent/timestamp are stamped here, any copied
        rollback lineage pointer is stripped); a publish collision
        recomputes on the new head. Shared by the schema-edit commits —
        rename/drop (:meth:`_schema_edit_commit`) and
        :meth:`widen_column_type`."""
        while True:
            snaps = self._snapshots(namespace, table)
            cur = snaps[-1]
            manifest = build(cur)
            manifest["snapshot_id"] = cur["snapshot_id"] + 1
            manifest["parent_id"] = cur["snapshot_id"]
            manifest["timestamp_ms"] = int(time.time() * 1000)
            # a lineage pointer copied from a rollback parent would make
            # history() walk past this commit's real parent
            manifest.pop("rollback_of", None)
            sid = manifest["snapshot_id"]
            snap_path = self._tbl(
                namespace, table, "snapshots", f"{sid}.json"
            )
            try:
                with open(snap_path, "x") as f:
                    json.dump(manifest, f)
                break
            except FileExistsError:
                continue  # metadata-only: recompute on the new head
        cur_tmp = self._tbl(
            namespace, table, f"_current.tmp-{uuid.uuid4().hex}"
        )
        with open(cur_tmp, "w") as f:
            f.write(str(sid))
        os.replace(cur_tmp, self._tbl(namespace, table, "_current"))
        return sid

    def rename_column(
        self, namespace: str, table: str, old: str, new: str
    ) -> int:
        """Iceberg ``ALTER TABLE .. RENAME COLUMN`` analogue —
        METADATA-ONLY: no data file is read, written, or moved, at any
        table size. The commit rewrites the logical schema, remaps the
        per-dir stats keys (so stats pruning keeps working on the new
        name), and appends to the manifest's rename chain; reads resolve
        old physical names through the chain (:meth:`_resolve_schema`).

        Name-reuse contract: Iceberg disambiguates generations by field
        id; this layout is name-based, so a retired name (rename source
        or dropped column) can never be reintroduced while any directory
        might still contain it physically — the guard lives in
        :meth:`_commit`. Refuses renaming partition-spec sources (hive
        dir names embed them) and columns referenced by pending
        equality-delete entries (their key files are physical — compact
        first, the read_ordered discipline)."""
        return self._schema_edit_commit(
            namespace, table, "rename_column", old=old, new=new
        )

    def drop_column(self, namespace: str, table: str, col: str) -> int:
        """Iceberg ``ALTER TABLE .. DROP COLUMN`` analogue —
        METADATA-ONLY: the column leaves the logical schema and every
        read projects it away; the bytes stay in place (and remain
        time-travelable through pre-drop snapshots) until compaction or
        GC naturally rewrites them. Same guards as
        :meth:`rename_column`; also refuses dropping the last column."""
        return self._schema_edit_commit(
            namespace, table, "drop_column", old=col, new=None
        )

    # Iceberg-legal type promotions (spec §Schema Evolution): the Spark
    # parquet reader upcasts a narrow physical column into the wide
    # requested type, so widening is metadata-only — old files stay.
    _WIDENINGS = {("integer", "long"), ("float", "double")}

    def widen_column_type(
        self, namespace: str, table: str, col: str, new_type: str
    ) -> int:
        """Iceberg ``ALTER TABLE .. ALTER COLUMN .. TYPE`` analogue —
        METADATA-ONLY type promotion (int→long, float→double, the
        Iceberg-legal widenings): the commit rewrites the logical field
        type; reads pass an explicit wide schema to the scan (the parquet
        reader upcasts narrow physical columns — mergeSchema alone
        refuses to merge int with long) and old files are never
        rewritten. Refuses non-widening changes, partitioned layouts
        (hive path values are typed by the directory names), and pending
        merge-on-read deletes (delete key files are physically narrow —
        compact first)."""
        spark_name = {"bigint": "long", "int": "integer"}.get(
            new_type, new_type
        )

        def build(cur: dict) -> dict:
            schema = cur.get("schema") or {}
            fields = schema.get("fields", [])
            match = [f for f in fields if f["name"] == col]
            if not match:
                raise ValueError(
                    f"{namespace}.{table} has no column {col!r}"
                )
            old_type = match[0]["type"]
            if (old_type, spark_name) not in self._WIDENINGS:
                raise ValueError(
                    f"cannot widen {col!r} from {old_type} to "
                    f"{spark_name}: only "
                    f"{sorted(self._WIDENINGS)} are metadata-only"
                )
            if cur.get("partition_by") or cur.get("partition_spec"):
                raise ValueError(
                    "widen_column_type on a partitioned table is "
                    "unsupported — rewrite the layout first"
                )
            if cur.get("deletes"):
                raise ValueError(
                    f"{namespace}.{table}: widening with pending "
                    "merge-on-read deletes is unsupported — compact() "
                    "first"
                )
            return {
                **cur,
                "operation": "widen_column",
                "schema": {
                    **schema,
                    "fields": [
                        {**f, "type": spark_name} if f["name"] == col else f
                        for f in fields
                    ],
                },
                "widened": True,
            }

        return self._publish_metadata_commit(namespace, table, build)

    def _scan_schema(self, manifest: dict):
        """Explicit read schema for the scan, or None (the scan keeps
        its mergeSchema plan untouched).

        Widened tables: every logical field at its current (wide) type,
        plus each field's retired rename aliases at the same wide type,
        so directories from any name/width generation read correctly
        (absent columns NULL-fill, narrow columns upcast) and
        :meth:`_resolve_schema` folds the generations.

        Plain tables (r16, guide §1.2 — the driver should do almost no
        per-statement work): when EVERY scanned directory carries the
        same commit-stamped physical schema (``dir_schemas``), return
        it, so the reader is built with an explicit schema instead of a
        mergeSchema inference pass — measured ~230 ms → ~20 ms per
        DataFrame CONSTRUCTION (the inference is a distributed
        footer-read job, paid on every catalog read of every statement).
        Stamped schemas are nullability-normalized at commit time to
        match parquet inference exactly, so read schemas are
        bit-identical either way. Any dir without a stamp (pre-r16
        manifests, ``add_files`` imports, manifest folds), any schema
        disagreement between dirs (evolving plain tables rely on
        mergeSchema's union), and any partitioned/renamed/retired
        layout falls back to the old inference path unchanged."""
        if not manifest.get("widened"):
            if (
                manifest.get("partition_by")
                or manifest.get("partition_spec")
                or manifest.get("renames")
                or manifest.get("retired")
            ):
                return None
            files = manifest.get("files") or []
            stamped = manifest.get("dir_schemas") or {}
            if not files:
                return None
            first = stamped.get(files[0])
            if first is None or any(
                stamped.get(d) != first for d in files[1:]
            ):
                return None
            from pyspark.sql import types as T

            return T.StructType.fromJson(first)
        from pyspark.sql import types as T

        logical = T.StructType.fromJson(manifest["schema"])
        alias_of: dict[str, list[str]] = {}
        for old, new in manifest.get("renames") or []:
            alias_of.setdefault(new, []).extend(
                [old] + alias_of.pop(old, [])
            )
        out = []
        for f in logical.fields:
            out.append(f)
            for a in alias_of.get(f.name, []):
                out.append(T.StructField(a, f.dataType, True))
        return T.StructType(out)

    def _schema_edit_commit(
        self, namespace: str, table: str, operation: str,
        old: str, new: str | None,
    ) -> int:
        """Shared guards + manifest construction for rename/drop; the
        publish loop is :meth:`_publish_metadata_commit`."""

        def build(cur: dict) -> dict:
            schema = cur.get("schema") or {}
            names = [f["name"] for f in schema.get("fields", [])]
            if old not in names:
                raise ValueError(
                    f"{namespace}.{table} has no column {old!r}"
                )
            retired = list(cur.get("retired") or [])
            if new is not None:
                if new in names:
                    raise ValueError(
                        f"{namespace}.{table} already has a column {new!r}"
                    )
                if new in retired:
                    raise ValueError(
                        f"column name {new!r} was retired by an earlier "
                        "rename/drop and old data files may still contain "
                        "it; name reuse is not supported on this "
                        "name-based layout"
                    )
            elif len(names) == 1:
                raise ValueError("cannot drop the last column")
            sources = set(cur.get("partition_by") or [])
            for f in partition_spec.parse_spec(
                cur.get("partition_spec") or []
            ):
                sources.add(f.source)
            if old in sources:
                raise ValueError(
                    f"column {old!r} is a partition-spec source; hive "
                    "directory names embed it — rewrite the layout first"
                )
            for e in cur.get("deletes") or []:
                if e.get("mode") != "positional" and old in e.get(
                    "key_cols", []
                ):
                    raise ValueError(
                        f"column {old!r} is referenced by a pending "
                        "equality-delete entry; compact() first"
                    )
            if new is not None:
                fields = [
                    {**f, "name": new} if f["name"] == old else f
                    for f in schema["fields"]
                ]
                dir_stats = {
                    d: {new if k == old else k: v for k, v in st.items()}
                    for d, st in (cur.get("dir_stats") or {}).items()
                }
                dir_blooms = {
                    d: {new if k == old else k: v for k, v in bl.items()}
                    for d, bl in (cur.get("dir_blooms") or {}).items()
                }
                bloom_cols = [
                    new if c == old else c
                    for c in (cur.get("bloom_cols") or [])
                ]
                renames = (cur.get("renames") or []) + [[old, new]]
            else:
                fields = [f for f in schema["fields"] if f["name"] != old]
                dir_stats = {
                    d: {k: v for k, v in st.items() if k != old}
                    for d, st in (cur.get("dir_stats") or {}).items()
                }
                dir_blooms = {
                    d: {k: v for k, v in bl.items() if k != old}
                    for d, bl in (cur.get("dir_blooms") or {}).items()
                }
                bloom_cols = [
                    c for c in (cur.get("bloom_cols") or []) if c != old
                ]
                renames = cur.get("renames") or []
            return {
                **cur,
                "operation": operation,
                "schema": {**schema, "fields": fields},
                "dir_stats": dir_stats,
                "dir_blooms": dir_blooms,
                "bloom_cols": bloom_cols,
                "renames": renames,
                "retired": retired + [old],
            }

        return self._publish_metadata_commit(namespace, table, build)

    def _read_dirs(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        dir_names: list[str],
        partitioned: bool,
        with_positions: bool = False,
        read_schema=None,
    ) -> DataFrame:
        """Distributed scan over an explicit set of data directories.

        mergeSchema: appends may evolve the schema (add columns); rows
        from pre-evolution files read the new columns as NULL — Iceberg
        schema-evolution semantics. ``read_schema`` (from
        :meth:`_scan_schema`, widened tables only) replaces mergeSchema
        with an explicit schema so narrow physical columns upcast —
        mergeSchema itself refuses to merge int with long.

        Partitioned commits are read per-directory and unioned by name:
        hive partition discovery is per data dir, and the union keeps
        partition pruning (PartitionFilters) intact on every branch.

        ``with_positions`` additionally projects each row's physical
        address (``_pos_file``/``_pos_idx`` from the hidden ``_metadata``
        struct) — selected per scan branch BEFORE any union, because
        ``_metadata`` is only resolvable directly on a file-source
        relation."""

        def _one(path_or_paths) -> DataFrame:
            if read_schema is not None:
                r = spark.read.schema(read_schema)
            else:
                r = spark.read.option("mergeSchema", "true")
            df = (
                r.parquet(*path_or_paths)
                if isinstance(path_or_paths, list)
                else r.parquet(path_or_paths)
            )
            if with_positions:
                df = df.select(
                    "*",
                    F.col("_metadata.file_path").alias(self.POS_FILE_COL),
                    F.col("_metadata.row_index").alias(self.POS_IDX_COL),
                )
            return df

        dirs = [
            os.path.join(self._tbl(namespace, table, "data"), d)
            for d in dir_names
        ]
        if partitioned and len(dirs) > 1:
            out = None
            for d in dirs:
                part = _one(d)
                out = part if out is None else out.unionByName(
                    part, allowMissingColumns=True
                )
            return out
        return _one(dirs)

    def row_count(
        self, namespace: str, table: str, snapshot_id: int | None = None
    ) -> int:
        """count(*) answered from manifest metadata — NO data scan, no
        Spark job (Iceberg answers count(*) from manifest row counts the
        same way). Raises if the manifest predates row-count tracking."""
        sid = snapshot_id or self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, sid)
        dir_rows = manifest.get("dir_rows")
        if dir_rows is None or set(dir_rows) != set(manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}@{sid}: manifest lacks row counts"
            )
        if manifest.get("deletes"):
            raise ValueError(
                f"{namespace}.{table}@{sid}: pending merge-on-read deletes;"
                " exact count needs a scan (or compact first)"
            )
        return sum(dir_rows.values())

    def read_appends_between(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Incremental scan (Iceberg changelog / ``start-snapshot-id``
        read analogue): rows APPENDED after ``from_snapshot_id`` up to
        ``to_snapshot_id`` (default current) — exactly the data dirs
        present in the end manifest but not the start manifest, scanned
        directly. No diffing of row contents: the manifest tells us which
        files are new, so the incremental read costs only the new data
        (the whole point of consuming a table incrementally).

        Raises if a non-append rewrite (replace/upsert/delete/update/
        compact) intervened — the appended-rows question is ill-posed
        across rewrites, matching Iceberg's incremental-scan restriction
        to append snapshots."""
        end_sid = to_snapshot_id or self._current_sid(namespace, table)
        start = self._manifest(namespace, table, from_snapshot_id)
        end = self._manifest(namespace, table, end_sid)
        for s in self._snapshots(namespace, table):
            if from_snapshot_id < s["snapshot_id"] <= end_sid and s[
                "operation"
            ] not in ("append", "rename_column", "drop_column",
                      "widen_column"):
                raise ValueError(
                    f"{namespace}.{table}: snapshot {s['snapshot_id']} is a "
                    f"{s['operation']!r}, not an append — incremental read "
                    "across rewrites is ill-posed (Iceberg restriction)"
                )
        new_dirs = [d for d in end["files"] if d not in set(start["files"])]
        if not new_dirs:
            return self._resolve_schema(
                self._read_dirs(
                    spark, namespace, table, end["files"],
                    bool(end.get("partition_by")),
                    read_schema=self._scan_schema(end),
                ),
                end,
            ).limit(0)
        return self._read_with_deletes(spark, namespace, table, end, new_dirs)

    def changelog_diff(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Row-level CDC between two snapshots (Iceberg
        ``create_changelog_view`` analogue): every data row appended or
        removed between the snapshots, tagged ``change_type``
        'insert'/'delete'.

        Cost is O(churned files), not O(table): the manifest diff names
        exactly the data dirs present in one snapshot but not the other,
        and only those are scanned — an untouched directory contributes
        nothing and is never opened (pinned by the inputFiles unit
        test). Within the churned set, a copy-on-write rewrite's
        carried-over rows appear in both the removed and added dirs and
        cancel via ``exceptAll``, leaving the logical delta. Unlike
        :meth:`read_appends_between` this is well-posed across CoW
        rewrites (replace/upsert/delete/update); it refuses only
        unmaterialized merge-on-read deletes (compact first), where
        file-level diffing would miss delete-file semantics."""
        end_sid = to_snapshot_id or self._current_sid(namespace, table)
        a = self._manifest(namespace, table, from_snapshot_id)
        b = self._manifest(namespace, table, end_sid)
        if a.get("deletes") or b.get("deletes"):
            raise ValueError(
                f"{namespace}.{table}: changelog across unmaterialized "
                "merge-on-read deletes is ill-posed — run compact() first"
            )
        removed = [d for d in a["files"] if d not in set(b["files"])]
        added = [d for d in b["files"] if d not in set(a["files"])]

        def scan(dirs: list[str], manifest: dict) -> DataFrame | None:
            if not dirs:
                return None
            # both sides resolve with the END manifest's rename chain:
            # the changelog consumer reads the end schema, and the chain
            # covers dirs written under any earlier generation
            return self._resolve_schema(
                self._read_dirs(
                    spark, namespace, table, dirs,
                    bool(manifest.get("partition_by")),
                    read_schema=self._scan_schema(b),
                ),
                b,
            )

        old_rows, new_rows = scan(removed, a), scan(added, b)
        if old_rows is None and new_rows is None:
            return self.read(
                spark, namespace, table, snapshot_id=end_sid
            ).limit(0).withColumn("change_type", F.lit("insert"))
        tag = lambda df, t: df.withColumn("change_type", F.lit(t))  # noqa: E731
        if old_rows is None:
            return tag(new_rows, "insert")
        if new_rows is None:
            return tag(old_rows, "delete")
        return tag(new_rows.exceptAll(old_rows), "insert").unionByName(
            tag(old_rows.exceptAll(new_rows), "delete")
        )

    def snapshots(self, spark: SparkSession, namespace: str, table: str) -> DataFrame:
        """Snapshot enumeration as a DataFrame — the ``t.snapshots``
        metadata-table equivalent (``ex-iceberg/src/component.py:148-157``)."""
        rows = [
            (s["snapshot_id"], s["timestamp_ms"], s["operation"])
            for s in self._snapshots(namespace, table)
        ]
        return local_relation(
            spark, rows,
            schema="snapshot_id long, timestamp_ms long, operation string",
        )

    def history(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Table-history metadata table — the Iceberg ``t.history``
        analogue (reference surfaces table metadata read-only the same
        way, ``ex-iceberg/src/component.py:148-157``): one row per
        snapshot with its commit wall-clock, lineage parent, and whether
        it is an ancestor of the CURRENT state. ``is_current_ancestor``
        is the column audit tooling reads to tell retained-but-abandoned
        history (rolled-back snapshots) from the live lineage — at 100 TB
        that distinction decides what expire_snapshots may reclaim.

        Lineage rule: a rollback commit's content ancestor is its TARGET
        (the ``rollback_of`` manifest field), not the head it displaced —
        so the snapshots a rollback undid are reachable for time travel
        but NOT current ancestors, matching Iceberg's history table.
        Answered entirely from manifests: no data scan, no Spark job.
        """
        snaps = self._snapshots(namespace, table)
        current = snaps[-1]["snapshot_id"]
        by_id = {s["snapshot_id"]: s for s in snaps}
        ancestors: set[int] = set()
        walk: int | None = current
        while walk is not None and walk in by_id and walk not in ancestors:
            ancestors.add(walk)
            s = by_id[walk]
            walk = s.get("rollback_of") or s.get("parent_id")
        rows = [
            (
                s["timestamp_ms"],
                s["snapshot_id"],
                s.get("rollback_of") or s.get("parent_id"),
                s["snapshot_id"] in ancestors,
            )
            for s in snaps
        ]
        return local_relation(
            spark, rows,
            schema=(
                "made_current_at_ms long, snapshot_id long, "
                "parent_id long, is_current_ancestor boolean"
            ),
        )

    def refs(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Named-refs metadata table — the Iceberg ``t.refs`` analogue:
        every branch/tag with the snapshot it pins, plus the implicit
        ``main`` branch at the current snapshot (Iceberg lists main the
        same way). Manifest/ref files only — no data scan."""
        persisted = self.list_refs(namespace, table)
        if any(r["name"] == "main" for r in persisted):
            # same guard as resolve_ref: a pre-reserved-name physical
            # 'main' must not produce two conflicting rows
            raise ValueError(
                f"{namespace}.{table} has a persisted ref named 'main' "
                "from before the name was reserved for the implicit "
                "current branch; rename it before listing refs"
            )
        rows = [
            ("main", "branch", self._current_sid(namespace, table))
        ] + [
            (r["name"], r["type"], r["snapshot_id"]) for r in persisted
        ]
        return local_relation(
            spark, rows, schema="name string, type string, snapshot_id long"
        )

    def all_manifests(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Cross-snapshot manifest metadata table — the Iceberg
        ``t.all_manifests`` / pyiceberg ``inspect.all_manifests``
        analogue (pyiceberg 0.9.1, the library the reference embeds via
        ``components/common/pyproject.toml:7-18``), completing the
        inspect surface after snapshots/history/refs/files/partitions/
        entries: one row per manifest entry per snapshot that references
        it — the view that answers "which snapshots still pin this data
        (or delete) dir", i.e. what snapshot expiry and orphan GC will
        actually free. Answered from the snapshot manifests ALONE — no
        file listing, no data I/O, no Spark job to build.

        Columns mirror Iceberg's: ``reference_snapshot_id`` (the
        snapshot whose manifest lists the entry), ``content``
        (``data`` | ``deletes``, Iceberg's manifest content split),
        ``path`` (the dir name — this catalog's manifest grain),
        ``added_snapshot_id`` (the earliest snapshot listing it — the
        commit that created it), ``is_added`` (added by the referencing
        snapshot vs carried forward — Iceberg's added/existing status),
        and ``n_rows`` (manifest row count; NULL for delete manifests
        and pre-stats dirs, the ``files()`` degradation contract)."""
        first_seen: dict[tuple[str, str], int] = {}
        rows = []
        for s in self._snapshots(namespace, table):
            sid = s["snapshot_id"]
            dir_rows = s.get("dir_rows") or {}
            entries = [("data", d, dir_rows.get(d)) for d in s["files"]]
            entries += [
                ("deletes", e["dir"], None) for e in s.get("deletes", [])
            ]
            for content, d, n in entries:
                added = first_seen.setdefault((content, d), sid)
                rows.append((sid, content, d, added, added == sid, n))
        return local_relation(
            spark, rows,
            schema=(
                "reference_snapshot_id long, content string, path string, "
                "added_snapshot_id long, is_added boolean, n_rows long"
            ),
        )

    def files(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        snapshot_id: int | None = None,
        stat_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Per-data-directory metadata table — the ``t.files`` /
        ``t.partitions`` Iceberg metadata-table analogue (reference
        surfaces table metadata the same read-only way,
        ``ex-iceberg/src/component.py:148-157``): manifest position
        (= commit arrival order for append-only tables), row count, and
        min/max for the requested columns, answered ENTIRELY from the
        manifest — no data scan, no Spark job. This is how a 100 TB
        deployment audits layout (file counts, skewed commits, stats
        coverage) without touching a single data file. Requested columns
        with no recorded stats surface as NULLs, never an error — absent
        stats degrade observability, not correctness."""
        sid = snapshot_id or self._current_sid(namespace, table)
        m = self._manifest(namespace, table, sid)
        dir_rows = m.get("dir_rows") or {}
        dir_stats = m.get("dir_stats") or {}

        def _spark_type(col: str) -> str:
            for d in m["files"]:
                pair = (dir_stats.get(d) or {}).get(col)
                if pair is not None:
                    v = pair[0]
                    if isinstance(v, bool):
                        return "boolean"
                    if isinstance(v, int):
                        return "long"
                    if isinstance(v, float):
                        return "double"
                    return "string"
            return "string"  # no stats anywhere: NULL-typed placeholder

        fields = ["ordinal int", "data_dir string", "n_rows long"]
        for c in stat_cols:
            t = _spark_type(c)
            fields += [f"min_{c} {t}", f"max_{c} {t}"]
        rows = []
        for i, d in enumerate(m["files"]):
            rec = [i, d, dir_rows.get(d)]
            st = dir_stats.get(d) or {}
            for c in stat_cols:
                lo, hi = st.get(c) or (None, None)
                rec += [lo, hi]
            rows.append(tuple(rec))
        return local_relation(spark, rows, schema=", ".join(fields))

    def all_data_files(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Cross-snapshot per-FILE metadata table — the Iceberg
        ``t.all_data_files`` / pyiceberg ``inspect.all_data_files``
        analogue: every data file of every snapshot, one row per
        (referencing snapshot, file). Complements :meth:`all_manifests`
        (manifest grain) and :meth:`entries` (file grain, ONE snapshot):
        this is the view that answers "how many physical bytes does the
        whole snapshot LOG pin" — i.e. what ``expire_snapshots`` plus
        orphan GC would actually reclaim, at file granularity.

        Footer/stat-only driver work, amortized: each distinct data dir
        is walked ONCE (parquet footers read once per file), then fanned
        out to every snapshot that references it — cost is
        O(distinct files + manifest entries), never O(snapshots ×
        files). Columns: ``reference_snapshot_id``, ``data_dir``,
        ``file_ordinal`` (sorted-name position within the dir — the
        stable handle, Spark part names are uuids), ``n_rows``,
        ``n_row_groups``, ``size_bytes``."""
        import pyarrow.parquet as pq

        per_dir: dict[str, list[tuple]] = {}
        rows = []
        for s in self._snapshots(namespace, table):
            for d in s["files"]:
                if d not in per_dir:
                    root = self._tbl(namespace, table, "data", d)
                    paths = []
                    for rdir, _sub, fns in os.walk(root):
                        for fn in fns:
                            if fn.endswith(".parquet") and not fn.startswith(
                                (".", "_")
                            ):
                                paths.append(os.path.join(rdir, fn))
                    entries = []
                    for j, p in enumerate(sorted(paths)):
                        # a broken link (the documented allow_symlink
                        # adoption risk: source deleted after adoption)
                        # degrades to NULL metrics, same contract as
                        # files() for absent stats — the inspect surface
                        # must stay usable for auditing exactly the
                        # warehouses that need it
                        try:
                            md = pq.ParquetFile(p).metadata
                            entries.append(
                                (j, md.num_rows, md.num_row_groups,
                                 os.path.getsize(p))
                            )
                        except OSError:
                            entries.append((j, None, None, None))
                    per_dir[d] = entries
                for j, n_rows, n_rg, size in per_dir[d]:
                    rows.append(
                        (s["snapshot_id"], d, j, n_rows, n_rg, size)
                    )
        return local_relation(
            spark, rows,
            schema=(
                "reference_snapshot_id long, data_dir string, "
                "file_ordinal int, n_rows long, n_row_groups int, "
                "size_bytes long"
            ),
        )

    def metadata_log_entries(
        self, spark: SparkSession, namespace: str, table: str
    ) -> DataFrame:
        """Metadata-log metadata table — the Iceberg
        ``t.metadata_log_entries`` / pyiceberg
        ``inspect.metadata_log_entries`` analogue: one row per metadata
        file the table has ever published (here: per snapshot manifest
        JSON), with its commit timestamp, path, size, and the snapshot
        it made current. Expired snapshots drop out (their manifests are
        deleted — same lifecycle as Iceberg's metadata log under
        ``write.metadata.delete-after-commit``). Pure driver-side
        manifest-dir listing — no data I/O, no Spark job."""
        rows = []
        for s in self._snapshots(namespace, table):
            path = self._tbl(
                namespace, table, "snapshots", f"{s['snapshot_id']}.json"
            )
            rows.append(
                (
                    s["timestamp_ms"],
                    path,
                    os.path.getsize(path),
                    s["snapshot_id"],
                    s["operation"],
                )
            )
        return local_relation(
            spark, rows,
            schema=(
                "timestamp_ms long, file string, size_bytes long, "
                "latest_snapshot_id long, operation string"
            ),
        )

    def entries(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Per-data-FILE metadata table — the Iceberg ``t.entries`` /
        pyiceberg ``inspect.entries`` analogue, one level below
        :meth:`files` (which is per-directory): every parquet file a
        snapshot references, with its commit ordinal, row count, byte
        size, and row-group count. Footer/stat-only driver work — one
        ``os.walk`` + one parquet-footer read per file, no data pages,
        no Spark job — the same cost shape Iceberg pays reading its
        manifest entries. This is the view that answers file-level
        layout questions ``files`` cannot: small-file skew inside a
        commit, row-group granularity before a compaction decision,
        and which exact file a positional delete addresses.

        Columns: ``ordinal`` (manifest position of the dir), ``data_dir``,
        ``file_ordinal`` (position in sorted file-name order within the
        dir — names are Spark part-uuids, so the ordinal, not the name,
        is the stable handle), ``n_rows``, ``n_row_groups``,
        ``size_bytes``."""
        import pyarrow.parquet as pq

        sid = snapshot_id or self._current_sid(namespace, table)
        m = self._manifest(namespace, table, sid)
        rows = []
        for i, d in enumerate(m["files"]):
            root = self._tbl(namespace, table, "data", d)
            paths = []
            for rdir, _sub, fns in os.walk(root):
                for fn in fns:
                    if fn.endswith(".parquet") and not fn.startswith(
                        (".", "_")
                    ):
                        paths.append(os.path.join(rdir, fn))
            for j, p in enumerate(sorted(paths)):
                md = pq.ParquetFile(p).metadata
                rows.append(
                    (i, d, j, md.num_rows, md.num_row_groups,
                     os.path.getsize(p))
                )
        return local_relation(
            spark, rows,
            schema=(
                "ordinal int, data_dir string, file_ordinal int, "
                "n_rows long, n_row_groups int, size_bytes long"
            ),
        )

    def _partitions_pushdown_df(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        data_dir: str,
        part_cols: list[str],
        stat_cols: tuple[str, ...],
    ) -> DataFrame:
        """One data dir's per-partition (count, min, max) via parquet
        AGGREGATE PUSHDOWN: with the DSv2 parquet reader and
        ``spark.sql.parquet.aggregatePushdown`` on, COUNT(*)/MIN/MAX
        grouped by partition columns are answered from file FOOTERS and
        hive directory values — zero data-column pages are read (the
        plan shows PushedAggregation/PushedGroupBy; pinned in
        tests/test_plans.py). Build AND materialize inside the conf
        scope: pushdown is decided at physical-planning time, so a lazy
        frame escaping the scope would silently fall back to a scan."""
        df = spark.read.parquet(
            os.path.join(self._tbl(namespace, table, "data"), data_dir)
        )
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in stat_cols:
            aggs += [
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            ]
        return df.groupBy(*part_cols).agg(*aggs)

    def partitions(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        stat_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Per-PARTITION-VALUE metadata table — the Iceberg
        ``t.partitions`` analogue at partition grain (``files`` is the
        per-commit-dir grain): (partition value, row count, min/max of
        the requested columns) answered WITHOUT reading any data-column
        pages. Mechanism: parquet aggregate pushdown per data dir
        (COUNT/MIN/MAX from footers, partition values from the hive
        paths), then a metadata-sized re-aggregation across commits
        (sum of counts, min of mins, max of maxs). At 100 TB this
        audits partition skew and layout from footers alone.

        Refuses while merge-on-read deletes are pending (counts would
        need a scan — the ``row_count`` contract); raises on an
        unpartitioned table (use ``files``). The result is
        partition-count-sized, so it is materialized eagerly — the
        pushdown conf scope must cover execution (see
        ``_partitions_pushdown_df``)."""
        sid = self._current_sid(namespace, table)
        manifest = self._manifest(namespace, table, sid)
        part_cols = list(manifest.get("partition_by") or [])
        if not part_cols:
            raise ValueError(
                f"{namespace}.{table}: not hive-partitioned — "
                "use files() for the per-commit-dir metadata table"
            )
        if self._pending_deletes(manifest, manifest["files"]):
            raise ValueError(
                f"{namespace}.{table}: partitions() with pending "
                "merge-on-read deletes needs a scan — compact() first"
            )
        from component_iceberg_spark.session import scoped_conf

        with scoped_conf(
            spark,
            **{
                "spark.sql.sources.useV1SourceList": "",
                "spark.sql.parquet.aggregatePushdown": "true",
            },
        ):
            per_dir = None
            for d in manifest["files"]:
                one = self._partitions_pushdown_df(
                    spark, namespace, table, d, part_cols, stat_cols
                )
                per_dir = one if per_dir is None else per_dir.unionByName(one)
            merge = [F.sum("n_rows").cast("long").alias("n_rows")]
            for c in stat_cols:
                merge += [
                    F.min(f"min_{c}").alias(f"min_{c}"),
                    F.max(f"max_{c}").alias(f"max_{c}"),
                ]
            final = per_dir.groupBy(*part_cols).agg(*merge)
            rows = final.collect()
            out_schema = final.schema  # one analysis of the N-dir union
        return local_relation(spark, rows, schema=out_schema)

    def maintenance_report(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        small_dir_rows: int = 10_000,
    ) -> DataFrame:
        """Table-health summary — the one-row report an operator reads
        BEFORE deciding which maintenance action to run, answered from
        manifests/refs alone (no data scan, no Spark job):

        - ``n_data_dirs`` high + ``n_small_dirs`` high → ``compact()``
          (or ``compact_manifests`` when only the entry count hurts),
        - ``n_pending_delete_entries`` > 0 → merge-on-read debt;
          ``compact_position_deletes`` / ``compact()`` fold it,
        - ``n_snapshots`` ≫ ``n_current_ancestors`` → rolled-back or
          superseded history; ``expire_snapshots`` reclaims it (minus
          the ``n_refs``-pinned heads),
        - ``total_rows`` is NULL when any dir lacks manifest row counts
          (absent metadata degrades observability, never correctness —
          the files() contract).

        At 100 TB this is the difference between planning maintenance
        from metadata and paying a table scan to discover you need one.
        """
        snaps = self._snapshots(namespace, table)
        cur = snaps[-1]
        refs = self.list_refs(namespace, table)
        ancestors = {
            r.snapshot_id
            for r in self.history(spark, namespace, table).collect()
            if r.is_current_ancestor
        }
        dir_rows = cur.get("dir_rows") or {}
        files = cur["files"]
        have_all = all(d in dir_rows for d in files)
        total = sum(dir_rows[d] for d in files) if have_all else None
        small = sum(
            1
            for d in files
            if d in dir_rows and dir_rows[d] < small_dir_rows
        )
        row = (
            len(snaps),
            len(ancestors),
            len(refs),
            len(files),
            small,
            total,
            len(cur.get("deletes") or []),
            bool(cur.get("renames") or cur.get("retired")),
        )
        return spark.createDataFrame(
            [row],
            schema=(
                "n_snapshots long, n_current_ancestors long, n_refs long, "
                "n_data_dirs long, n_small_dirs long, total_rows long, "
                "n_pending_delete_entries long, schema_lineage_active boolean"
            ),
        )

    def schema(self, spark: SparkSession, namespace: str, table: str):
        return self.read(spark, namespace, table).schema

    # -- internals ----------------------------------------------------------

    def _tbl(self, namespace: str, table: str, *parts: str) -> str:
        return os.path.join(self.warehouse, namespace, table, *parts)

    def _current_sid(self, namespace: str, table: str) -> int:
        # Derived from the snapshot manifests (max id), not the _current
        # hint file: concurrent committers' hint writes can interleave, but
        # the set of published manifests is authoritative.
        snaps = self._snapshots(namespace, table)
        if not snaps:
            raise SnapshotNotFound(f"{namespace}.{table} has no current snapshot")
        return snaps[-1]["snapshot_id"]

    def _manifest(self, namespace: str, table: str, sid: int) -> dict:
        path = self._tbl(namespace, table, "snapshots", f"{sid}.json")
        if not os.path.isfile(path):
            raise SnapshotNotFound(f"{namespace}.{table} snapshot {sid}")
        with open(path) as f:
            return json.load(f)

    def _snapshots(self, namespace: str, table: str) -> list[dict]:
        snap_dir = self._tbl(namespace, table, "snapshots")
        if not os.path.isdir(snap_dir):
            return []
        out = []
        for fn in os.listdir(snap_dir):
            if fn.endswith(".json"):
                with open(os.path.join(snap_dir, fn)) as f:
                    out.append(json.load(f))
        out.sort(key=lambda s: s["snapshot_id"])
        return out

    def _commit(
        self,
        namespace: str,
        table: str,
        df: DataFrame,
        operation: str,
        carry: bool,
        partition_by: list[str] | None = None,
        transform_spec: list[str] | None = None,
        base_sid: int | None = None,
        inherit_spec: bool = False,
        carry_dirs: list[str] | None = None,
        extra_deletes: list[dict] | None = None,
        clear_deletes: bool = False,
        extra_dir_stats: dict | None = None,
        extra_dir_rows: dict | None = None,
        extra_dir_blooms: dict | None = None,
        extra_dir_bounds: dict | None = None,
        extra_dir_schemas: dict | None = None,
        bloom_cols: list[str] | None = None,
        reset_schema_lineage: bool = False,
        sort_by: list[str] | None = None,
        sort_partitions: int | None = None,
        check: str | None = None,
    ) -> int:
        """Write data, then publish a manifest optimistically.

        ``check`` is a CHECK-constraint predicate validated against the
        WRITTEN files after the data write but before the manifest
        publish: a violation deletes the (still-unpublished, hence
        invisible) data dir and raises with a sample row. Checking the
        written bytes — not the input plan — closes the window a
        nondeterministic or concurrently-changing source would otherwise
        have between a pre-write check job and the write job re-executing
        the plan, and costs a scan of only the new directory.

        ``base_sid`` is the snapshot id the operation's inputs were read
        from: any state-derived commit (upsert/delete/update/compact) passes
        it, and publish fails with :class:`CommitConflict` if the table has
        advanced past it — Iceberg's validation-failed commit. Without it
        (append: state-independent; replace: last-writer-wins by contract)
        no base validation applies.

        ``inherit_spec`` keeps the table's partition layout across commits
        that don't explicitly set one — mutations must not silently
        de-partition a hive-partitioned table.

        ``carry_dirs`` carries an explicit subset of the parent's data
        directories into the new manifest untouched (file-pruned
        copy-on-write: a mutation rewrites only directories whose stats say
        they can contain affected rows). ``df=None`` publishes a
        metadata-only commit of exactly ``carry_dirs``.
        """
        snaps = self._snapshots(namespace, table)
        if partition_by is None and (carry or inherit_spec) and snaps:
            # appends and mutations inherit the table's partition spec
            partition_by = snaps[-1].get("partition_by")
        if transform_spec is None and (carry or inherit_spec) and snaps:
            transform_spec = snaps[-1].get("partition_spec")
        if bloom_cols is None and (carry or inherit_spec) and snaps:
            bloom_cols = snaps[-1].get("bloom_cols")

        # Data files are written ONCE under a collision-free name; only the
        # metadata publish participates in the optimistic-commit loop, so a
        # losing committer never rewrites data (Iceberg's commit shape).
        os.makedirs(self._tbl(namespace, table, "snapshots"), exist_ok=True)
        if df is not None:
            # manifest schema = the USER schema; hidden transform columns
            # are derived below and never appear to readers
            schema_json = df.schema.jsonValue()
            if transform_spec:
                fields = partition_spec.parse_spec(transform_spec)
                df = partition_spec.apply_spec(df, fields)
                partition_by = partition_spec.partition_columns(fields)
            if sort_by:
                if partition_by:
                    raise ValueError(
                        "sort_by (ordered write) and partitioning are "
                        "mutually exclusive — hive layout interleaves files"
                    )
                n = sort_partitions or df.sparkSession.sparkContext.defaultParallelism
                # range partitions are written as part-00000, part-00001, …
                # in key order, and each is sorted — (file_path, row_index)
                # is the insertion order, with no single-task sort anywhere
                df = df.repartitionByRange(
                    n, *[F.col(c) for c in sort_by]
                ).sortWithinPartitions(*sort_by)
            data_dir_name = f"commit-{uuid.uuid4().hex[:12]}"
            out_dir = self._tbl(namespace, table, "data", data_dir_name)
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(out_dir)
            if check is not None:
                # ANY check failure mode — a violated predicate OR the
                # validation read itself throwing (e.g. a malformed
                # predicate raising AnalysisException) — must sweep the
                # unpublished data dir, or it is orphaned on disk.
                try:
                    bad = (
                        df.sparkSession.read.parquet(out_dir)
                        .filter(f"NOT ({check})")
                        .limit(1)
                        .collect()
                    )
                except Exception:
                    shutil.rmtree(out_dir, ignore_errors=True)
                    raise
                if bad:
                    shutil.rmtree(out_dir, ignore_errors=True)
                    raise ValueError(
                        f"CHECK constraint violated: ({check}); "
                        f"sample offending row: {bad[0].asDict()}"
                    )
            # one footer walk serves stats + rows + per-row-group bounds
            # (the Iceberg lower/upper_bounds pattern): stamped once at
            # commit time so auto-dispatch is served from the manifest
            # with zero per-statement I/O
            new_stats, new_rows, new_bounds = dir_footer_metrics(out_dir)
            new_blooms = (
                dir_column_blooms(out_dir, bloom_cols) if bloom_cols else {}
            )
            # physical schema stamp for the new dir (the schema of THIS
            # commit's df, before any lineage merge below rewrites the
            # logical manifest schema): lets equal-schema reads skip the
            # mergeSchema inference job (see _scan_schema). Partitioned
            # layouts are not stamped — their files physically lack the
            # partition columns, so the stamp would not match inference.
            new_dir_schema = (
                _nullable_schema_json(schema_json)
                if not partition_by
                else None
            )
        else:
            data_dir_name, out_dir, new_stats, new_rows = None, None, None, 0
            new_blooms = {}
            new_bounds = None
            new_dir_schema = None
            schema_json = snaps[-1]["schema"] if snaps else None

        # Optimistic publish: claim snapshot id N+1 via exclusive create of
        # its manifest; a concurrent winner makes the create fail, so we
        # re-read the new table state and retry on top of it.
        while True:
            snaps = self._snapshots(namespace, table)
            sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
            if base_sid is not None and snaps and snaps[-1]["snapshot_id"] != base_sid:
                # A rival commit landed while this operation was computing /
                # writing data: its result is stale — publishing it at sid+1
                # would silently drop the rival's rows (lost update). Same
                # contract as the FileExistsError window below, but this
                # catches conflicts that land during the (long) data-write
                # phase, not just the publish instant.
                if out_dir:
                    shutil.rmtree(out_dir, ignore_errors=True)
                raise CommitConflict(
                    f"{namespace}.{table}: table advanced from snapshot "
                    f"{base_sid} to {snaps[-1]['snapshot_id']} during this "
                    "operation; re-run it on the new state"
                )
            new_files = [data_dir_name] if data_dir_name else []
            if carry and snaps:
                files = snaps[-1]["files"] + new_files
            elif carry_dirs is not None:
                files = list(carry_dirs) + new_files
            else:
                files = new_files
            # carried dirs keep their parent-manifest stats verbatim — the
            # whole point is those directories were not rewritten
            parent_stats = snaps[-1].get("dir_stats", {}) if snaps else {}
            dir_stats = {d: parent_stats[d] for d in files if d in parent_stats}
            if data_dir_name and new_stats:
                dir_stats[data_dir_name] = new_stats
            parent_rows = snaps[-1].get("dir_rows", {}) if snaps else {}
            dir_rows = {d: parent_rows[d] for d in files if d in parent_rows}
            if data_dir_name:
                dir_rows[data_dir_name] = new_rows
            parent_blooms = snaps[-1].get("dir_blooms", {}) if snaps else {}
            dir_blooms = {
                d: parent_blooms[d] for d in files if d in parent_blooms
            }
            if data_dir_name and new_blooms:
                dir_blooms[data_dir_name] = new_blooms
            for d, bl in (extra_dir_blooms or {}).items():
                if d in files and bl:
                    dir_blooms[d] = bl
            parent_bounds = snaps[-1].get("dir_bounds", {}) if snaps else {}
            dir_bounds = {
                d: parent_bounds[d] for d in files if d in parent_bounds
            }
            if data_dir_name and new_bounds is not None:
                dir_bounds[data_dir_name] = new_bounds
            for d, b in (extra_dir_bounds or {}).items():
                if d in files and b is not None:
                    dir_bounds[d] = b
            parent_schemas = snaps[-1].get("dir_schemas", {}) if snaps else {}
            dir_schemas = {
                d: parent_schemas[d] for d in files if d in parent_schemas
            }
            if data_dir_name and new_dir_schema is not None:
                dir_schemas[data_dir_name] = new_dir_schema
            # caller-computed metadata for dirs it assembled WITHOUT a data
            # write (compact_manifests merges stats from the parent
            # manifest — the dirs are new names, so parent lookup misses)
            for d, s in (extra_dir_stats or {}).items():
                if d in files:
                    dir_stats[d] = s
            for d, r in (extra_dir_rows or {}).items():
                if d in files:
                    dir_rows[d] = r
            for d, s in (extra_dir_schemas or {}).items():
                if d in files and s:
                    dir_schemas[d] = s
            # pending equality-delete entries follow the dirs they apply
            # to: entries whose dirs were all rewritten (or cleared by
            # compaction) drop out; surviving entries prune their
            # applies_to to the dirs still present
            deletes: list[dict] = []
            if not clear_deletes and snaps:
                for e in snaps[-1].get("deletes", []):
                    keep = [d for d in e["applies_to"] if d in files]
                    if keep:
                        deletes.append({**e, "applies_to": keep})
            deletes.extend(extra_deletes or [])
            # rename-chain / retired-name metadata follows the carried
            # dirs (they keep their pre-rename physical names); a pure
            # replace rewrites everything, so both reset. Reintroducing a
            # retired name would make old physical bytes ambiguous with
            # the new column — refuse (the name-based layout's substitute
            # for Iceberg field ids).
            renames: list = []
            retired: list = []
            widened = False
            if (
                snaps
                and (carry or carry_dirs is not None)
                and not reset_schema_lineage
            ):
                renames = snaps[-1].get("renames") or []
                retired = snaps[-1].get("retired") or []
                widened = bool(snaps[-1].get("widened"))
                if schema_json and (renames or retired or widened):
                    # reads on lineage-active tables PROJECT to the
                    # manifest schema, so a narrower append must not
                    # hide previously evolved columns (mergeSchema
                    # keeps surfacing them on plain tables): keep every
                    # parent field in parent order (taking the new
                    # field dict where names overlap), then append the
                    # genuinely new columns
                    parent_fields = (snaps[-1].get("schema") or {}).get(
                        "fields", []
                    )
                    if parent_fields:
                        new_by_name = {
                            f["name"]: f for f in schema_json["fields"]
                        }
                        pnames = {f["name"] for f in parent_fields}
                        schema_json = {
                            **schema_json,
                            "fields": [
                                new_by_name.get(f["name"], f)
                                for f in parent_fields
                            ]
                            + [
                                f
                                for f in schema_json["fields"]
                                if f["name"] not in pnames
                            ],
                        }
                if widened and schema_json:
                    # a narrow-typed append after a widening must not
                    # revert the logical type: the narrow files upcast at
                    # scan, the schema keeps the wide type
                    ptypes = {
                        f["name"]: f["type"]
                        for f in (snaps[-1].get("schema") or {}).get(
                            "fields", []
                        )
                    }
                    schema_json = {
                        **schema_json,
                        "fields": [
                            {**f, "type": ptypes[f["name"]]}
                            if (
                                f["name"] in ptypes
                                and (f["type"], ptypes[f["name"]])
                                in self._WIDENINGS
                            )
                            else f
                            for f in schema_json["fields"]
                        ],
                    }
                if schema_json and retired:
                    clash = {
                        f["name"] for f in schema_json.get("fields", [])
                    } & set(retired)
                    if clash:
                        if out_dir:  # unpublished — sweep, don't orphan
                            shutil.rmtree(out_dir, ignore_errors=True)
                        raise ValueError(
                            f"column name(s) {sorted(clash)} were retired "
                            "by an earlier rename/drop and old data files "
                            "may still contain them; name reuse is not "
                            "supported on this name-based layout"
                        )
            manifest = {
                "snapshot_id": sid,
                "parent_id": snaps[-1]["snapshot_id"] if snaps else None,
                "timestamp_ms": int(time.time() * 1000),
                "operation": operation,
                "files": files,
                "partition_by": partition_by or [],
                "partition_spec": transform_spec or [],
                "schema": schema_json,
                "dir_stats": dir_stats,
                "dir_rows": dir_rows,
                "deletes": deletes,
                "renames": renames,
                "retired": retired,
                "widened": widened,
                "bloom_cols": bloom_cols or [],
                "dir_blooms": dir_blooms,
                "dir_bounds": dir_bounds,
                "dir_schemas": dir_schemas,
            }
            snap_path = self._tbl(namespace, table, "snapshots", f"{sid}.json")
            try:
                with open(snap_path, "x") as f:
                    json.dump(manifest, f)
                break
            except FileExistsError:
                if carry:
                    continue  # append: data independent of state — retry
                # result was computed from a now-stale snapshot
                if out_dir:
                    shutil.rmtree(out_dir, ignore_errors=True)
                raise CommitConflict(
                    f"{namespace}.{table}: snapshot {sid} was committed "
                    "concurrently; re-run this operation on the new state"
                ) from None
        # _current is a convenience hint only; reads derive the current id
        # from the manifest set (_current_sid) — so a failed hint write
        # must NOT raise: the commit is already PUBLISHED (the manifest
        # was exclusively created above), and an exception escaping here
        # would reach callers' cleanup handlers, which sweep data/delete
        # dirs on the assumption nothing was published — turning a
        # cosmetic I/O error into a published snapshot referencing
        # deleted files.
        try:
            cur_tmp = self._tbl(
                namespace, table, f"_current.tmp-{uuid.uuid4().hex}"
            )
            with open(cur_tmp, "w") as f:
                f.write(str(sid))
            os.replace(cur_tmp, self._tbl(namespace, table, "_current"))
        except OSError:
            pass
        return sid
