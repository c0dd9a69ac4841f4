"""Shared helpers for the oracle-checked query surface.

Determinism rules used throughout (so the driver's order-insensitive
value-hash matches DuckDB bit-for-bit):

- **Sums of doubles go through decimal.** Float addition is
  order-dependent; at 32 shuffle partitions Spark's partial sums would
  differ from DuckDB's sequential sum in the low bits. Casting the addend
  to ``decimal(28,6)`` makes the aggregation exact in both engines; the
  final ``round(_, 2)::double`` is then bit-identical.
- **Every computed column is aliased identically** in the Spark plan and
  the oracle SQL (driver compares columns sorted by name).
- **Ranking ties are pinned** with a unique tiebreak column so top-k sets
  are well-defined.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (S3 table scan).

    Pins runtime confs a foreign driver session might set differently:
    UTC timezone (the DuckDB oracle treats parquet timestamps as naive wall
    times — another zone shifts every date/window/epoch derivation), AQE on,
    and a sane shuffle-partition count (a default-200 session would spend
    more time on task overhead than on this data).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_CODE_VERSION: str | None = None


def code_version() -> str:
    """Hash of every ``.py`` source in the package — temp-dir warehouse
    caches key on it, so outputs built by an OLDER code version are rebuilt
    instead of silently reused (a stale ``_BUILT`` marker could otherwise
    mask regressions or fail queries against new code)."""
    global _CODE_VERSION
    if _CODE_VERSION is None:
        import hashlib

        import walmart_project_etl_spark as pkg
        root = os.path.dirname(os.path.abspath(pkg.__file__))
        h = hashlib.md5()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    h.update(fn.encode())
                    with open(os.path.join(dirpath, fn), "rb") as fh:
                        h.update(fh.read())
        _CODE_VERSION = h.hexdigest()[:10]
    return _CODE_VERSION


def build_once(name: str, build, marker_file: str = "_BUILT",
               timeout: float = 900.0) -> str:
    """Build a temp-dir artifact exactly once per (code version, name),
    safely across processes: atomic-mkdir lock elects one builder, waiters
    poll for the marker. Returns the artifact root directory."""
    import tempfile
    import time
    root = os.path.join(tempfile.gettempdir(), f"wpe_{name}_{code_version()}")
    marker = os.path.join(root, marker_file)
    if os.path.exists(marker):
        return root
    lock = root + ".lock"
    os.makedirs(root, exist_ok=True)
    try:
        os.mkdir(lock)
        owner = True
    except FileExistsError:
        owner = False
    if owner:
        try:
            build(root)
            open(marker, "w").close()
        finally:
            os.rmdir(lock)
    else:
        deadline = time.time() + timeout
        while not os.path.exists(marker) and time.time() < deadline:
            time.sleep(1)
        if not os.path.exists(marker):
            raise TimeoutError(
                f"{name}: build by another process did not finish "
                f"within {timeout:.0f}s")
    return root


_EVENTS_CACHE: dict[str, str] = {}


def events_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, normalizing its ``ts`` column to TIMESTAMP.

    The driver's events parquet has shipped with two physical ``ts``
    encodings across testdata generations: TIMESTAMP(NANOS) (which Spark's
    parquet reader rejects — ``PARQUET_TYPE_ILLEGAL``) and TIMESTAMP(MICROS)
    with ``isAdjustedToUTC=false`` (which Spark reads as TIMESTAMP_NTZ).
    Both are normalized to a session-TZ TIMESTAMP of the same wall-clock
    values (session is pinned UTC, matching DuckDB's naive reading): nanos
    are read as LONG (legacy conf) and truncated to micros (``div 1000`` —
    exactly DuckDB's ns→µs truncation); NTZ micros are cast directly. The
    result is materialized per (process, code version) so downstream
    queries (and the file-source *stream*, which needs a directory) read a
    normal parquet dir.
    """
    if sf_dir in _EVENTS_CACHE:
        return spark.read.parquet(_EVENTS_CACHE[sf_dir])
    import hashlib

    def build(out: str) -> None:
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        path = os.path.join(sf_dir, "events.parquet")
        # Dispatch on the decoded schema, not on exceptions: with
        # nanosAsLong pinned true the read succeeds under EITHER physical
        # encoding, and the resulting dtype says which one it was —
        # LongType ⇒ the file was TIMESTAMP(NANOS) (truncate ns→µs, exactly
        # DuckDB's behaviour); timestamp/TIMESTAMP_NTZ ⇒ micros (cast is a
        # no-op wall-clock-wise under the pinned-UTC session). Exception
        # dispatch would misfire if a foreign driver session already had
        # nanosAsLong=true: the nanos file would read as LONG, the "micros"
        # branch would win, and cast('timestamp') would interpret int64
        # nanoseconds as epoch seconds — silent corruption. Genuine I/O
        # errors (missing file, corrupt footer) now propagate directly.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            raw = spark.read.parquet(path)
            if isinstance(raw.schema["ts"].dataType, LongType):
                conv = raw.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000")))
            else:
                conv = raw.withColumn("ts", F.col("ts").cast("timestamp"))
            # several part files so file-source STREAMS over the copy in
            # multiple micro-batches (maxFilesPerTrigger) — single-file
            # input would collapse every streaming query to one batch and
            # leave incremental semantics untested. Written (executed)
            # while the conf is still pinned — the scan consults it at
            # execution time, not just analysis.
            conv.repartition(8).write.mode("overwrite").parquet(out)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)

    out = build_once(
        "events_us_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
        build, marker_file="_SUCCESS", timeout=300.0)
    _EVENTS_CACHE[sf_dir] = out
    return spark.read.parquet(out)


def events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Path of the micros-converted events directory (for streaming)."""
    events_t(spark, sf_dir)
    return _EVENTS_CACHE[sf_dir]


_EMB_DIR_CACHE: dict[str, str] = {}


def embeddings_dir(spark: SparkSession, sf_dir: str) -> str:
    """Multi-file embeddings directory for the file-source stream: the
    driver's single-file parquet would collapse to ONE micro-batch, so
    repartition(8) by vec_id gives the stream real batches to drain
    (per-row values unchanged — only file placement moves, and the
    count-delta monitors are split-invariant by construction).
    Materialized once per (process, code version) like the events dir.
    """
    import hashlib

    if sf_dir in _EMB_DIR_CACHE:
        return _EMB_DIR_CACHE[sf_dir]

    def build(out: str) -> None:
        (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
         .repartition(8, "vec_id")
         .write.mode("overwrite").parquet(os.path.join(out, "data")))

    root = build_once(
        "emb_dir_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
        build, marker_file="_BUILT_EMB", timeout=300.0)
    _EMB_DIR_CACHE[sf_dir] = os.path.join(root, "data")
    return _EMB_DIR_CACHE[sf_dir]


def round2(col: Column, scale: int = 2) -> Column:
    """Cross-engine-deterministic HALF_UP rounding of a double expression.

    ``F.round`` on a raw double rounds the double's shortest decimal
    representation while DuckDB rounds the binary value — they disagree on
    exact .xx5 boundaries. Routing through ``decimal(28,8)`` (boundary-free
    for the bounded-denominator rationals in this data) then rounding the
    exact decimal makes both engines produce the same bits.
    """
    return F.round(col.cast("decimal(28,8)"), scale).cast("double")


def sql_round2(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`round2`."""
    return f"round(CAST(({expr}) AS DECIMAL(28,8)), {scale})::DOUBLE"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal-routed sum of a double column → round → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(28,6)")), scale).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"round(sum(CAST({expr} AS DECIMAL(28,6))), {scale})::DOUBLE AS {alias}"


# --------------------------------------------------------------- goldens

#: Directory of pinned-golden oracle row sets (one JSON file per query).
GOLDENS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens")

#: Spark simple-type → VALUES literal renderer tag.
_GOLDEN_TYPES = ("bigint", "int", "double", "string", "boolean", "date")


def _golden_literal(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "double":
        f = float(v)
        if f != f:
            return "CAST('NaN' AS DOUBLE)"
        if f in (float("inf"), float("-inf")):
            return f"CAST('{'-' if f < 0 else ''}Infinity' AS DOUBLE)"
        r = repr(f)
        # a bare decimal literal parses as DECIMAL in DuckDB; an exponent
        # forces a direct (bit-exact) DOUBLE parse
        return r if ("e" in r or "E" in r) else r + "e0"
    if typ == "boolean":
        return "TRUE" if v else "FALSE"
    if typ == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "date":
        return f"DATE '{v}'"
    return str(int(v))


def pinned(name: str) -> str:
    """Render the pinned-golden oracle for ``name`` — a constant
    ``SELECT * FROM (VALUES ...)`` materializing the query's OWN sf0.01
    output, regenerated by ``tools/pin_golden.py`` (which runs the query
    twice and refuses to pin nondeterminism; cross-session stability is
    then proven by ``tools/check_oracle.py`` in a fresh process).

    This is the exact-oracle mechanism for DETERMINISTIC engine-internal
    outputs DuckDB cannot recompute (seeded xxhash64 draws, plan-time LSH
    hyperplanes, seeded KMeans, HLL/quantile sketches): the driver's
    value hash then proves the full row set, not just a row count.
    PINNED-ENVIRONMENT ASSUMPTION: goldens encode this Spark/numpy build's
    float behavior; a platform upgrade that shifts low bits shows up as a
    value mismatch and requires a re-pin (documented in docs/COVERAGE.md).
    """
    import json

    with open(os.path.join(GOLDENS_DIR, f"{name}.json")) as fh:
        g = json.load(fh)
    cols = [c["name"] for c in g["columns"]]
    types = [c["type"] for c in g["columns"]]
    unknown = [t for t in types if t not in _GOLDEN_TYPES]
    assert not unknown, f"golden {name}: unrenderable types {unknown}"
    first = True
    rows_sql = []
    for row in g["rows"]:
        lits = [_golden_literal(v, t) for v, t in zip(row, types)]
        if first:
            # casts on the first row pin the VALUES clause's unified
            # column types (BIGINT vs DuckDB's default INTEGER, etc.)
            duck = {"bigint": "BIGINT", "int": "INTEGER",
                    "double": "DOUBLE", "string": "VARCHAR",
                    "boolean": "BOOLEAN", "date": "DATE"}
            lits = [f"CAST({l} AS {duck[t]})"
                    for l, t in zip(lits, types)]
            first = False
        rows_sql.append("(" + ", ".join(lits) + ")")
    quoted = [f'"{c}"' for c in cols]     # e.g. `check` is reserved
    if not rows_sql:
        sel = ", ".join(f"CAST(NULL AS {t.upper()}) AS {c}"
                        for c, t in zip(quoted, types))
        return f"SELECT {sel} WHERE FALSE"
    return ("SELECT * FROM (VALUES "
            + ",\n       ".join(rows_sql)
            + f") AS __g({', '.join(quoted)})")
