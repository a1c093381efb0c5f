"""Checkpoint manifest + idempotent resume (north rule; SURVEY.md B5).

The resume unit is a *bucket*: ``pmod(xxhash64(conv_id, turn_idx), n)``.
Buckets are stable under any input partitioning (unlike physical partition
ids) and give salted-hash granularity on conv_id — a heavy conversation
spreads across all buckets, so no resume unit pins a single long session.

Protocol:
1. completed buckets are read from ``<output>/_manifest`` (JSON lines:
   bucket, rows, bytes, input_fingerprint, wall_ms, engine)
2. pending = input anti-filtered on completed bucket ids
3. extraction runs on pending; results written with dynamic partition
   overwrite into ``<output>/data/bucket=<b>/`` (re-running a bucket is
   idempotent — it replaces exactly its own directory)
4. per-bucket metrics (row count, byte size, order-independent input
   fingerprint) appended to the manifest only AFTER the data commit, so a
   crash between 3 and 4 re-processes the bucket (at-least-once, idempotent)

Input-change detection: the fingerprint is the xor-sum of per-row
``xxhash64(conv_id, turn_idx, text)``; a resumed run whose recomputed
fingerprint for a completed bucket differs can invalidate it (``strict``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL,
        F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(n_buckets)),
    )


def read_manifest(output_dir: str) -> list[dict]:
    path = Path(output_dir) / "_manifest"
    if not path.exists():
        return []
    entries = []
    for f in sorted(path.glob("*.json")):
        with f.open() as fh:
            for line in fh:
                line = line.strip()
                if line:
                    entries.append(json.loads(line))
    return entries


def completed_buckets(output_dir: str) -> set[int]:
    return {e["bucket"] for e in read_manifest(output_dir)}


def append_manifest(output_dir: str, entries: list[dict]) -> None:
    path = Path(output_dir) / "_manifest"
    path.mkdir(parents=True, exist_ok=True)
    stamp = f"commit-{int(time.time() * 1000)}-{len(entries)}"
    tmp = path / f".{stamp}.tmp"
    with tmp.open("w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    tmp.rename(path / f"{stamp}.json")  # atomic publish


def input_fingerprints(transcripts_b: DataFrame) -> DataFrame:
    """Per-bucket order-independent input fingerprint + input row count
    (xor-fold of row hashes: commutative, no ANSI sum overflow)."""
    h = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.coalesce(F.col("text"), F.lit("")))
    return (
        transcripts_b.withColumn("__h", h)
        .groupBy(BUCKET_COL)
        .agg(
            F.expr("bit_xor(__h)").alias("input_fingerprint"),
            F.count(F.lit(1)).alias("input_rows"),
        )
    )


def run_with_checkpoint(
    spark: SparkSession,
    transcripts: DataFrame,
    drawer_dict: list[str],
    output_dir: str,
    n_buckets: int = 64,
    threshold: float = 0.90,
    engine: str = "arrow",
    wave_size: int = 16,
    stage_input: bool = False,
    _fail_after_waves: int | None = None,
) -> dict:
    """Extraction with per-bucket lineage + metrics; resumable.

    Buckets are processed in WAVES of ``wave_size``: each wave's data is
    committed (dynamic partition overwrite — a wave replaces only its own
    bucket directories) and its manifest entries appended BEFORE the next
    wave starts, so a driver crash loses at most one in-flight wave, not
    the whole run. ``wall_ms`` is the honest wall of the entry's own wave.

    Input-pass trade-off: by default each wave re-filters the raw input on
    its bucket ids (the bucket is a hash, so this is a scan-side filter,
    not partition pruning — n_buckets/wave_size input passes). With
    ``stage_input=True`` the bucketed input is written ONCE to
    ``<output>/_staged`` partitioned by bucket, and every wave reads only
    its own partitions (partition pruning; total I/O = one write + one
    read regardless of wave count — the right mode at 100 TB). The staged
    copy is reused on resume when its ``_staged.committed`` marker exists.

    ``_fail_after_waves`` is a test hook simulating a mid-run driver crash
    AFTER that many wave commits.

    Returns {"processed_buckets", "skipped_buckets", "rows", "waves"}.
    """
    from pathlib import Path as _Path

    from cheque_ocr_project_spark.plans import pipeline as P

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    tb = with_bucket(transcripts, n_buckets)
    if stage_input:
        staged_dir = f"{output_dir}/_staged"
        marker = _Path(staged_dir + ".committed")
        if not marker.exists():
            tb.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staged_dir)
            marker.write_text("ok\n")  # after the write commits (crash-safe)
        tb = spark.read.parquet(staged_dir).withColumn(
            BUCKET_COL, F.col(BUCKET_COL).cast("long")
        )
    done = completed_buckets(output_dir)
    # bucket-id list is <= n_buckets rows — driver-small by construction
    all_ids = {r[0] for r in tb.select(BUCKET_COL).distinct().collect()}
    pending_ids = sorted(all_ids - done)
    if not pending_ids:
        return {"processed_buckets": 0, "skipped_buckets": len(done),
                "rows": 0, "waves": 0}

    data_dir = f"{output_dir}/data"
    byte_size = (
        F.octet_length(F.coalesce(F.col("main_text"), F.lit("")))
        + F.octet_length(F.coalesce(F.col("payee_cleaned"), F.lit("")))
        + F.octet_length(F.coalesce(F.col("issuer"), F.lit("")))
    )

    total_rows, waves = 0, 0
    for w0 in range(0, len(pending_ids), wave_size):
        wave_ids = pending_ids[w0:w0 + wave_size]
        t0 = time.perf_counter()
        wave_in = tb.filter(F.col(BUCKET_COL).isin(wave_ids))
        result = P.extract_pipeline(
            spark, wave_in.drop(BUCKET_COL), drawer_dict, threshold,
            engine=engine,
        )
        result = with_bucket(result, n_buckets)
        result.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        # Metrics from the committed data (not the in-flight plan). A run
        # whose every wave so far produced zero rows has an unreadable data
        # dir (no parquet footers to infer from) — stats is then empty, not
        # an error. Only THAT case (schema inference finds nothing) is
        # tolerated; a corrupt footer or transient FS failure must
        # propagate, not be silently recorded as rows=0/bytes=0.
        from pyspark.errors import AnalysisException

        try:
            committed = spark.read.parquet(data_dir).filter(
                F.col(BUCKET_COL).isin(wave_ids)
            )
            stats = committed.groupBy(BUCKET_COL).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(byte_size).alias("bytes"),
            )
        except AnalysisException:
            stats = spark.createDataFrame(
                [], f"{BUCKET_COL} long, rows long, bytes long"
            )
        fps = input_fingerprints(wave_in)
        # Key the entries on the ATTEMPTED bucket ids, not the committed
        # output: a bucket whose extraction yields zero output rows must
        # still be committed to the manifest (rows/bytes = 0), else it is
        # re-processed on every resume forever and processed_buckets
        # overcounts. fps covers every wave_id (each has >=1 input row by
        # construction); stats may not (zero-output buckets).
        per_bucket = {
            int(r[BUCKET_COL]): r
            for r in fps.join(stats, BUCKET_COL, "left").collect()
        }
        entries = []
        for b in wave_ids:
            r = per_bucket[int(b)]
            entries.append({
                "bucket": int(b),
                "rows": int(r["rows"]) if r["rows"] is not None else 0,
                "bytes": int(r["bytes"]) if r["bytes"] is not None else 0,
                "input_fingerprint": int(r["input_fingerprint"]),
                "input_rows": int(r["input_rows"]),
                "wall_ms": wall_ms,
                "wave": waves,
                "engine": engine,
            })
        append_manifest(output_dir, entries)
        total_rows += sum(e["rows"] for e in entries)
        waves += 1
        if (
            _fail_after_waves is not None
            and waves >= _fail_after_waves
            and w0 + wave_size < len(pending_ids)
        ):
            raise RuntimeError(
                f"simulated driver crash after wave {waves} commit"
            )

    return {
        "processed_buckets": len(pending_ids),
        "skipped_buckets": len(done),
        "rows": total_rows,
        "waves": waves,
    }
