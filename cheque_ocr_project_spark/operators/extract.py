"""Arrow-batched extraction operators.

Two roles:

1. ``fuzzy_match_candidates`` — the only stage of the flagship pipeline that
   cannot be a native expression: difflib-parity dictionary matching
   (issuer_processor_v.py:359-375). Run over the *distinct* candidate
   strings (J6 memoization — dedup-before-expensive-op) against a
   broadcast dictionary, then hash-joined back.

2. ``extract_turns_udf`` — the full-oracle mapInPandas path: applies
   oracle.turn.extract_turn over Arrow record batches. This is the
   parity-guaranteed fallback and the apples-to-apples baseline the native
   pipeline is benchmarked against (it is also how a model-holding UDF
   would be shaped: per-worker lazy state, batch-in/batch-out).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cheque_ocr_project_spark.oracle import fuzzy as oracle_fuzzy
from cheque_ocr_project_spark.oracle import issuer as oracle_issuer
from cheque_ocr_project_spark.oracle import turn as oracle_turn

FUZZY_SCHEMA = T.StructType([
    T.StructField("cand_text", T.StringType()),
    T.StructField("matched_name", T.StringType()),
    T.StructField("similarity", T.DoubleType()),
])


def fuzzy_match_candidates(spark: SparkSession, candidates: DataFrame,
                           drawer_dict: list[str],
                           text_col: str = "cand_text") -> DataFrame:
    """(distinct candidate text) -> (text, matched_name, similarity).

    ``drawer_dict`` is broadcast once per job (small dimension); difflib runs
    Arrow-batched over distinct candidates only. Output joins back to the
    exploded line relation on ``cand_text``.
    """
    bc = spark.sparkContext.broadcast(drawer_dict)

    def match_batch(pdf_iter):
        dd = bc.value
        for pdf in pdf_iter:
            # Null candidates are dropped Python-side (free) so callers can
            # pass a null-including distinct set without a Catalyst filter —
            # a filter on a computed candidate column gets predicate-pushed
            # below the producing projection and re-inlines its whole
            # expression tree (the hybrid engine relies on this).
            texts = pdf[text_col].dropna().reset_index(drop=True)
            matched = []
            sims = []
            for t in texts:
                name, sim = oracle_fuzzy.match_name_v1(t, dd)
                matched.append(name)
                sims.append(sim)
            yield pd.DataFrame({
                "cand_text": texts,
                "matched_name": matched,
                "similarity": sims,
            })

    return candidates.select(F.col(text_col)).distinct().mapInPandas(
        match_batch, schema=FUZZY_SCHEMA
    )


FUZZY_STRUCT = T.StructType([
    T.StructField("matched_name", T.StringType()),
    T.StructField("similarity", T.DoubleType()),
])


def fuzzy_match_udf(spark: SparkSession, drawer_dict: list[str]):
    """Scalar Arrow-batched difflib matcher: cand -> (matched_name, sim).

    Inline alternative to ``fuzzy_match_candidates`` + broadcast join: the
    hybrid engine calls this directly on the candidate column, so the fuzzy
    step needs NO extra input scan, NO distinct shuffle, and NO broadcast —
    one Arrow hop carrying only the (short) candidate strings. Matching is
    memoized per batch series (J6: distinct-before-expensive-op, done
    Python-side where it's a dict lookup), mirroring the reference's
    match_cache (issuer_processor_v.py:359-375). Nulls pass through as
    (null, null)."""
    bc = spark.sparkContext.broadcast(drawer_dict)

    @F.pandas_udf(FUZZY_STRUCT)
    def match(cands: pd.Series) -> pd.DataFrame:
        dd = bc.value
        memo: dict = {}
        names, sims = [], []
        for c in cands:
            if c is None or isinstance(c, float):
                names.append(None)
                sims.append(None)
                continue
            hit = memo.get(c)
            if hit is None:
                hit = oracle_fuzzy.match_name_v1(c, dd)
                memo[c] = hit
            names.append(hit[0])
            sims.append(hit[1])
        return pd.DataFrame({"matched_name": names, "similarity": sims})

    return match


RESULT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("main_text", T.StringType()),
    T.StructField("success", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("cheque_type", T.StringType()),
    T.StructField("is_government", T.BooleanType()),
    T.StructField("government_category", T.StringType()),
    T.StructField("payee_rule", T.StringType()),
    T.StructField("payee_raw", T.StringType()),
    T.StructField("payee_cleaned", T.StringType()),
    T.StructField("issuer", T.StringType()),
    T.StructField("issuer_conf", T.DoubleType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("field_date", T.StringType()),
    T.StructField("field_amount", T.StringType()),
    T.StructField("field_account", T.StringType()),
    T.StructField("micr_city", T.StringType()),
    T.StructField("micr_bank", T.StringType()),
    T.StructField("micr_serial", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("opr_no", T.StringType()),
    T.StructField("file_mark", T.BooleanType()),
])


def extract_turns_udf(spark: SparkSession, transcripts: DataFrame,
                      drawer_dict: list[str],
                      threshold: float = oracle_issuer.DEFAULT_THRESHOLD_V1
                      ) -> DataFrame:
    """Full-oracle extraction via mapInPandas (parity baseline path).

    Per-record errors are isolated inside the batch (B6 semantics: an ERROR
    row is emitted, the job never fails)."""
    bc = spark.sparkContext.broadcast(drawer_dict)
    field_names = [f.name for f in RESULT_SCHEMA.fields]
    out_fields = list(oracle_turn.RESULT_FIELDS)

    def run_batches(pdf_iter):
        dd = bc.value
        cache: dict = {}  # per-task fuzzy-match memo (J6; reference match_cache)
        for pdf in pdf_iter:
            # columnar accumulation (dict-of-lists -> DataFrame is ~5x
            # cheaper than list-of-dicts for wide results)
            out: dict[str, list] = {name: [] for name in out_fields}
            for text, role, tool in zip(pdf["text"], pdf["role"], pdf["tool"]):
                try:
                    rec = oracle_turn.extract_turn(
                        None if text is None or isinstance(text, float) else text,
                        role,
                        None if tool is None or isinstance(tool, float) else tool,
                        dd, threshold, cache,
                    )
                except Exception as exc:  # B6: never fail the job
                    rec = dict.fromkeys(out_fields)
                    rec.update({
                        "success": False, "error": str(exc), "status": "ERROR",
                        "issuer_conf": 0.0, "confidence": 0.0,
                        "is_government": False, "file_mark": False,
                    })
                for name in out_fields:
                    out[name].append(rec[name])
            out_pdf = pd.DataFrame(out)
            out_pdf.insert(0, "conv_id", pdf["conv_id"].values)
            out_pdf.insert(1, "turn_idx", pdf["turn_idx"].values)
            yield out_pdf[field_names]

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    src = _ensure_parallelism(spark, transcripts.select(*cols))
    return src.mapInPandas(run_batches, schema=RESULT_SCHEMA)


def _ensure_parallelism(spark: SparkSession, df: DataFrame) -> DataFrame:
    """CPU-bound stage: make sure there are at least as many tasks as cores.
    (A single small parquet file otherwise pins the whole extraction on 1-2
    tasks.) Decided from file-source metadata only — no RDD conversion: at
    real scale input files >> cores and this is a pure no-op."""
    target = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        # In-memory / post-shuffle DataFrame (no file metadata): only add an
        # exchange when the plan is genuinely under-parallel — never
        # down-shuffle one that already has enough partitions.
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:
            pass
    return df.repartition(target)


V3_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("issuer_v3", T.StringType()),
    T.StructField("confidence_v3", T.DoubleType()),
    T.StructField("matched_with", T.StringType()),
    T.StructField("status_v3", T.StringType()),
])


def extract_turns_v3_udf(spark: SparkSession, transcripts: DataFrame,
                         drawer_dict: list[str],
                         threshold: float = 0.85) -> DataFrame:
    """V3-variant extraction (IssuerBatchProcessorV3 semantics)."""
    bc = spark.sparkContext.broadcast(drawer_dict)
    names = [f.name for f in V3_SCHEMA.fields]

    def run_batches(pdf_iter):
        dd = bc.value
        cache: dict = {}
        for pdf in pdf_iter:
            out: dict[str, list] = {n: [] for n in names[2:]}
            for text, role, tool in zip(pdf["text"], pdf["role"], pdf["tool"]):
                rec = oracle_turn.extract_turn_v3(
                    None if text is None or isinstance(text, float) else text,
                    role,
                    None if tool is None or isinstance(tool, float) else tool,
                    dd, threshold, cache,
                )
                for n in names[2:]:
                    out[n].append(rec[n])
            out_pdf = pd.DataFrame(out)
            out_pdf.insert(0, "conv_id", pdf["conv_id"].values)
            out_pdf.insert(1, "turn_idx", pdf["turn_idx"].values)
            yield out_pdf[names]

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    src = _ensure_parallelism(spark, transcripts.select(*cols))
    return src.mapInPandas(run_batches, schema=V3_SCHEMA)
