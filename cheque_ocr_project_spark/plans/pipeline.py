"""The flagship extraction pipeline as a native DataFrame plan.

Decomposition of the reference lifecycle (SURVEY.md §3.1/§3.2) into Catalyst
stages — whole-stage-codegen native expressions everywhere except the
difflib fuzzy join (Arrow-batched, memoized over distinct candidates):

  transcripts
    → main-content strip (tool payloads; array HOFs, zero shuffle)
    → turn-level classify / payee / field grammars   (native, zero shuffle)
    → line relation (posexplode)                     (narrow)
    → candidate generation + validity               (native)
    → distinct-candidate fuzzy match                (Arrow UDF, J6 memoized)
    → scoring + per-turn top-1 (max_by aggregation) (1 shuffle on turn key)
    → FOR-scan short-circuit (min_by aggregation)   (same shuffle)
    → join back to turn level                       (co-partitioned join)

Scale design: per-turn keys (conv_id, turn_idx) give fine-grained shuffle
granularity, so a single 10^6-turn conversation cannot pin a task (the salt
is the turn index itself); AQE handles residual skew. The only shuffles are
keyed aggregations over (conv_id, turn_idx) plus one distinct over the
candidate vocabulary (tiny relative to lines).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cheque_ocr_project_spark.functions import columns as C
from cheque_ocr_project_spark.operators import extract as X
from cheque_ocr_project_spark.oracle import issuer as oracle_issuer
from cheque_ocr_project_spark.oracle import vocab

KEYS = ["conv_id", "turn_idx"]

# --------------------------------------------------------------------------
# main-content extraction (oracle.boilerplate parity, array HOFs)
# --------------------------------------------------------------------------

_COLLAPSE = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731

# Python str.strip() strips ALL whitespace; Spark trim() strips spaces only.
_PYSTRIP = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731


def _html_main(text: Column) -> Column:
    lines = F.split(text, "\n")
    lines = F.filter(lines, lambda ln: ~ln.rlike(r"(?i)<\s*(script|style)\b"))

    def stats(ln: Column) -> Column:
        stripped = F.regexp_replace(ln, r"<[^>]*>", "")
        visible = _COLLAPSE(stripped)
        tag_density = F.try_divide(F.length(ln) - F.length(stripped), F.length(ln))
        anchor_len = F.aggregate(
            F.regexp_extract_all(ln, F.lit(r"(?i)<a\b[^>]*>(.*?)</a>"), F.lit(1)),
            F.lit(0),
            lambda acc, x: acc + F.length(F.regexp_replace(x, r"<[^>]*>", "")),
        )
        link_density = F.when(
            F.length(visible) > 0, anchor_len / F.length(visible)
        ).otherwise(F.lit(1.0))
        return F.struct(
            visible.alias("vis"),
            tag_density.alias("tagd"),
            link_density.alias("linkd"),
        )

    kept = F.filter(
        F.transform(lines, stats),
        lambda s: (F.length(s["vis"]) >= 25)
        & (s["tagd"] < 0.6)
        & (s["linkd"] < 0.34),
    )
    return F.array_join(F.transform(kept, lambda s: s["vis"]), "\n")


def _pdf_main(text: Column) -> Column:
    lines = F.split(F.replace(text, F.lit("\x0c"), F.lit("\n")), "\n")
    lines = F.filter(F.transform(lines, _COLLAPSE), lambda x: x != "")
    kept = F.filter(
        lines,
        lambda ln: ~ln.rlike(r"(?i)^\s*(page\s+)?\d+(\s+of\s+\d+)?\s*$")
        & (F.size(F.filter(lines, lambda x: x == ln)) < 3),
    )
    return F.array_join(kept, "\n")


def _plain_main(text: Column) -> Column:
    lines = F.filter(F.transform(F.split(text, "\n"), _COLLAPSE), lambda x: x != "")
    return F.array_join(lines, "\n")


def main_content_col(text: Column, tool: Column) -> Column:
    """= oracle.boilerplate.main_content dispatch."""
    has_tag = text.contains("<") & text.rlike(r"<[^>]*>")
    return (
        F.when(text.isNull() | (F.length(text) == 0), F.lit(""))
        .when((tool == "web_fetch") | has_tag, _html_main(text))
        .when(tool == "pdf_extract", _pdf_main(text))
        .otherwise(_plain_main(text))
    )


def with_main_content(df: DataFrame) -> DataFrame:
    content = F.when(
        F.col("role") == "tool", main_content_col(F.col("text"), F.col("tool"))
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))
    return df.withColumn("content", content)


# --------------------------------------------------------------------------
# turn-level stages (classification / payee / fields) — all native
# --------------------------------------------------------------------------

def _line_conf(ln: Column) -> Column:
    """= oracle.issuer.line_confidence (0.6 + 0.4 * alpha_ratio)."""
    return F.when(F.length(ln) == 0, F.lit(0.0)).otherwise(
        0.6 + 0.4 * (C.n_alpha(ln) / F.length(ln))
    )


def _nonblank_lines(content: Column) -> Column:
    return F.filter(F.split(content, "\n"), lambda ln: ln.rlike(r"\S"))


def _designation_literal(u: Column) -> Column:
    """Rule-engine designation: literal list scanned in order
    (= oracle.govrules.extract_officer_designation)."""
    chain = None
    for d in vocab.OFFICER_DESIGNATIONS:
        chain = (
            F.when(u.contains(d), F.lit(d))
            if chain is None
            else chain.when(u.contains(d), F.lit(d))
        )
    return chain.otherwise(F.lit(None).cast("string"))


def _is_government_entity(x: Column) -> Column:
    """= oracle.govrules.is_government_entity (null/empty → False)."""
    u = F.upper(F.coalesce(x, F.lit("")))
    words = F.filter(F.split(u, r"\s+"), lambda w: w != "")
    pattern_hit = F.coalesce(
        u.rlike("|".join(f"(?:{p})" for p in vocab.GOVT_PAYEE_PATTERNS)),
        F.lit(False),
    )
    return (F.length(u) > 0) & (
        C.any_term(u, vocab.GOVT_ENTITIES)
        | pattern_hit
        | ((F.size(words) <= 4) & C.any_term(u, vocab.GOVT_INDICATORS))
    )


def _payee_section(u: Column) -> Column:
    """= oracle.grammars.extract_payee_section (first indicator, 200 chars)."""
    chain = None
    for ind in vocab.PAYEE_SECTION_INDICATORS:
        sect = F.substr(u, F.instr(u, ind) + len(ind), F.lit(200))
        chain = (
            F.when(u.contains(ind), sect)
            if chain is None
            else chain.when(u.contains(ind), sect)
        )
    return chain.otherwise(F.lit(None).cast("string"))


def _payable_to_government(u: Column) -> Column:
    section = _payee_section(u)
    return F.when(section.isNotNull(), _is_government_entity(section)).otherwise(
        F.lit(False)
    )


def _payee_raw_col(u: Column) -> Column:
    """= oracle.grammars.extract_payee: 10 ordered patterns, first whose
    candidate is not bank/metadata wins."""
    chain = None
    for p in vocab.PAYEE_PATTERNS:
        cand = _PYSTRIP(F.regexp_extract(u, p, 1))
        ok = u.rlike(p) & ~C.is_bank_or_metadata(cand)
        chain = F.when(ok, cand) if chain is None else chain.when(ok, cand)
    return chain.otherwise(F.lit(None).cast("string"))


def turn_level(df: DataFrame) -> DataFrame:
    """classification + payee + fields + confidence columns (no shuffle)."""
    lines = _nonblank_lines(F.col("content"))
    full_text = F.array_join(lines, " ")
    n_lines = F.size(lines)
    conf_sum = F.aggregate(
        lines, F.lit(0.0), lambda acc, ln: acc + _line_conf(ln)
    )
    df = (
        df.withColumn("lines", lines)
        .withColumn("n_lines", n_lines)
        .withColumn("full_text", full_text)
        .withColumn(
            "confidence",
            F.when(F.col("n_lines") > 0, conf_sum / F.col("n_lines")).otherwise(0.0),
        )
    )

    u = F.upper(F.col("full_text"))
    words_u = F.filter(F.split(u, r"\s+"), lambda w: w != "")

    cat3 = u.contains("GOVERNMENT ACCOUNT") | u.contains("GOVT ACCOUNT")
    cat2 = u.contains("NOT TRANSFERABLE") & C.any_term(
        u, ("GOVT", "GOVERNMENT", "PAO", "DDO")
    )
    cat1 = C.any_term(u, vocab.GOVT_MARKERS_HIGH) | C.any_term(
        u, vocab.GOVT_MARKERS_MEDIUM
    )
    is_dd = C.any_term(u, vocab.DD_MARKERS)
    is_mc = C.any_term(u, vocab.MC_MARKERS)
    crossed = F.coalesce(
        u.rlike("|".join(f"(?:{p})" for p in vocab.CROSSED_PATTERNS)), F.lit(False)
    )
    is_self = u.contains("SELF") & (F.size(words_u) < 15)

    has_text = F.col("n_lines") > 0
    ctype = (
        F.when(~has_text, F.lit(None).cast("string"))
        .when(cat3, "GOVT_GOVT_ACCOUNT")
        .when(cat2, "GOVT_NON_TRANSFERABLE")
        .when(cat1, "GOVT_NEGOTIABLE")
        .when(is_dd, "DEMAND_DRAFT")
        .when(is_mc, "MANAGERS_CHEQUE")
        .when(crossed, "CROSSED")
        .when(is_self, "SELF")
        .otherwise("ORDER")
    )
    df = df.withColumn("cheque_type", ctype)
    df = df.withColumn(
        "is_government",
        F.when(~has_text, F.lit(False)).otherwise(cat3 | cat2 | cat1),
    )
    df = df.withColumn(
        "government_category",
        F.when(~has_text, F.lit(None).cast("string"))
        .when(cat3, "III")
        .when(cat2, "II")
        .when(cat1, "I")
        .otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "payee_rule",
        F.when(~has_text, F.lit(None).cast("string"))
        .when(cat3, "government_account")
        .when(cat2, "government_officer")
        .when(cat1, "government_contractor")
        .when(is_dd, "dd_standard")
        .when(is_mc, "mc_standard")
        .when(crossed, "account_payee")
        .when(is_self, "self")
        .otherwise("standard"),
    )

    payee_raw = F.when(has_text, _payee_raw_col(u)).otherwise(
        F.lit(None).cast("string")
    )
    df = df.withColumn("payee_raw", payee_raw)

    designation = _designation_literal(u)
    payee_raw_u = F.upper(F.coalesce(F.col("payee_raw"), F.lit("")))
    gov_payee = (
        F.when(cat3, F.lit("GOVERNMENT"))
        .when(
            cat2,
            F.when(
                designation.isNotNull(),
                F.concat(F.lit("GOVERNMENT - "), designation),
            )
            .when(
                (F.length(payee_raw_u) > 0)
                & C.any_term(payee_raw_u, vocab.OFFICER_DESIGNATIONS),
                F.concat(F.lit("GOVERNMENT - "), F.col("payee_raw")),
            )
            .otherwise(F.lit("GOVERNMENT OFFICER")),
        )
        .otherwise(  # category I
            F.when(_is_government_entity(F.col("payee_raw")), F.lit("GOVERNMENT"))
            .otherwise(F.coalesce(F.col("payee_raw"), F.lit("XXX")))
        )
    )
    df = df.withColumn(
        "payee_cleaned",
        F.when(~has_text, F.lit("XXX"))
        .when(F.col("is_government"), gov_payee)
        .when(F.col("payee_raw").isNotNull(), C.clean_payee(F.col("payee_raw")))
        .otherwise(F.lit("XXX")),
    )

    ft = F.col("full_text")
    date_pat = r"Date:\s*(\d{2})[./](\d{2})[./](\d{4})"
    df = df.withColumn(
        "field_date",
        F.when(
            has_text & ft.rlike(date_pat),
            F.concat(
                F.regexp_extract(ft, date_pat, 1),
                F.regexp_extract(ft, date_pat, 2),
                F.regexp_extract(ft, date_pat, 3),
            ),
        ),
    )
    amount_pat = r"[₹Rs\.]*\s*([\d,]+(?:\.\d{2})?)[/\-]?"
    df = df.withColumn(
        "field_amount",
        F.when(
            has_text & ft.rlike(amount_pat),
            F.replace(F.regexp_extract(ft, amount_pat, 1), F.lit(","), F.lit("")),
        ),
    )
    account_pat = r"A/C No\.?[\s:]*(\d{10,20})"
    df = df.withColumn(
        "field_account",
        F.when(has_text & ft.rlike(account_pat), F.regexp_extract(ft, account_pat, 1)),
    )
    micr = vocab.MICR_PATTERN
    has_micr = has_text & ft.rlike(micr)
    df = (
        df.withColumn("micr_city", F.when(has_micr, F.regexp_extract(ft, micr, 1)))
        .withColumn("micr_bank", F.when(has_micr, F.regexp_extract(ft, micr, 2)))
        .withColumn("micr_serial", F.when(has_micr, F.regexp_extract(ft, micr, 3)))
    )

    df = df.withColumn("success", has_text)
    df = df.withColumn(
        "error",
        F.when(~has_text, F.lit("No text detected")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    return df


# --------------------------------------------------------------------------
# issuer stage (line relation → candidates → fuzzy → top-1 → gates)
# --------------------------------------------------------------------------

def _line_relation(df: DataFrame) -> DataFrame:
    return df.select(
        *KEYS,
        F.posexplode(F.col("lines")).alias("line_idx", "raw_line"),
    ).withColumn("conf", _line_conf(F.col("raw_line")))


def _for_suffix(text: Column, u: Column, marker: str) -> Column:
    """text[u.find(marker)+len(marker):].strip() — raw-case FOR suffix."""
    return _PYSTRIP(F.substr(text, F.instr(u, marker) + len(marker)))


_MARKER_RX = "FOR |F/O |F/ |PROP "  # raw-scan precondition (any marker)
_FOR_LINE_RX = "FOR |F/O |F/|PROP "  # cleaned-text FOR-branch precondition


def issuer_stage(spark: SparkSession, df_turns: DataFrame, drawer_dict: list[str],
                 threshold: float) -> DataFrame:
    """Per-turn (issuer, issuer_conf) via the V1 path (oracle parity).

    Plan-shape note: the heavy validity predicates are only evaluated behind
    cheap rlike prefilters (marker lines are rare), keeping each generated
    codegen method small — a single projection holding N copies of the
    drawer-validity tree blows janino's method limit and falls back to slow
    interpreted evaluation."""
    lines = _line_relation(df_turns).select(
        *KEYS,
        "line_idx",
        "conf",
        _PYSTRIP(F.col("raw_line")).alias("stext"),
        C.clean_text_v1(_PYSTRIP(F.col("raw_line"))).alias("cleaned"),
    )

    # FOR-scan short-circuit: first marker (list order) whose raw-text suffix
    # passes looks_like_real_name at >= threshold confidence — the reference
    # keeps trying later markers on the same line when one fails
    # (issuer_processor_v.py:474-481). Prefilter: marker presence + threshold.
    u_raw = F.upper(F.col("stext"))
    scan_base = lines.filter(
        u_raw.rlike(_MARKER_RX) & (F.col("conf") >= threshold)
    )
    scan_cand = None
    for m in vocab.FOR_MARKERS:
        cand = _for_suffix(F.col("stext"), u_raw, m)
        ok = u_raw.contains(m) & C.looks_like_real_name(cand)
        scan_cand = F.when(ok, cand) if scan_cand is None else scan_cand.when(ok, cand)
    scan_cand = scan_cand.otherwise(F.lit(None).cast("string"))
    scan_hits = (
        scan_base.select(*KEYS, "line_idx", "conf", scan_cand.alias("scan_cand"))
        .filter(F.col("scan_cand").isNotNull())
        .groupBy(*KEYS)
        .agg(
            F.min_by(
                F.struct(
                    F.col("scan_cand").alias("name"), F.col("conf").alias("conf")
                ),
                F.col("line_idx"),
            ).alias("scan_hit")
        )
    )

    # FOR-branch candidates (cleaned text): rare lines, prefiltered.
    is_for_line = F.col("cleaned").rlike(_FOR_LINE_RX)
    for_cand = None
    for m in vocab.FOR_MARKERS:
        pot = _PYSTRIP(F.substr(F.col("cleaned"), F.instr(F.col("cleaned"), m) + len(m)))
        ok = F.col("cleaned").contains(m) & C.is_valid_drawer_v1(pot)
        for_cand = F.when(ok, pot) if for_cand is None else for_cand.when(ok, pot)
    for_cand = for_cand.otherwise(F.lit(None).cast("string"))
    for_lines = (
        lines.filter(is_for_line)
        .select(*KEYS, "line_idx", "conf", for_cand.alias("cand"))
        .filter(F.col("cand").isNotNull())
        .withColumn("is_for", F.lit(True))
    )

    # Normal candidates: one validity evaluation per line.
    normal_lines = (
        lines.filter(~is_for_line)
        .filter(C.is_valid_drawer_v1(F.col("cleaned")))
        .select(*KEYS, "line_idx", "conf", F.col("cleaned").alias("cand"))
        .withColumn("is_for", F.lit(False))
    )

    cand_lines = for_lines.unionByName(normal_lines)

    # Fuzzy dictionary match over DISTINCT normal candidates (J6 memoization).
    normal_cands = normal_lines.select(F.col("cand").alias("cand_text"))
    fuzzy = X.fuzzy_match_candidates(spark, normal_cands, drawer_dict)
    cand_lines = cand_lines.join(
        F.broadcast(fuzzy),
        (cand_lines["cand"] == fuzzy["cand_text"]) & ~cand_lines["is_for"],
        "left",
    ).drop("cand_text")

    matched = F.col("matched_name")
    final_text = F.when(F.col("is_for"), F.col("cand")).otherwise(
        F.coalesce(matched, F.col("cand"))
    )
    words = F.filter(F.split(final_text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    wc_boost = F.when((n_words >= 2) & (n_words <= 4), F.lit(0.15)).otherwise(0.0)
    common_boost = 0.1 * C.common_name_part_count(words)
    susp = C.any_term(final_text, vocab.SUSPICIOUS_SCORE_TERMS)
    match_boost = F.when(
        matched.isNotNull(), 0.20 + (0.25 * F.col("similarity"))
    ).otherwise(0.0)
    # Same left-assoc float order as the oracle: conf+match, +wc, +common, -susp
    normal_score = (
        (((F.col("conf") + match_boost) + wc_boost) + common_boost)
        - F.when(susp, 0.40).otherwise(0.0)
    )
    score = F.when(F.col("is_for"), F.col("conf") + 0.3).otherwise(normal_score)

    cand_lines = cand_lines.withColumn("final_text", final_text).withColumn(
        "score", score
    )

    # Stable top-1: max score, ties broken by earliest line (stable-sort parity).
    top1 = cand_lines.groupBy(*KEYS).agg(
        F.max_by(
            F.struct(
                F.col("final_text").alias("name"), F.col("conf").alias("conf")
            ),
            F.struct(
                F.col("score").alias("score"),
                (-F.col("line_idx")).alias("neg_idx"),
            ),
        ).alias("top1")
    )

    per_turn = scan_hits.join(top1, KEYS, "full")

    xxx = F.struct(F.lit("XXX").alias("name"), F.lit(0.0).alias("conf"))
    best_text = F.col("top1.name")
    best_conf = F.col("top1.conf")
    gated = (
        F.when(F.col("scan_hit").isNotNull(), F.col("scan_hit"))
        .when(F.col("top1").isNull(), xxx)
        .when(best_conf < threshold, xxx)
        .when(~C.looks_like_real_name(best_text), xxx)
        .otherwise(F.struct(best_text.alias("name"), best_conf.alias("conf")))
    )
    return per_turn.select(
        *KEYS,
        gated.getField("name").alias("issuer"),
        gated.getField("conf").alias("issuer_conf"),
    )


# --------------------------------------------------------------------------
# full pipeline
# --------------------------------------------------------------------------

RESULT_COLUMNS = [
    "conv_id", "turn_idx", "main_text", "success", "error", "cheque_type",
    "is_government", "government_category", "payee_rule", "payee_raw",
    "payee_cleaned", "issuer", "issuer_conf", "confidence", "field_date",
    "field_amount", "field_account", "micr_city", "micr_bank", "micr_serial",
    "status", "opr_no", "file_mark",
]


def salted_repartition(df: DataFrame, num_partitions: int | None = None,
                       salt_buckets: int = 64) -> DataFrame:
    """Salted-hash repartition on conv_id: (conv_id, turn_idx % buckets).

    Long agent sessions (heavy-tailed conv sizes) split across up to
    ``salt_buckets`` tasks instead of pinning one; extraction is per-turn
    stateless so correctness is unaffected (SURVEY.md §4 item 1)."""
    salt = F.pmod(F.coalesce(F.col("turn_idx"), F.lit(0)), F.lit(salt_buckets))
    if num_partitions:
        return df.repartition(num_partitions, F.col("conv_id"), salt)
    return df.repartition(F.col("conv_id"), salt)


def extract_pipeline(spark: SparkSession, transcripts: DataFrame,
                     drawer_dict: list[str],
                     threshold: float = oracle_issuer.DEFAULT_THRESHOLD_V1,
                     salt_buckets: int | None = None,
                     engine: str = "arrow") -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → extraction
    records (RESULT_COLUMNS), one row per turn.

    engine='arrow' (default): the Arrow-batched oracle UDF — one mapInPandas
    pass, zero shuffles, per-worker compiled grammars + fuzzy memo cache.
    Measured ~10-30x faster than engine='native' on this workload: ~150
    regex/string ops per turn exceed what Catalyst can keep inside
    whole-stage codegen (the fused projection blows janino's 64KB method
    limit and falls back to interpreted eval), while CPython evaluates the
    same grammars via precompiled `re` at C speed. This is also the
    north-star shape: extraction logic in vectorized Arrow UDFs.

    engine='native': the fully-decomposed Catalyst plan (explode → native
    predicates → distinct-candidate fuzzy join → max_by top-1). Kept as the
    declarative reference implementation — proven bit-equal in tests — and
    for plans where Catalyst optimizations (pushdown into the candidate
    relation, AQE) matter more than raw expression throughput.

    Both engines are tested for per-turn equality against the pure-Python
    oracle (tests/test_pipeline_equality.py).
    """
    if salt_buckets:
        transcripts = salted_repartition(transcripts, salt_buckets=salt_buckets)
    if engine == "arrow":
        return X.extract_turns_udf(spark, transcripts, drawer_dict, threshold)
    turns = turn_level(with_main_content(transcripts))
    issuer = issuer_stage(spark, turns, drawer_dict, threshold)
    out = turns.join(issuer, KEYS, "left")
    out = (
        out.withColumn("issuer", F.coalesce(F.col("issuer"), F.lit("XXX")))
        .withColumn("issuer_conf", F.coalesce(F.col("issuer_conf"), F.lit(0.0)))
        .withColumn(
            "status",
            F.when(F.col("issuer") != "XXX", F.lit("AUTO-UPDATED")).otherwise(
                F.lit("REJECTED")
            ),
        )
        .withColumn("opr_no", F.lit(vocab.FIXED_OPR_NO))
        .withColumn("file_mark", F.lit(vocab.FIXED_FILE_MARK))
        .withColumn("main_text", F.col("content"))
    )
    return out.select(*RESULT_COLUMNS)


def ordered(df: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering via window-over-partition sort —
    row_number per conversation, NOT a global orderBy (north rule W3)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))
