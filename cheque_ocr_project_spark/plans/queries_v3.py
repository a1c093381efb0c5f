"""Driver-contract queries, batch 2: V3-variant operators + remaining
reference grammars (SURVEY.md §2: P2/P4/P7, F6-F8, F14, F17, K2, A1, W3,
C3-C5, and the simple issuer extractor from parallel_processor.py).

Same contract as plans/queries.py: Spark DataFrame query + DuckDB oracle
SQL generated from the shared vocab, identical aliases both sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cheque_ocr_project_spark.functions import columns as C
from cheque_ocr_project_spark.functions import ducksql as D
from cheque_ocr_project_spark.oracle import vocab


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# P2: clean_text v3
# ---------------------------------------------------------------------------

def q_clean_text_v3(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", C.clean_text_v3(F.col("text")).alias("cleaned_v3")
    )


def sql_clean_text_v3():
    s = "replace(translate(upper(text), '|!015', 'IIOIS'), '8', 'B')"
    s = D.rr(s, r"[^A-Za-z0-9 ,.&/-]", " ")
    s = D.collapse_ws(s)
    return (
        f"SELECT doc_id, CASE WHEN text IS NULL OR length(text) = 0 THEN '' "
        f"ELSE {s} END AS cleaned_v3 FROM documents"
    )


# ---------------------------------------------------------------------------
# P4/P7: V3 junk + business-name validity (60% / 50% / 70% coverage rules)
# ---------------------------------------------------------------------------

def _junk_v3_col(u: Column) -> Column:
    short_caps = u.rlike(r"^[A-Z]{2,4}$") & ~u.isin(*vocab.SHORT_CAPS_OK_V3)
    pattern_hits = [
        (F.length(F.regexp_extract(u, f"(?i){p}", 0)) >= F.length(u) * 0.6)
        & u.rlike(f"(?i){p}")
        for p in vocab.JUNK_PATTERNS_V3
    ]
    variation_hits = [
        u.contains(j) & (F.lit(len(j)) >= F.length(u) * 0.5)
        for j in vocab.JUNK_VARIATIONS_V3
    ]
    return (
        u.isNull()
        | (F.length(u) < 2)
        | short_caps
        | reduce(lambda a, b: a | b, pattern_hits)
        | reduce(lambda a, b: a | b, variation_hits)
    )


def _junk_v3_sql(u: str) -> str:
    caps_ok = ", ".join(D.q(t) for t in vocab.SHORT_CAPS_OK_V3)
    short_caps = (
        f"(regexp_matches({u}, '^[A-Z]{{2,4}}$') AND {u} NOT IN ({caps_ok}))"
    )
    pats = " OR ".join(
        f"(regexp_matches({u}, {D.rx(p)}, 'i') AND "
        f"length(regexp_extract({u}, {D.rx(p)}, 0, 'i')) >= length({u}) * 0.6)"
        for p in vocab.JUNK_PATTERNS_V3
    )
    variations = " OR ".join(
        f"(contains({u}, {D.q(j)}) AND {len(j)} >= length({u}) * 0.5)"
        for j in vocab.JUNK_VARIATIONS_V3
    )
    return (
        f"({u} IS NULL OR length({u}) < 2 OR {short_caps} OR {pats} "
        f"OR {variations})"
    )


def _valid_business_v3_col(t: Column) -> Column:
    u = F.upper(t)
    bank_hit = reduce(
        lambda a, b: a | b,
        [
            u.contains(bank) & (F.lit(len(bank)) >= F.length(u) * 0.7)
            for bank in vocab.BANK_NAMES_V3
        ],
    )
    alpha = C.n_alpha(t)
    digits = C.n_digit(t)
    total = F.length(t)
    pure_number_ok = F.length(t) >= 8
    mixed_reject = (
        (F.try_divide(alpha, total) < 0.3) & (total > 5) & ~(digits > 5)
    )
    return (
        t.isNotNull()
        & (F.length(t) >= 3)
        & ~_junk_v3_col(u)
        & ~bank_hit
        & F.when((digits > 0) & (alpha == 0), pure_number_ok).otherwise(
            ~F.when(alpha > 0, mixed_reject).otherwise(F.lit(False))
        )
    )


def q_junk_v3(spark, sf_dir):
    u = F.upper(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        _junk_v3_col(u).alias("is_junk_v3"),
        _valid_business_v3_col(F.upper(F.col("text"))).alias("is_valid_business_v3"),
    )


def sql_junk_v3():
    u = "upper(text)"
    caps_ok = ", ".join(D.q(t) for t in vocab.BANK_NAMES_V3)
    bank_hit = " OR ".join(
        f"(contains({u}, {D.q(b)}) AND {len(b)} >= length({u}) * 0.7)"
        for b in vocab.BANK_NAMES_V3
    )
    alpha = D.n_alpha_sql(u)
    digits = D.n_digit_sql(u)
    total = f"length({u})"
    valid = f"""({u} IS NOT NULL AND length({u}) >= 3
      AND NOT {_junk_v3_sql(u)}
      AND NOT ({bank_hit})
      AND (CASE WHEN {digits} > 0 AND {alpha} = 0 THEN length({u}) >= 8
           ELSE NOT (CASE WHEN {alpha} > 0
                     THEN ({alpha} * 1.0 / {total} < 0.3 AND {total} > 5
                           AND NOT ({digits} > 5))
                     ELSE FALSE END) END))"""
    return f"""
SELECT doc_id, {_junk_v3_sql(u)} AS is_junk_v3, {valid} AS is_valid_business_v3
FROM documents"""


# ---------------------------------------------------------------------------
# F14: prefix removal (V3)
# ---------------------------------------------------------------------------

def q_remove_prefixes(spark, sf_dir):
    cand = F.upper(F.substring(F.col("text"), 1, 60))
    return _docs(spark, sf_dir).select(
        "doc_id", C.remove_prefixes_v3(cand).alias("deprefixed")
    )


def sql_remove_prefixes():
    s = "upper(text[1:60])"
    s = D.chain_regex_strip_sql(s, vocab.PREFIX_PATTERNS_V3)
    return f"SELECT doc_id, trim({s}) AS deprefixed FROM documents"


# ---------------------------------------------------------------------------
# F6: issuer FOR grammar (stage 1 of dbf_processor.extract_issuer_from_text)
# ---------------------------------------------------------------------------

def q_issuer_for_grammar(spark, sf_dir):
    u = F.upper(F.col("text"))
    cand = F.trim(F.substr(u, F.instr(u, "FOR") + 3))
    for marker in vocab.AI_END_MARKERS:
        cand = F.when(
            cand.contains(marker), F.substring_index(cand, marker, 1)
        ).otherwise(cand)
    cand = F.substring_index(cand, "\n", 1)
    out = F.when(u.contains("FOR") & (F.length(cand) > 3), cand)
    return _docs(spark, sf_dir).select("doc_id", out.alias("for_candidate"))


def sql_issuer_for_grammar():
    cand = "trim(substr(upper(text), strpos(upper(text), 'FOR') + 3, 1000000))"
    for marker in vocab.AI_END_MARKERS:
        cand = (
            f"CASE WHEN contains({cand}, {D.q(marker)}) "
            f"THEN split_part({cand}, {D.q(marker)}, 1) ELSE {cand} END"
        )
    cand = f"split_part({cand}, chr(10), 1)"
    return f"""
SELECT doc_id,
  CASE WHEN contains(upper(text), 'FOR') AND length({cand}) > 3
       THEN {cand} END AS for_candidate
FROM documents"""


# ---------------------------------------------------------------------------
# F7/F8: before-signature / before-account grammars (first match in order)
# ---------------------------------------------------------------------------

def q_issuer_auth_account_grammar(spark, sf_dir):
    u = F.upper(F.col("text"))

    def first_match(patterns):
        chain = None
        for p in patterns:
            hit = F.when(u.rlike(p), F.trim(F.regexp_extract(u, p, 1)))
            chain = hit if chain is None else chain.when(
                u.rlike(p), F.trim(F.regexp_extract(u, p, 1))
            )
        return chain.otherwise(F.lit(None).cast("string"))

    return _docs(spark, sf_dir).select(
        "doc_id",
        first_match(vocab.AUTH_SIGNATORY_PATTERNS).alias("before_signatory"),
        first_match(vocab.ACCOUNT_PATTERNS).alias("before_account"),
    )


def sql_issuer_auth_account_grammar():
    u = "upper(text)"

    def first_match(patterns):
        whens = " ".join(
            f"WHEN regexp_matches({u}, {D.rx(p)}) "
            f"THEN trim(regexp_extract({u}, {D.rx(p)}, 1))"
            for p in patterns
        )
        return f"CASE {whens} ELSE NULL END"

    return f"""
SELECT doc_id,
  {first_match(vocab.AUTH_SIGNATORY_PATTERNS)} AS before_signatory,
  {first_match(vocab.ACCOUNT_PATTERNS)} AS before_account
FROM documents"""


# ---------------------------------------------------------------------------
# parallel_processor.py:46-106 — simple issuer extractor (UPPER form)
# ---------------------------------------------------------------------------

def q_issuer_simple(spark, sf_dir):
    u = F.upper(F.col("text"))
    bank = None
    for b in vocab.SIMPLE_BANK_NAMES:
        bank = (
            F.when(u.contains(b), F.lit(b))
            if bank is None
            else bank.when(u.contains(b), F.lit(b))
        )
    bank = bank.otherwise(F.lit(None).cast("string"))

    cand = F.trim(F.element_at(F.split(u, "FOR"), -1))
    for delim in vocab.SIMPLE_FOR_DELIMITERS:
        cand = F.when(
            cand.contains(delim), F.substring_index(cand, delim, 1)
        ).otherwise(cand)
    words = F.filter(F.split(cand, r"\s+"), lambda w: w != "")
    joined = F.array_join(words, " ")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(joined, r"[^\w\s]", " "), r"\s+", " ")
    )
    for_result = F.when(
        u.contains("FOR")
        & (F.size(words) >= 1) & (F.size(words) <= 5)
        & (F.length(cleaned) >= 5),
        cleaned,
    )

    out = (
        F.when(F.length(F.coalesce(F.col("text"), F.lit(""))) < 20, "UNKNOWN")
        .when(bank.isNotNull(), bank)
        .when(for_result.isNotNull(), for_result)
        .otherwise("UNKNOWN")
    )
    return _docs(spark, sf_dir).select("doc_id", out.alias("issuer_simple"))


def sql_issuer_simple():
    u = "upper(text)"
    bank_whens = " ".join(
        f"WHEN contains({u}, {D.q(b)}) THEN {D.q(b)}"
        for b in vocab.SIMPLE_BANK_NAMES
    )
    bank = f"CASE {bank_whens} ELSE NULL END"

    cand = f"trim(string_split({u}, 'FOR')[-1])"
    for delim in vocab.SIMPLE_FOR_DELIMITERS:
        d = D.q(delim) if delim != "\n" else "chr(10)"
        cand = (
            f"CASE WHEN contains({cand}, {d}) "
            f"THEN split_part({cand}, {d}, 1) ELSE {cand} END"
        )
    words = f"regexp_extract_all({cand}, '\\S+')"
    joined = f"array_to_string({words}, ' ')"
    cleaned = D.collapse_ws(D.rr(joined, r"[^\w\s]", " "))
    for_result = (
        f"CASE WHEN contains({u}, 'FOR') AND len({words}) BETWEEN 1 AND 5 "
        f"AND length({cleaned}) >= 5 THEN {cleaned} END"
    )
    return f"""
SELECT doc_id,
  CASE WHEN length(coalesce(text, '')) < 20 THEN 'UNKNOWN'
       WHEN {bank} IS NOT NULL THEN {bank}
       WHEN {for_result} IS NOT NULL THEN {for_result}
       ELSE 'UNKNOWN' END AS issuer_simple
FROM documents"""


# ---------------------------------------------------------------------------
# K2: score_name
# ---------------------------------------------------------------------------

def q_score_name(spark, sf_dir):
    cand = F.substring(F.col("text"), 1, 40)
    return _docs(spark, sf_dir).select(
        "doc_id", F.round(C.score_name(cand), 6).alias("name_score")
    )


def sql_score_name():
    t = "text[1:40]"
    words = f"regexp_extract_all({t}, '\\S+')"
    n = f"len({words})"
    all_alpha = (
        f"(len(list_filter({words}, w -> NOT regexp_matches(w, '^[A-Za-z]+$'))) = 0)"
    )
    common_list = ", ".join(D.q(w) for w in sorted(vocab.COMMON_NAME_PARTS))
    common = f"len(list_filter({words}, w -> upper(w) IN ({common_list})))"
    score = (
        f"(CASE WHEN {n} BETWEEN 2 AND 5 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN {all_alpha} THEN 0.3 ELSE 0.0 END"
        f" + 0.2 * {common})"
    )
    return f"SELECT doc_id, round(least({score}, 1.0), 6) AS name_score FROM documents"


# ---------------------------------------------------------------------------
# C3/C4/C5: government payee rule over documents
# ---------------------------------------------------------------------------

def _is_govt_entity_sql(x: str) -> str:
    u = f"upper(coalesce({x}, ''))"
    entities = D.any_term_sql(u, vocab.GOVT_ENTITIES)
    pats = f"regexp_matches({u}, {D.rx('|'.join(f'(?:{p})' for p in vocab.GOVT_PAYEE_PATTERNS))})"
    words = f"len(regexp_extract_all({u}, '\\S+'))"
    indicators = D.any_term_sql(u, vocab.GOVT_INDICATORS)
    return (
        f"(length({u}) > 0 AND ({entities} OR {pats} "
        f"OR ({words} <= 4 AND {indicators})))"
    )


def q_govt_entity(spark, sf_dir):
    from cheque_ocr_project_spark.plans.pipeline import (
        _is_government_entity,
        _payable_to_government,
        _payee_section,
    )

    cand = F.substring(F.col("text"), 1, 60)
    u = F.upper(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        _is_government_entity(cand).alias("is_govt_entity"),
        _payable_to_government(u).alias("payable_to_govt"),
        _payee_section(u).alias("payee_section"),
    )


def sql_govt_entity():
    section = None
    u = "upper(text)"
    whens = []
    for ind in vocab.PAYEE_SECTION_INDICATORS:
        expr = f"substr({u}, strpos({u}, {D.q(ind)}) + {len(ind)}, 200)"
        whens.append(f"WHEN contains({u}, {D.q(ind)}) THEN {expr}")
    section = "CASE " + " ".join(whens) + " ELSE NULL END"
    payable = (
        f"CASE WHEN {section} IS NOT NULL THEN {_is_govt_entity_sql(section)} "
        "ELSE FALSE END"
    )
    return f"""
SELECT doc_id,
  {_is_govt_entity_sql("text[1:60]")} AS is_govt_entity,
  {payable} AS payable_to_govt,
  {section} AS payee_section
FROM documents"""


def q_officer_designation(spark, sf_dir):
    from cheque_ocr_project_spark.plans.pipeline import _designation_literal

    u = F.upper(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id", _designation_literal(u).alias("designation")
    )


def sql_officer_designation():
    u = "upper(text)"
    whens = " ".join(
        f"WHEN contains({u}, {D.q(d)}) THEN {D.q(d)}"
        for d in vocab.OFFICER_DESIGNATIONS
    )
    return f"SELECT doc_id, CASE {whens} ELSE NULL END AS designation FROM documents"


# ---------------------------------------------------------------------------
# F17: filename-derived fields (custom_csv.py:24-46)
# ---------------------------------------------------------------------------

def q_filename_fields(spark, sf_dir):
    fname = F.concat(
        F.lit("P_"), F.col("doc_id").cast("string"), F.lit("_"),
        F.col("n_chars").cast("string"), F.lit(".50.tif"),
    )
    amount = F.when(
        fname.rlike(r"(\d+\.\d{2})"), F.regexp_extract(fname, r"(\d+\.\d{2})", 1)
    ).otherwise("0.00")
    account = F.when(
        fname.rlike(r"\d+"), F.regexp_extract(fname, r"(\d+)", 1)
    ).otherwise("0")
    date = F.when(fname.rlike(r"(\d{8})"), F.regexp_extract(fname, r"(\d{8})", 1))
    return _docs(spark, sf_dir).select(
        "doc_id", fname.alias("filename"),
        amount.alias("amount"), account.alias("account"), date.alias("file_date"),
    )


def sql_filename_fields():
    fname = "'P_' || CAST(doc_id AS VARCHAR) || '_' || CAST(n_chars AS VARCHAR) || '.50.tif'"
    return f"""
SELECT doc_id, {fname} AS filename,
  CASE WHEN regexp_matches({fname}, '(\\d+\\.\\d{{2}})')
       THEN regexp_extract({fname}, '(\\d+\\.\\d{{2}})', 1) ELSE '0.00' END AS amount,
  CASE WHEN regexp_matches({fname}, '\\d+')
       THEN regexp_extract({fname}, '(\\d+)', 1) ELSE '0' END AS account,
  CASE WHEN regexp_matches({fname}, '(\\d{{8}})')
       THEN regexp_extract({fname}, '(\\d{{8}})', 1) END AS file_date
FROM documents"""


# ---------------------------------------------------------------------------
# A1/W3: line-confidence aggregate + window ordering
# ---------------------------------------------------------------------------

def q_line_confidence(spark, sf_dir):
    t = F.col("text")
    conf = F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        0.6 + 0.4 * (C.n_alpha(t) / F.length(t))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.round(conf, 6).alias("line_conf")
    )


def sql_line_confidence():
    alpha = D.n_alpha_sql("text")
    return f"""
SELECT doc_id,
  round(CASE WHEN length(text) = 0 THEN 0.0
        ELSE 0.6 + 0.4 * ({alpha} * 1.0 / length(text)) END, 6) AS line_conf
FROM documents"""


def q_window_order(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    return _docs(spark, sf_dir).select(
        "doc_id", "source", F.row_number().over(w).alias("turn_rank")
    )


def sql_window_order():
    return """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS turn_rank
FROM documents"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY_V3: dict[str, tuple] = {
    "clean_text_v3": (q_clean_text_v3, sql_clean_text_v3),
    "junk_v3": (q_junk_v3, sql_junk_v3),
    "remove_prefixes": (q_remove_prefixes, sql_remove_prefixes),
    "issuer_for_grammar": (q_issuer_for_grammar, sql_issuer_for_grammar),
    "issuer_auth_account_grammar": (
        q_issuer_auth_account_grammar, sql_issuer_auth_account_grammar,
    ),
    "issuer_simple": (q_issuer_simple, sql_issuer_simple),
    "score_name": (q_score_name, sql_score_name),
    "govt_entity": (q_govt_entity, sql_govt_entity),
    "officer_designation": (q_officer_designation, sql_officer_designation),
    "filename_fields": (q_filename_fields, sql_filename_fields),
    "line_confidence": (q_line_confidence, sql_line_confidence),
    "window_order": (q_window_order, sql_window_order),
}
