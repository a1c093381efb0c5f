"""DuckDB oracle-SQL fragment generators.

The driver verifies every ``queries()`` entry against DuckDB running
``oracle_sql()`` on the same parquet. These helpers render the *same* vocab
lists used by the Spark Column builders into DuckDB SQL (RE2 regex dialect,
explicit 'g' flag for global replace), so both sides share one source of
truth for every grammar.
"""

from __future__ import annotations

import re as _re

from cheque_ocr_project_spark.oracle import vocab


def q(s: str) -> str:
    """Quote a SQL string literal (single-quote doubling)."""
    return "'" + s.replace("'", "''") + "'"


def rx(pat: str) -> str:
    """Quote a regex for DuckDB (RE2; backslashes literal in SQL strings)."""
    return q(pat)


def esc_term(t: str) -> str:
    return _re.escape(t)


def any_term_sql(expr: str, terms) -> str:
    pat = "|".join(esc_term(t) for t in terms)
    return f"regexp_matches({expr}, {rx(pat)})"


def rr(expr: str, pat: str, repl: str) -> str:
    return f"regexp_replace({expr}, {rx(pat)}, {q(repl)}, 'g')"


def collapse_ws(expr: str) -> str:
    inner = rr(expr, r"\s+", " ")
    return f"trim({inner})"


def clean_text_v1_sql(col: str) -> str:
    s = f"translate(upper({col}), '01|5', 'OIIS')"
    s = rr(s, r"[^A-Z0-9 .,&/-]", " ")
    s = collapse_ws(s)
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN 'XXX' ELSE {s} END"
    )


def n_alpha_sql(col: str) -> str:
    return f"length({rr(col, '[^A-Za-z]', '')})"


def n_digit_sql(col: str) -> str:
    return f"length({rr(col, '[^0-9]', '')})"


def is_garbage_sql(col: str) -> str:
    alpha = n_alpha_sql(col)
    digit = n_digit_sql(col)
    pats = "|".join(
        f"(?:{p})"
        for p in (
            r"O{4,}|I{4,}|Z{4,}",
            r"^[OIZ]{5,}$",
            r"^[A-Z][OIZ]{4,}$",
            r"[OIZ]{5,}",
            r"^[A-Z]{1,2}$",
            r"^[A-Z][\s]*[A-Z]$",
        )
    )
    return (
        f"({col} IS NULL OR length({col}) = 0 OR {alpha} < 3 "
        f"OR {digit} > {alpha} OR regexp_matches({col}, {rx(pats)}))"
    )


def is_junk_v1_sql(col: str) -> str:
    u = f"upper({col})"
    return (
        f"({col} IS NULL OR length({col}) < 3 "
        f"OR {any_term_sql(u, sorted(vocab.JUNK_TERMS_V1))} "
        f"OR {any_term_sql(u, ('SIGN', 'SGN', 'BEARER', 'ORDER'))})"
    )


def chain_replace_sql(expr: str, pairs) -> str:
    """Ordered literal replace chain (DuckDB replace())."""
    s = expr
    for wrong, right in pairs:
        s = f"replace({s}, {q(wrong)}, {q(right)})"
    return s


def chain_regex_strip_sql(expr: str, patterns, flags: str = "gi") -> str:
    s = expr
    for p in patterns:
        s = f"regexp_replace({s}, {rx(p)}, '', '{flags}')"
    return s


def pystrip_sql(expr: str) -> str:
    """Python str.strip(): ALL whitespace (DuckDB trim strips spaces only)."""
    return f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"


def clean_payee_sql(col: str) -> str:
    """= oracle.cleaning.clean_payee rendered for DuckDB."""
    s = pystrip_sql(f"upper({col})")
    s = chain_regex_strip_sql(s, vocab.TITLE_PATTERNS)
    s = chain_replace_sql(s, vocab.SPECIAL_CHAR_MAP)
    s = chain_regex_strip_sql(s, vocab.COMPANY_SUFFIX_PATTERNS)
    s = collapse_ws(s)
    # \w == [0-9A-Za-z_] in both dialects for ASCII input
    s = rr(s, r"[^\w\s\.\-]", "")
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 OR length({s}) < 2 "
        f"THEN 'XXX' ELSE {s} END"
    )


def correct_spelling_sql(col: str) -> str:
    """= oracle.cleaning.correct_spelling_ai for DuckDB (initcap-free:
    DuckDB lacks initcap, so queries compare the UPPER form — the Spark
    query must upper() its result to match)."""
    s = f"upper({col})"
    s = chain_replace_sql(s, vocab.SPELLING_CORRECTIONS)
    s = chain_replace_sql(s, [(w, "") for w in vocab.GARBAGE_WORDS])
    s = collapse_ws(s)
    s = rr(s, r"[^A-Z\s]", "")
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN 'UNKNOWN' "
        f"WHEN length({s}) >= 3 THEN {s} ELSE 'UNKNOWN' END"
    )
