"""Native Spark Column builders mirroring the oracle stages.

Everything here compiles to JVM-side Catalyst expressions (whole-stage
codegen; no Python in the hot path). Each builder cites the oracle function
it must equal; tests assert bit-equality on the synthetic fixture.

Regex-dialect note (SURVEY.md §7.4): the reference grammars are Python `re`;
these builders re-express them in Java regex. The equality tests are the
proof of parity — any grammar that cannot be proven equal stays in the
Arrow-batched UDF path instead (currently only difflib fuzzy matching).
"""

from __future__ import annotations

import re as _re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from cheque_ocr_project_spark.oracle import vocab

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def esc(literal: str) -> str:
    """Escape a literal for use inside a Java regex (re.escape output is
    Java-compatible: backslash before punctuation only)."""
    return _re.escape(literal)


def any_term(col: Column, terms) -> Column:
    """True iff any literal term is a substring of col (null-safe False).

    OR-of-contains, not a regex alternation: UTF8String.contains is ~3-4x
    faster than java.util.regex literal alternations and scales linearly in
    term count (measured on 50k x 400-char rows: 90-term rlike 7.6s vs
    contains chain 2.4s)."""
    hit = reduce(lambda a, b: a | b, [col.contains(t) for t in terms])
    return F.coalesce(hit, F.lit(False))


def count_matching(col: Column, char_class: str) -> Column:
    """Number of characters of col matching the class (0 for null)."""
    return F.length(F.regexp_replace(F.coalesce(col, F.lit("")), f"[^{char_class}]", ""))


# java.util.regex perf cliff (measured, PLANS.md round 3): scanning a negated
# class with 3+ components ([^A-Z0-9 ]) costs ~40x a 1-2 range class — even
# with ZERO matches — so hot-path char counting goes through translate()
# (constant char table, no regex) and hot-path class replaces are guarded by
# a translate-based dirty check. Bit-identical: translate deletes exactly the
# listed chars.
_ALPHA_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_DIGIT_CHARS = "0123456789"
# the literal char set of the class [\w\s.\-] (Java \w and \s are ASCII)
_WORDISH_CHARS = _ALPHA_CHARS + _DIGIT_CHARS + "_ \t\n\x0b\f\r.-"


def count_chars(col: Column, chars: str) -> Column:
    """Number of characters of col in the literal char set (0 for null) —
    translate-based fast path equal to count_matching for literal sets."""
    c = F.coalesce(col, F.lit(""))
    return F.length(c) - F.length(F.translate(c, chars, ""))


def replace_not_in(col: Column, chars: str, char_class: str,
                   replacement: str) -> Column:
    """= regexp_replace(col, '[^<char_class>]', replacement), with the regex
    run only on rows that actually contain an out-of-set char (translate
    dirty check; most cleaned OCR rows are already in-set)."""
    dirty = F.length(F.translate(col, chars, "")) > 0
    return F.when(
        dirty, F.regexp_replace(col, f"[^{char_class}]", replacement)
    ).otherwise(col)


def n_alpha(col: Column) -> Column:
    return count_chars(col, _ALPHA_CHARS)


def n_digit(col: Column) -> Column:
    return count_chars(col, _DIGIT_CHARS)


# --------------------------------------------------------------------------
# cleaning  (oracle.cleaning)
# --------------------------------------------------------------------------

def clean_text_v1(col: Column) -> Column:
    """= oracle.cleaning.clean_text_v1 (issuer_processor_v.py:208-218)."""
    s = F.upper(col)
    s = F.translate(s, "01|5", "OIIS")
    s = replace_not_in(s, "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,&/-",
                       "A-Z0-9 .,&/-", " ")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return F.when(col.isNull() | (F.length(col) == 0), F.lit("XXX")).otherwise(s)


def clean_text_v3(col: Column) -> Column:
    """= oracle.cleaning.clean_text_v3."""
    s = F.upper(col)
    s = F.translate(s, "|!015", "IIOIS")
    s = F.replace(s, F.lit("8"), F.lit("B"))
    s = replace_not_in(s, _ALPHA_CHARS + "0123456789 ,.&/-",
                       "A-Za-z0-9 ,.&/-", " ")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return F.when(col.isNull() | (F.length(col) == 0), F.lit("")).otherwise(s)


def _chain_regex_strip(col: Column, patterns) -> Column:
    return reduce(lambda c, p: F.regexp_replace(c, f"(?i){p}", ""), patterns, col)


def remove_prefixes_v3(col: Column) -> Column:
    """= oracle.cleaning.remove_prefixes_v3 (ordered anchored strips)."""
    s = _chain_regex_strip(F.upper(col), vocab.PREFIX_PATTERNS_V3)
    return F.when(col.isNull(), col).otherwise(pystrip(s))


def pystrip(col: Column) -> Column:
    """Python str.strip(): ALL whitespace (Spark trim strips spaces only)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _guarded_chain_strip(col: Column, patterns) -> Column:
    """The ordered strip chain behind a one-scan combined-alternation
    guard (r08, mirrors oracle.cleaning's guard): when NO pattern matches
    the CURRENT string every sub in the chain is a no-op, so skipping the
    whole chain is exact — one regex scan instead of len(patterns) for
    the common no-match row. CASE branches are lazy in codegen and the
    double reference to ``col`` is CSE'd within the projection."""
    any_rx = "(?i)" + "|".join(f"(?:{p})" for p in patterns)
    return F.when(col.rlike(any_rx),
                  _chain_regex_strip(col, patterns)).otherwise(col)


def clean_payee(col: Column) -> Column:
    """= oracle.cleaning.clean_payee (ordered title/special/suffix chain)."""
    s = pystrip(F.upper(col))
    s = _guarded_chain_strip(s, vocab.TITLE_PATTERNS)
    for ch, repl in vocab.SPECIAL_CHAR_MAP:
        s = F.replace(s, F.lit(ch), F.lit(repl))
    s = _guarded_chain_strip(s, vocab.COMPANY_SUFFIX_PATTERNS)
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    # r08 re-measurement: the negated-class regex was the single most
    # expensive step of the chain (0.61s vs a 0.33s stage floor at
    # sf1.0); the translate dirty-check guard now wins (0.27s) — the
    # r03 3x-tree-reference regression it was rejected for no longer
    # reproduces (codegen subexpression elimination carries the
    # multi-referenced chain; full-chain timing improved, see
    # OPTIMIZATION_r08.md).
    s = replace_not_in(s, _WORDISH_CHARS, r"\w\s\.\-", "")
    return F.when(
        col.isNull() | (F.length(col) == 0) | (F.length(s) < 2), F.lit("XXX")
    ).otherwise(s)


def correct_spelling_ai(col: Column) -> Column:
    """= oracle.cleaning.correct_spelling_ai (ordered literal replace chain)."""
    s = F.upper(col)
    for wrong, right in vocab.SPELLING_CORRECTIONS:
        s = F.replace(s, F.lit(wrong), F.lit(right))
    for word in vocab.GARBAGE_WORDS:
        s = F.replace(s, F.lit(word), F.lit(""))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    s = F.regexp_replace(s, r"[^A-Z\s]", "")  # short inputs; see clean_payee
    titled = initcap_lower(s)
    return F.when(col.isNull() | (F.length(col) == 0), F.lit("UNKNOWN")).otherwise(
        F.when(F.length(s) >= 3, titled).otherwise(F.lit("UNKNOWN"))
    )


def initcap_lower(col: Column) -> Column:
    """Python str.title() over an A-Z/space string == initcap(lower(s))
    (title() capitalizes after any non-alpha; input charset here is [A-Z ])."""
    return F.initcap(F.lower(col))


# --------------------------------------------------------------------------
# predicates  (oracle.predicates)
# --------------------------------------------------------------------------

_GARBAGE_ANCHORED = (
    r"O{4,}|I{4,}|Z{4,}",     # search
    r"^[OIZ]{5,}$",
    r"^[A-Z][OIZ]{4,}$",
    r"[OIZ]{5,}",             # .*X.* under re.match == search
    r"^[A-Z]{1,2}$",
    r"^[A-Z][\s]*[A-Z]$",
)


def is_garbage(col: Column) -> Column:
    """= oracle.predicates.is_garbage."""
    alpha = n_alpha(col)
    digits = n_digit(col)
    rx = "|".join(f"(?:{p})" for p in _GARBAGE_ANCHORED)
    return (
        col.isNull()
        | (F.length(col) == 0)
        | (alpha < 3)
        | (digits > alpha)
        | F.coalesce(col.rlike(rx), F.lit(False))
    )


def is_junk_v1(col: Column) -> Column:
    """= oracle.predicates.is_junk_v1."""
    u = F.upper(col)
    return (
        col.isNull()
        | (F.length(col) < 3)
        | any_term(u, vocab.JUNK_TERMS_V1)
        | any_term(u, ("SIGN", "SGN", "BEARER", "ORDER"))
    )


def contains_bank_keyword(col: Column) -> Column:
    return any_term(F.upper(col), vocab.BANK_TERMS)


def bank_hits(col: Column) -> Column:
    """Count of BANK_TERMS present as substrings (on already-upper text)."""
    hits = [F.when(col.contains(t), 1).otherwise(0) for t in vocab.BANK_TERMS]
    return reduce(lambda a, b: a + b, hits)


def is_valid_drawer_v1(text: Column) -> Column:
    """= oracle.predicates.is_valid_drawer_v1 over *cleaned* text.

    The cleaned charset is [A-Z0-9 .,&/-] so isalpha ≡ [A-Z]; expressed as
    one boolean conjunction (pure predicates — evaluation order is free).
    """
    t = F.coalesce(text, F.lit(""))
    alpha = n_alpha(t)
    digits = n_digit(t)
    total = F.length(t)
    # Python str.split(): any-whitespace split, empty tokens dropped
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    has_ms = t.contains("M/S")  # "M/S." ⊂ "M/S" containment
    dot_count = count_chars(t, ".")
    hyphen_parts = F.size(F.split(t, "-"))
    alpha_after_dot_strip = n_alpha(F.translate(t, ".", ""))

    reject = (
        is_junk_v1(t)
        | contains_bank_keyword(t)
        | t.contains("BANK")
        | t.contains("PLEASE")
        | ((dot_count > 2) & ~has_ms)
        | any_term(t, vocab.LOCATION_KEYWORDS)
        | (total == 0)
        | ((digits > alpha) & (alpha < 4))
        | ((total > 6) & (F.try_divide(alpha, total) < 0.45))
        | ((bank_hits(t) > 0) & (alpha < 8))
        | (total < 5)
        | (digits >= 3)
        | (~t.contains(" ") & (digits == 0) & (alpha >= 5) & is_garbage(t))
        | (~t.contains(" ") & (digits > 0))
        | t.contains("NOTOVER")
        | t.contains("NOT OVER")
        | (t.contains("RS") & (F.size(words) <= 3))
        | (t.contains("/") & ~has_ms)
        | (t.contains("-") & (hyphen_parts > 3))
        | (t.contains(".") & (alpha_after_dot_strip == 0))
        | (digits > alpha)
        | (F.try_divide(alpha, total) < 0.6)
        | is_garbage(t)
    )
    return ~reject


def looks_like_real_name(text: Column) -> Column:
    """= oracle.predicates.looks_like_real_name (raw, case-preserved text)."""
    t = F.coalesce(text, F.lit(""))
    letters = n_alpha(t)
    digits = n_digit(t)
    total = F.length(t)
    # chars outside [A-Za-z0-9 ] == what translate leaves after deleting them
    special = F.length(F.translate(t, _ALPHA_CHARS + "0123456789 ", ""))
    u = F.upper(t)
    # Python str.split(): any-whitespace split, empty tokens dropped
    words = F.filter(F.split(u, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    common = F.size(
        F.array_intersect(words, F.array(*[F.lit(w) for w in sorted(vocab.COMMON_NAME_PARTS)]))
    )
    # NB: the reference counts duplicate common words twice only in scoring,
    # not here — this predicate only needs common == 0 vs > 0.

    suspicious = reduce(
        lambda a, b: a | b,
        [
            u.contains(s) & (F.lit(len(s)) > total / 2)
            for s in vocab.SUSPICIOUS_NAME_TERMS
        ],
    )
    multi_word_garbage = F.exists(
        words, lambda w: (F.length(w) < 2) | is_garbage(w)
    )
    reject = (
        t.isNull()
        | (total == 0)
        | (u == "XXX")
        | ((digits > letters) & (letters < 5))
        | ((total < 4) & ~u.isin("CO", "LTD", "PVT", "INC", "M/S"))
        | (special > 3)
        | is_garbage(t)
        | suspicious
        | ((common == 0) & (n_words >= 2) & multi_word_garbage)
        | ((common == 0) & (n_words == 1) & ((total < 5) | is_garbage(t)))
    )
    return ~reject


def common_name_part_count(words: Column) -> Column:
    """Count of words (with duplicates) that are COMMON_NAME_PARTS —
    scoring semantics (issuer_processor_v.py:428-430)."""
    return F.size(
        F.filter(
            words,
            lambda w: F.upper(w).isin(*sorted(vocab.COMMON_NAME_PARTS)),
        )
    )


def score_name(text: Column) -> Column:
    """= oracle.predicates.score_name."""
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n = F.size(words)
    score = F.lit(0.0)
    score = score + F.when((n >= 2) & (n <= 5), 0.3).otherwise(0.0)
    all_alpha = F.forall(words, lambda w: w.rlike(r"^[A-Za-z]+$"))
    score = score + F.when(all_alpha, 0.3).otherwise(0.0)
    score = score + 0.2 * common_name_part_count(words)
    return F.least(score, F.lit(1.0))


def is_bank_or_metadata(col: Column) -> Column:
    """= oracle.predicates.is_bank_or_metadata."""
    u = F.upper(col)
    return any_term(u, vocab.PAYEE_BANK_TERMS) | any_term(u, vocab.PAYEE_METADATA_TERMS)


# Every character Python's str.split()/\s treats as whitespace that Java's
# \s does NOT ([ \t\n\x0b\f\r]): the ASCII control separators, NEL, and the
# Unicode space separators. This is exactly the documented residual where
# the Python-oracle flagship path can diverge from its Catalyst twins
# (PLANS.md round 4); normalizing them to ' ' at the scan boundary makes
# every engine dialect agree on the input.
EXOTIC_SEPARATORS = (
    "\x1c\x1d\x1e\x1f\x85\xa0 "
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "    　"
)


def normalize_separators(col: Column) -> Column:
    """Map the Python-only whitespace characters to a plain space — the
    default-on scan-boundary normalizer (job.py --normalize-ws; pass
    --no-normalize-ws to keep exotic separators byte-for-byte). A single
    translate (no regex engine, whole-stage-codegen friendly): 1:1
    char substitution is all the mapping needs."""
    return F.translate(col, EXOTIC_SEPARATORS, " " * len(EXOTIC_SEPARATORS))
