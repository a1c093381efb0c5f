"""DuckDB oracle SQL for the model-phase queries (U3/U4/U5 fallbacks + K3).

The model stages run HF pipelines when ``transformers`` is installed; the
driver's environment (like this container) has none, so the registered
queries exercise the DETERMINISTIC fallbacks — and those are rendered here
as exact SQL. The ``backend`` column records which path ran, so an
environment with real models would visibly diverge instead of silently
passing."""

from __future__ import annotations

from cheque_ocr_project_spark.functions import ducksql as D
from cheque_ocr_project_spark.operators import models as M
from cheque_ocr_project_spark.plans import flagship_sql as FS

TRANSCRIPT_KEYS = "source || '-' || CAST(doc_id // 2147483648 AS VARCHAR) AS conv_id, CAST(doc_id % 2147483648 AS INT) AS turn_idx"


def sql_zero_shot_classify(labels=M.DEFAULT_ZS_LABELS) -> str:
    scores = []
    for lab in labels:
        lw = lab.upper().split()
        hits = " + ".join(
            f"(CASE WHEN list_contains(tw, {D.q(w)}) THEN 1 ELSE 0 END)"
            for w in lw
        )
        scores.append(f"(({hits}) / {len(lw)})")
    best = f"greatest({', '.join(scores)})"
    label_case = "CASE " + " ".join(
        f"WHEN {s} = best THEN {D.q(lab)}"
        for s, lab in zip(scores, labels)
    ) + " END"
    return f"""
WITH t AS (
  SELECT {TRANSCRIPT_KEYS},
         list_filter(string_split_regex(upper(text[1:512]), '[ \\t\\n\\x0b\\f\\r]+'),
                     x -> x <> '') AS tw
  FROM documents
),
scored AS (
  SELECT conv_id, turn_idx, tw, {best} AS best FROM t
)
SELECT conv_id, turn_idx, {label_case} AS label,
       CAST(best AS DOUBLE) AS score, 'overlap' AS backend
FROM scored"""


def sql_qa_extract() -> str:
    u = "regexp_replace(upper(text[1:512]), '[\\n\\r]+$', '')"
    whens = []
    for p in FS.PAYEE_PATTERNS_SQLSAFE:
        cand = FS.pystrip(f"regexp_extract(u, {D.rx(p)}, 1)")
        whens.append(
            f"WHEN regexp_matches(u, {D.rx(p)}) "
            f"AND NOT {FS.is_bank_or_metadata(cand)} THEN {cand}"
        )
    answer = "CASE " + " ".join(whens) + " ELSE NULL END"
    return f"""
WITH t AS (
  SELECT {TRANSCRIPT_KEYS}, {u} AS u FROM documents
),
ans AS (
  SELECT conv_id, turn_idx, {answer} AS answer FROM t
)
SELECT conv_id, turn_idx, answer,
       CASE WHEN answer IS NULL THEN 0.0
            ELSE 0.5 + 0.5 * least(1.0, length(answer) / 30.0) END AS score,
       'heuristic' AS backend
FROM ans"""


def sql_t5_spell() -> str:
    # mirror of models.spell_correct_deterministic's exotic-separator
    # pre-normalization (\x1c-\x1f, \x85 -> space). The class is rendered
    # with RE2 hex escapes — NOT raw control bytes — so the generated SQL
    # stays byte-clean and the characters are visible in logs/diffs.
    snip = ("regexp_replace(text[1:512], "
            r"'[\x1c-\x1f\x{0085}]', ' ', 'g')")
    corrected = D.correct_spelling_sql(snip)
    a = (f"list_filter(string_split_regex(upper({snip}), "
         f"'[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')")
    b = "list_filter(string_split_regex(corr, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"
    return f"""
WITH t AS (
  SELECT {TRANSCRIPT_KEYS}, text, {corrected} AS corr FROM documents
),
w AS (
  SELECT conv_id, turn_idx, corr, {a} AS wa, {b} AS wb FROM t
)
SELECT conv_id, turn_idx, corr AS corrected,
       CASE WHEN greatest(len(wa), len(wb)) = 0 THEN 1.0
            ELSE len(list_filter(range(1, greatest(len(wa), len(wb)) + 1),
                                 i -> wa[i] = wb[i])) * 1.0
                 / greatest(len(wa), len(wb)) END AS spell_conf,
       'map' AS backend
FROM w"""


CAP_SPAN_RX = r"\b([A-Z][A-Z]+(?:\s+[A-Z][A-Z]+){0,3})\b"

_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
              "for", "with", "at", "by", "from", "as", "that", "this")


def sql_model_ensemble() -> str:
    """K3: 0.3*ocr + 0.4*ner + 0.2*context + 0.1*spelling, every component
    deterministic and recomputable."""
    lines = "list_filter(string_split(text, chr(10)), ln -> regexp_matches(ln, '[^ \\t\\n\\x0b\\f\\r]'))"
    conf_fold = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(lines, ln -> {FS.line_conf('ln')})), (a, b) -> a + b)"
    )
    caps = f"len(regexp_extract_all(upper(text[1:512]), {D.rx(CAP_SPAN_RX)}, 1))"
    stop_list = ", ".join(D.q(w) for w in _STOPWORDS)
    toks = "regexp_extract_all(lower(text), '[a-z]+')"
    context = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, w -> w IN ({stop_list}))) * 1.0 / len({toks}) "
        f"ELSE 0.0 END"
    )
    spelling = (
        "1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)"
    )
    return f"""
WITH t AS (
  SELECT {TRANSCRIPT_KEYS}, text, {lines} AS lines FROM documents
),
parts AS (
  SELECT conv_id, turn_idx,
    CASE WHEN len(lines) > 0 THEN {conf_fold} / len(lines) ELSE 0.0 END AS ocr_conf,
    least(1.0, {caps} / 10.0) AS ner_conf,
    {context} AS context_conf,
    {spelling} AS spelling_conf
  FROM t
)
SELECT conv_id, turn_idx, ocr_conf, ner_conf, context_conf, spelling_conf,
       0.3 * ocr_conf + 0.4 * ner_conf + 0.2 * context_conf
         + 0.1 * spelling_conf AS ensemble
FROM parts"""


def sql_ner_entities() -> str:
    """U2 deterministic-fallback NER twin (operators/models._load_ner fake
    branch): non-overlapping all-caps spans of 1-4 words (2+ letters each)
    over text[:512].upper(); ORG iff any span word is a hint literal;
    score = round(min(1, len/30 + 0.5), 4); first 10 spans. RE2 and Python
    re agree on \\b + greedy {0,3} for this pattern (leftmost, greedy)."""
    pat = r"\b([A-Z][A-Z]+(?:\s+[A-Z][A-Z]+){0,3})\b"
    hints = ", ".join(D.q(h) for h in M._FAKE_ORG_HINTS)
    return f"""
WITH t AS (
  SELECT {TRANSCRIPT_KEYS},
         regexp_extract_all(upper(text[1:512]), {D.rx(pat)}, 1) AS spans
  FROM documents
),
e AS (
  SELECT conv_id, turn_idx,
         unnest(range(1, len(spans) + 1)) AS i,
         unnest(spans) AS entity
  FROM t
)
SELECT conv_id, turn_idx, CAST(i - 1 AS INT) AS ent_idx, entity,
       CASE WHEN len(list_filter(string_split(entity, ' '),
                                 w -> w IN ({hints}))) > 0
            THEN 'ORG' ELSE 'PER' END AS label,
       round(least(1.0, length(entity) / 30.0 + 0.5), 4) AS score,
       'fake' AS backend
FROM e WHERE i <= 10"""
