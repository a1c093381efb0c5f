"""Per-turn payee pipeline (ocr_engine.py:109-192 parity).

Flow for one turn (one reference image):
  full_text = ' '.join(lines)          (ocr_engine.py:86-96)
  classification = classify(full_text) (cheque_classifier.py:122-170)
  payee_raw = extract_payee(full_text) (payee_cleaner.py:147-185)
  government → enforce_payee_rule      (government_payee_rules.py:127-175)
  otherwise  → clean(payee_raw)        (payee_cleaner.py:101-145)
  confidence = mean line confidence    (ocr_engine.py:98-107)
"""

from __future__ import annotations

from cheque_ocr_project_spark.oracle import classify as cl
from cheque_ocr_project_spark.oracle import cleaning, govrules, grammars, issuer


def full_text_of(lines: list[tuple[str, float]]) -> str:
    return " ".join(raw for raw, _conf in lines)


def mean_confidence(lines: list[tuple[str, float]]) -> float:
    if not lines:
        return 0.0
    return sum(conf for _raw, conf in lines) / len(lines)


def process_turn_payee(text: str | None,
                       lines: list[tuple[str, float]] | None = None) -> dict:
    """Classification + payee extraction + government rules for one turn.

    ``lines`` may be the precomputed split_lines(text) relation (pure
    memoization — extract_turn computes it once for both the payee and
    issuer paths; r08 profile showed the split + per-line confidence
    evaluated twice per turn)."""
    if lines is None:
        lines = issuer.split_lines(text)
    result = {
        "success": False,
        "cheque_type": None,
        "is_government": False,
        "government_category": None,
        "payee_rule": None,
        "payee_raw": None,
        "payee_cleaned": None,
        "full_text": "",
        "confidence": 0.0,
        "error": None,
        "validation_notes": [],
    }
    if not lines:
        result["error"] = "No text detected"
        result["payee_cleaned"] = "XXX"
        return result

    full_text = full_text_of(lines)
    result["full_text"] = full_text

    classification = cl.classify(full_text)
    result["cheque_type"] = classification["type"]
    result["is_government"] = classification["is_government"]
    result["government_category"] = classification["government_category"]
    result["payee_rule"] = classification["payee_rule"]
    result["validation_notes"].extend(classification["validation_notes"])

    raw_payee = grammars.extract_payee(full_text)
    result["payee_raw"] = raw_payee

    if classification["is_government"]:
        final = govrules.enforce_payee_rule(classification, raw_payee, full_text)
    else:
        final = cleaning.clean_payee(raw_payee) if raw_payee else "XXX"
    result["payee_cleaned"] = final

    result["confidence"] = mean_confidence(lines)
    result["success"] = True
    return result
