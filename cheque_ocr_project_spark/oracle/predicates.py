"""Boolean text predicates (junk / garbage / validity), reference parity.

- ``is_junk_v1``            — issuer_processor_v.py:220-242
- ``is_garbage``            — issuer_processor_v.py:116-139
- ``is_valid_drawer_v1``    — issuer_processor_v.py:245-349
- ``looks_like_real_name``  — issuer_processor_v.py:499-550
- ``contains_bank_keyword`` — issuer_processor_v.py:161-166
- ``is_junk_v3``            — IssuerBatchProcessorV3.py:131-167
- ``is_valid_business_name_v3`` — IssuerBatchProcessorV3.py:201-242
- ``is_valid_drawer_v3``    — IssuerBatchProcessorV3.py:245-257
- ``is_bank_or_metadata``   — payee_cleaner.py:212-233
- ``score_name``            — issuer_processor_v.py:142-159
"""

from __future__ import annotations

import re

from cheque_ocr_project_spark.oracle import vocab

_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")
_NON_ALPHA = re.compile(r"[^A-Za-z]")   # count via one sub() pass — same
_NON_DIGIT = re.compile(r"[^0-9]")      # count as len(findall(class)), faster
_OIZ_RUN = re.compile(r"O{4,}|I{4,}|Z{4,}")
_GARBAGE_RES = tuple(re.compile(p) for p in vocab.GARBAGE_PATTERNS)
# any(rx.match(t) for rx in _GARBAGE_RES) as ONE anchored alternation
# (re.match == anchored-at-start for every pattern in the list)
_GARBAGE_COMBINED = re.compile(
    "^(?:" + "|".join(f"(?:{p})" for p in vocab.GARBAGE_PATTERNS) + ")"
)
_SHORT_CAPS = re.compile(r"^[A-Z]{2,4}$")
_JUNK_RES_V3 = tuple(re.compile(p, re.IGNORECASE) for p in vocab.JUNK_PATTERNS_V3)


def is_garbage(text: str | None) -> bool:
    if not text:
        return True
    letters = len(_NON_ALPHA.sub("", text))
    digits = len(_NON_DIGIT.sub("", text))
    if letters < 3:
        return True
    if digits > letters:
        return True
    if _OIZ_RUN.search(text):
        return True
    return _GARBAGE_COMBINED.match(text) is not None


def is_junk_v1(text: str | None) -> bool:
    if not text:
        return True
    if len(text) < 3:
        return True
    u = text.upper()
    for term in vocab.JUNK_TERMS_V1:  # plain loop: no genexpr frame per term
        if term in u:
            return True
    if "SIGN" in u or "SGN" in u:
        return True
    if "BEARER" in u or "ORDER" in u:
        return True
    return False


def contains_bank_keyword(text: str) -> bool:
    u = text.upper()
    for term in vocab.BANK_TERMS:
        if term in u:
            return True
    return False


def is_valid_drawer_v1(text: str | None) -> bool:
    """The reference's ~20-predicate drawer-name validity cascade.

    Operates on *cleaned* text; every early-return of the reference is kept
    in the original evaluation order (short-circuit semantics matter for
    side-effect-free equality, and the order documents intent).
    """
    if text is None:
        text = ""
    if is_junk_v1(text):
        return False
    if contains_bank_keyword(text):
        return False
    if "BANK" in text:
        return False
    if "PLEASE" in text:
        return False
    if text.count(".") > 2 and "M/S" not in text and "M/S." not in text:
        return False
    for loc in vocab.LOCATION_KEYWORDS:
        if loc in text:
            return False

    # map() over the bound methods, not a genexpr: ~2x less interpreter
    # overhead in the hottest per-line path (semantics identical)
    alpha = sum(map(str.isalpha, text))
    digits = sum(map(str.isdigit, text))
    total = len(text)
    if total == 0:
        return False
    if digits > alpha and alpha < 4:
        return False
    if total > 6 and alpha / total < 0.45:
        return False
    if alpha < 8:
        for term in vocab.BANK_TERMS:
            if term in text:
                return False

    words = text.split()
    if len(text) < 5:
        return False
    if digits >= 3:
        return False

    letters = alpha
    if " " not in text and digits == 0 and letters >= 5:
        if is_garbage(text):
            return False
    elif " " not in text and digits > 0:
        return False

    if "NOTOVER" in text:
        return False
    if "NOT OVER" in text:
        return False
    if "RS" in text and len(words) <= 3:
        return False
    if "/" in text and "M/S" not in text and "M/S." not in text:
        return False
    if "-" in text and len(text.split("-")) > 3:
        return False
    if "." in text and not any(c.isalpha() for c in text.replace(".", "")):
        return False
    if digits > letters:
        return False
    if letters / len(text) < 0.6:
        return False
    if is_garbage(text):
        return False
    return True


def looks_like_real_name(text: str | None) -> bool:
    if not text or text == "XXX":
        return False
    letters = sum(map(str.isalpha, text))
    digits = sum(map(str.isdigit, text))
    total = len(text)
    if digits > letters and letters < 5:
        return False
    if total < 4 and text.upper() not in ("CO", "LTD", "PVT", "INC", "M/S"):
        return False
    # every char is exactly one of alnum / space / special
    special = total - sum(map(str.isalnum, text)) - text.count(" ")
    if special > 3:
        return False
    if is_garbage(text):
        return False
    u = text.upper()
    for s in vocab.SUSPICIOUS_NAME_TERMS:
        if s in u and len(s) > len(text) / 2:
            return False
    words = u.split()
    common = sum(1 for w in words if w in vocab.COMMON_NAME_PARTS)
    if common == 0 and len(words) >= 2:
        for w in words:
            if len(w) < 2 or is_garbage(w):
                return False
    elif common == 0 and len(words) == 1:
        if len(text) < 5 or is_garbage(text):
            return False
    return True


def score_name(text: str) -> float:
    score = 0.0
    words = text.split()
    if 2 <= len(words) <= 5:
        score += 0.3
    if all(w.isalpha() for w in words):
        score += 0.3
    common = sum(1 for w in words if w.upper() in vocab.COMMON_NAME_PARTS)
    if common > 0:
        score += 0.2 * common
    return min(score, 1.0)


def is_junk_v3(text: str | None) -> bool:
    """V3 junk check: regex list with >=60%-coverage rule, short-caps rule,
    junk-variation >=50%-coverage rule."""
    if not text or len(text) < 2:
        return True
    u = text.upper()
    if _SHORT_CAPS.match(u) and u not in vocab.SHORT_CAPS_OK_V3:
        return True
    for rx in _JUNK_RES_V3:
        m = rx.search(u)
        if m and len(m.group()) >= len(u) * 0.6:
            return True
    for junk in vocab.JUNK_VARIATIONS_V3:
        if junk in u and len(junk) >= len(u) * 0.5:
            return True
    return False


def is_valid_business_name_v3(text: str | None) -> bool:
    if not text or len(text) < 3:
        return False
    if is_junk_v3(text):
        return False
    u = text.upper()
    for bank in vocab.BANK_NAMES_V3:
        if bank in u and len(bank) >= len(u) * 0.7:
            return False
    alpha = sum(1 for c in text if c.isalpha())
    digits = sum(1 for c in text if c.isdigit())
    if digits > 0 and alpha == 0:
        return len(text) >= 8
    total = len(text)
    if alpha > 0:
        if alpha / total < 0.3 and total > 5:
            return digits > 5
    return True


def is_valid_drawer_v3(text: str | None) -> bool:
    if not text:
        return False
    if len(text) < 3:
        return False
    if is_junk_v3(text):
        return False
    return is_valid_business_name_v3(text)


def is_bank_or_metadata(text: str) -> bool:
    u = text.upper()
    if any(b in u for b in vocab.PAYEE_BANK_TERMS):
        return True
    return any(m in u for m in vocab.PAYEE_METADATA_TERMS)
