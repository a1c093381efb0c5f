"""Government payee rule engine (government_payee_rules.py:127-245 parity)."""

from __future__ import annotations

import re

from cheque_ocr_project_spark.oracle import classify as cl
from cheque_ocr_project_spark.oracle import grammars, vocab

_GOVT_PAYEE_RES = tuple(re.compile(p) for p in vocab.GOVT_PAYEE_PATTERNS)


def is_government_entity(text: str | None) -> bool:
    """Entity literals → payee patterns → short-name indicator rule."""
    if not text:
        return False
    u = text.upper()
    for entity in vocab.GOVT_ENTITIES:
        if entity in u:
            return True
    for rx in _GOVT_PAYEE_RES:
        if rx.search(u):
            return True
    words = u.split()
    if len(words) <= 4:
        for indicator in vocab.GOVT_INDICATORS:
            if indicator in u:
                return True
    return False


def extract_officer_designation(text: str) -> str | None:
    """Literal designation list scanned in declaration order
    (government_payee_rules.py:237-245)."""
    u = text.upper()
    for designation in vocab.OFFICER_DESIGNATIONS:
        if designation in u:
            return designation
    return None


def is_payable_to_government(ocr_text: str | None) -> bool:
    if not ocr_text:
        return False
    u = ocr_text.upper()
    section = grammars.extract_payee_section(u)
    if section:
        return is_government_entity(section)
    return False


def enforce_payee_rule(classification: dict, extracted_payee: str | None,
                       ocr_full_text: str) -> str:
    """Six-rule cascade returning the regulation-correct payee string."""
    if not extracted_payee:
        extracted_payee = ""

    ctype = classification["type"]

    if ctype == cl.T_GOVT_GOVT_ACCOUNT:
        return "GOVERNMENT"

    if ctype == cl.T_GOVT_NON_TRANSFERABLE:
        designation = extract_officer_designation(ocr_full_text)
        if designation:
            return f"GOVERNMENT - {designation}"
        if extracted_payee and any(
            d in extracted_payee.upper() for d in vocab.OFFICER_DESIGNATIONS
        ):
            return f"GOVERNMENT - {extracted_payee}"
        return "GOVERNMENT OFFICER"

    if ctype == cl.T_GOVT_NEGOTIABLE:
        if is_government_entity(extracted_payee):
            return "GOVERNMENT"
        return extracted_payee or "XXX"

    if ctype in (cl.T_DEMAND_DRAFT, cl.T_MANAGERS_CHEQUE):
        if is_payable_to_government(ocr_full_text):
            return "GOVERNMENT"
        return extracted_payee or "XXX"

    if is_payable_to_government(ocr_full_text):
        return "GOVERNMENT"

    if is_government_entity(extracted_payee):
        return "GOVERNMENT"

    return extracted_payee or "XXX"
