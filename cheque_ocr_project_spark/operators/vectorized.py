"""Vectorized Arrow-batched flagship engine — no per-row Python inner loop.

The north rule's target shape: "each turn's text passes through a VECTORIZED
tokenize+classify stage ... all extraction logic runs in Arrow-batched UDFs
or native DataFrame expressions". The per-row oracle engine
(operators/extract.extract_turns_udf) iterates rows inside the batch; this
engine re-expresses the SAME semantics as pandas Series operations (C-level
regex/str kernels over whole columns), so the Python interpreter touches:

- the rare FOR-marker line subsets (prefiltered by vectorized masks — the
  reference's own rare path, issuer_processor_v.py:467-481),
- role='tool' payload rows (HTML/PDF boilerplate strip; rare),
- one difflib call per DISTINCT fuzzy candidate (J6 memoization).

Everything else — cleaning, line confidences, classification, payee
grammars, validity cascades, scoring, top-1 — is vectorized. Per-turn
equality with oracle.turn.extract_turn is asserted by
tests/test_pipeline_equality.py (the correctness gate), so every helper
below cites the oracle function it must equal and mirrors its exact
condition order.

Reference lifecycle: issuer_processor_v.py:378-496 + ocr_engine.py:86-192.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cheque_ocr_project_spark.oracle import boilerplate
from cheque_ocr_project_spark.oracle import cleaning as ocl
from cheque_ocr_project_spark.oracle import fuzzy as ofz
from cheque_ocr_project_spark.oracle import issuer as oissuer
from cheque_ocr_project_spark.oracle import predicates as opred
from cheque_ocr_project_spark.oracle import vocab

# ---------------------------------------------------------------------------
# compiled patterns (shared with the oracle where it has them)
# ---------------------------------------------------------------------------

_V1_TRANS = str.maketrans("01|5", "OIIS")
_NON_CHARSET_V1 = ocl._NON_CHARSET_V1
_OIZ_RUN = opred._OIZ_RUN
_GARBAGE_COMBINED = opred._GARBAGE_COMBINED
_ALPHA_RX = r"[A-Za-z]"
_DIGIT_RX = r"[0-9]"
_CROSSED_ALT = re.compile("|".join(f"(?:{p})" for p in vocab.CROSSED_PATTERNS))
_GOVT_PAYEE_ALT = re.compile(
    "|".join(f"(?:{p})" for p in vocab.GOVT_PAYEE_PATTERNS)
)
_MARKER_ALT = re.compile("|".join(re.escape(m) for m in vocab.FOR_MARKERS))
_FOR_LINE_ALT = re.compile("FOR |F/O |F/|PROP ")
_DATE_RE = re.compile(r"Date:\s*(\d{2})[./](\d{2})[./](\d{4})")
_AMOUNT_RE = re.compile(r"[₹Rs\.]*\s*([\d,]+(?:\.\d{2})?)[/\-]?")
_ACCOUNT_RE = re.compile(r"A/C No\.?[\s:]*(\d{10,20})")
_MICR_RE = re.compile(vocab.MICR_PATTERN)
_PAYEE_RES = tuple(re.compile(p) for p in vocab.PAYEE_PATTERNS)
_PAYEE_GUARDS = (
    ("PAY",), ("ORDER",), ("PAY",), ("BEARER",), ("BEARER",),
    ("FAVOUR",), ("FAVOR",), ("BENEFICIARY",), ("RUPEES", "RS"), None,
)
_COMMON_TOKEN_RX = re.compile(
    r"(?:^|(?<=\s))(?:" + "|".join(
        re.escape(w) for w in sorted(vocab.COMMON_NAME_PARTS)
    ) + r")(?=\s|$)"
)


def _contains_any(u: pd.Series, terms) -> pd.Series:
    """OR of literal containment (vectorized any(term in u))."""
    out = pd.Series(False, index=u.index)
    for t in terms:
        out |= u.str.contains(t, regex=False)
    return out


def _safe_ratio(num, den) -> np.ndarray:
    num = np.asarray(num, dtype=np.float64)
    den = np.asarray(den, dtype=np.float64)
    return np.where(den > 0, num / np.maximum(den, 1.0), 0.0)


class _ByteView:
    """One UTF-8 byte pass over a whole string Series: O(total bytes) char
    counting instead of a 100x-slower regex count per class. Multi-byte
    UTF-8 continuation bytes are >= 0x80, so ASCII-class counts are exact
    for ANY input; token counting assumes ASCII whitespace (callers pass
    clean_text_v1 output, charset [A-Z0-9 .,&/-])."""

    _WS = frozenset(b" \t\n\x0b\x0c\r")

    def __init__(self, s: pd.Series):
        enc = [v.encode("utf-8") for v in s.fillna("")]
        lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
        # a leading sentinel space + space separators make every segment's
        # preceding byte whitespace (exact token-run detection at borders)
        data = b" " + b" ".join(enc) if enc else b" "
        self.arr = np.frombuffer(data, np.uint8)
        self.starts = 1 + np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
        self.lens = lens
        self.index = s.index

    def _seg_sum(self, mask: np.ndarray) -> np.ndarray:
        c = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
        return c[self.starts + self.lens] - c[self.starts]

    def count_ranges(self, ranges) -> pd.Series:
        m = np.zeros(len(self.arr), dtype=bool)
        for lo, hi in ranges:
            m |= (self.arr >= lo) & (self.arr <= hi)
        return pd.Series(self._seg_sum(m), index=self.index)

    def alpha(self) -> pd.Series:
        return self.count_ranges(((65, 90), (97, 122)))

    def digit(self) -> pd.Series:
        return self.count_ranges(((48, 57),))

    def count_char(self, ch: str) -> pd.Series:
        b = ch.encode()[0]
        return pd.Series(self._seg_sum(self.arr == b), index=self.index)

    def nwords(self) -> pd.Series:
        """Number of ASCII-whitespace-separated tokens per segment."""
        ws = np.zeros(256, dtype=bool)
        for b in b" \t\n\x0b\x0c\r":
            ws[b] = True
        is_ws = ws[self.arr]
        nonspace = ~is_ws
        run_start = nonspace.copy()
        run_start[1:] &= is_ws[:-1]
        return pd.Series(self._seg_sum(run_start), index=self.index)


# ---------------------------------------------------------------------------
# vectorized oracle twins (each must equal the cited oracle function)
# ---------------------------------------------------------------------------

def clean_v1_series(raw: pd.Series) -> pd.Series:
    """= oracle.cleaning.clean_text_v1 element-wise."""
    s = raw.fillna("")
    up = s.str.upper().str.translate(_V1_TRANS)
    up = up.str.replace(_NON_CHARSET_V1, " ", regex=True)
    up = up.str.split().str.join(" ")
    return up.mask(s.str.len() == 0, "XXX")


def is_garbage_series(t: pd.Series, bv: _ByteView | None = None) -> pd.Series:
    """= oracle.predicates.is_garbage element-wise. The count phase is byte-
    level numpy; the (rarely-deciding) regex phase runs only on rows the
    counts did not already classify."""
    s = t.fillna("")
    if bv is None:
        bv = _ByteView(s)
    letters = bv.alpha().to_numpy()
    digits = bv.digit().to_numpy()
    g = pd.Series(
        (bv.lens == 0) | (letters < 3) | (digits > letters), index=s.index
    )
    live = ~g
    if live.any():
        sub = s[live]
        g.loc[live] = (
            sub.str.contains(_OIZ_RUN, regex=True)
            | sub.str.match(_GARBAGE_COMBINED)
        )
    return g


def is_valid_drawer_v1_series(s: pd.Series) -> pd.Series:
    """= oracle.predicates.is_valid_drawer_v1 over CLEANED text (charset
    [A-Z0-9 .,&/-], so isalpha/isdigit reduce to ASCII classes, byte length
    == char length, and the only whitespace is single spaces).

    The predicate is a pure conjunction, so evaluation is reordered for the
    vectorized shape: one numpy byte pass computes every count-based kill
    first (this alone rejects most OCR-ish lines), and the ~100 literal
    containment / regex checks run only on the survivors."""
    t = s.fillna("")
    bv = _ByteView(t)
    ln = bv.lens
    alpha = bv.alpha().to_numpy()
    digits = bv.digit().to_numpy()
    nwords = bv.nwords().to_numpy()
    dots = bv.count_char(".").to_numpy()
    hyphens = bv.count_char("-").to_numpy()
    slashes = bv.count_char("/").to_numpy()
    spaces = bv.count_char(" ").to_numpy()
    ratio = _safe_ratio(alpha, ln)

    reject_n = ln < 5                      # covers len<3, junk len, total==0
    reject_n |= digits >= 3
    reject_n |= digits > alpha             # covers (digits>alpha)&(alpha<4)
    reject_n |= (ln > 6) & (ratio < 0.45)
    reject_n |= ratio < 0.6
    reject_n |= (spaces == 0) & (digits > 0)
    reject_n |= (dots > 0) & (alpha == 0)
    reject_n |= hyphens > 2                # len(split('-')) > 3

    alive = pd.Series(~reject_n, index=t.index)
    if not alive.any():
        return alive

    sub = t[alive]
    has_ms = sub.str.contains("M/S", regex=False)
    kill = (pd.Series(dots, index=t.index)[alive] > 2) & ~has_ms
    kill |= (pd.Series(slashes, index=t.index)[alive] > 0) & ~has_ms
    kill |= _contains_any(sub, vocab.JUNK_TERMS_V1)
    kill |= _contains_any(sub, ("SIGN", "SGN", "BEARER", "ORDER"))
    kill |= _contains_any(sub, vocab.BANK_TERMS)
    kill |= sub.str.contains("BANK", regex=False)
    kill |= sub.str.contains("PLEASE", regex=False)
    kill |= _contains_any(sub, vocab.LOCATION_KEYWORDS)
    kill |= sub.str.contains("NOTOVER", regex=False)
    kill |= sub.str.contains("NOT OVER", regex=False)
    kill |= sub.str.contains("RS", regex=False) & (
        pd.Series(nwords, index=t.index)[alive] <= 3
    )
    # the final unconditional is_garbage subsumes the no-space garbage rule
    kill |= is_garbage_series(sub)
    alive.loc[alive[alive].index] = ~kill
    return alive


def _word_stats(u: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(common-name-part count with duplicates, any-bad-word flag) for an
    UPPER-cased Series; bad word = len<2 or is_garbage(word). Token explode
    keeps everything vectorized."""
    toks = u.str.split()
    ex = toks.explode()
    nonnull = ex.dropna()
    if len(nonnull):
        common_hits = nonnull.isin(vocab.COMMON_NAME_PARTS)
        common = common_hits.groupby(level=0).sum()
        # token vocabulary is tiny relative to token count: evaluate the
        # garbage predicate once per DISTINCT token, then dict-map back
        uniq = pd.Series(nonnull.unique())
        bad_u = (uniq.str.len() < 2) | is_garbage_series(uniq)
        bad = nonnull.map(dict(zip(uniq, bad_u)))
        anybad = bad.groupby(level=0).any()
    else:
        common = pd.Series(dtype="int64")
        anybad = pd.Series(dtype="bool")
    common = common.reindex(u.index, fill_value=0)
    anybad = anybad.reindex(u.index, fill_value=False)
    return common, anybad


def looks_like_real_name_series(s: pd.Series) -> pd.Series:
    """= oracle.predicates.looks_like_real_name over ASCII candidate text."""
    t = s.fillna("")
    bv = _ByteView(t)
    ln = pd.Series(bv.lens, index=t.index)
    letters = bv.alpha()
    digits = bv.digit()
    u = t.str.upper()
    nwords = bv.nwords()
    common, anybad = _word_stats(u)
    garb = is_garbage_series(t, bv)

    reject = (ln == 0) | (t == "XXX")
    reject |= (digits > letters) & (letters < 5)
    reject |= (ln < 4) & ~u.isin(("CO", "LTD", "PVT", "INC", "M/S"))
    # special chars == everything outside [A-Za-z0-9 ] (ASCII contract)
    special = ln - letters - digits - bv.count_char(" ")
    reject |= special > 3
    reject |= garb
    for term in vocab.SUSPICIOUS_NAME_TERMS:
        reject |= u.str.contains(term, regex=False) & (len(term) > ln / 2)
    reject |= (common == 0) & (nwords >= 2) & anybad
    reject |= (common == 0) & (nwords == 1) & ((ln < 5) | garb)
    return ~reject


def is_bank_or_metadata_series(u: pd.Series) -> pd.Series:
    """= oracle.predicates.is_bank_or_metadata (input already upper)."""
    return _contains_any(u, vocab.PAYEE_BANK_TERMS) | _contains_any(
        u, vocab.PAYEE_METADATA_TERMS
    )


def is_government_entity_series(x: pd.Series) -> pd.Series:
    """= oracle.govrules.is_government_entity element-wise."""
    u = x.fillna("").str.upper()
    hit = _contains_any(u, vocab.GOVT_ENTITIES)
    hit |= u.str.contains(_GOVT_PAYEE_ALT, regex=True)
    short = u.str.count(r"\S+") <= 4
    hit |= short & _contains_any(u, vocab.GOVT_INDICATORS)
    return hit & (u.str.len() > 0)


def clean_payee_series(raw: pd.Series) -> pd.Series:
    """= oracle.cleaning.clean_payee element-wise."""
    isnull = raw.isna() | raw.fillna("").str.len().eq(0)
    s = raw.fillna("").str.upper().str.strip()
    for rx in ocl._TITLE_RES:
        s = s.str.replace(rx, "", regex=True)
    for ch, repl in vocab.SPECIAL_CHAR_MAP:
        s = s.str.replace(ch, repl, regex=False)
    for rx in ocl._SUFFIX_RES:
        s = s.str.replace(rx, "", regex=True)
    s = s.str.split().str.join(" ")
    s = s.str.replace(ocl._NON_WORDISH, "", regex=True)
    return s.mask(isnull | (s.str.len() < 2), "XXX")


def payee_raw_series(ftu: pd.Series) -> pd.Series:
    """= oracle.grammars.extract_payee over the UPPER full text: ordered
    patterns (literal guards), first whose candidate is not bank/metadata."""
    out = pd.Series(None, index=ftu.index, dtype="object")
    unset = ftu.str.len() > 0
    for rx, guard in zip(_PAYEE_RES, _PAYEE_GUARDS):
        if not unset.any():
            break
        active = unset
        if guard is not None:
            g = pd.Series(False, index=ftu.index)
            for lit in guard:
                g |= ftu.str.contains(lit, regex=False)
            active = active & g
        if not active.any():
            continue
        cand = ftu[active].str.extract(rx, expand=False)
        if isinstance(cand, pd.DataFrame):  # multi-group pattern: group 1
            cand = cand.iloc[:, 0]
        cand = cand.str.strip()
        ok = cand.notna() & ~is_bank_or_metadata_series(cand.fillna(""))
        hit_idx = cand.index[ok]
        out.loc[hit_idx] = cand[ok]
        unset = unset & out.isna()
    return out


# ---------------------------------------------------------------------------
# the batch kernel
# ---------------------------------------------------------------------------

def extract_batch(pdf: pd.DataFrame, drawer_dict: list[str],
                  threshold: float) -> pd.DataFrame:
    """One Arrow batch of (conv_id, turn_idx, role, text, tool) →
    RESULT_SCHEMA rows. Module-level so tests can exercise it directly."""
    n = len(pdf)
    idx = pd.RangeIndex(n)
    text = pdf["text"].reset_index(drop=True).astype("object")
    role = pdf["role"].reset_index(drop=True)
    tool = pdf["tool"].reset_index(drop=True)

    # content: tool turns run the (rare) boilerplate strip per payload row;
    # everything else passes through (oracle.turn.extract_turn head).
    content = text.fillna("").astype(str)
    is_tool = role.fillna("") == "tool"
    if is_tool.any():
        content.loc[is_tool] = [
            boilerplate.main_content(
                None if (t is None or isinstance(t, float)) else t,
                None if (tl is None or isinstance(tl, float)) else tl,
            )
            for t, tl in zip(text[is_tool], tool[is_tool])
        ]

    # ---- line relation (oracle.issuer.split_lines) ----
    split = content.str.split("\n")
    counts = split.str.len().to_numpy()
    rows = np.repeat(np.arange(n), counts)
    raw = pd.Series(
        [ln for lst in split for ln in lst], dtype="object", name="raw"
    )
    keep = raw.str.strip().str.len() > 0
    raw = raw[keep].reset_index(drop=True)
    lrow = pd.Series(rows[keep.to_numpy()], name="row")
    # alpha via byte pass (exact for unicode: UTF-8 continuation bytes are
    # never ASCII letters); denominator is the CHAR length like the oracle
    lconf = pd.Series(
        0.6 + 0.4 * _safe_ratio(_ByteView(raw).alpha(), raw.str.len()),
        index=raw.index,
    )

    ldf = pd.DataFrame({"row": lrow, "raw": raw, "conf": lconf})
    # line order within a turn == frame order (split preserves it)

    grouped = ldf.groupby("row", sort=False)
    full_text = grouped["raw"].agg(" ".join).reindex(idx, fill_value="")
    confidence = grouped["conf"].mean().reindex(idx, fill_value=0.0)
    has_lines = grouped.size().reindex(idx, fill_value=0) > 0

    ftu = full_text.str.upper()

    # ---- classification (oracle.classify.classify priority order) ----
    cat3 = ftu.str.contains("GOVERNMENT ACCOUNT", regex=False) | ftu.str.contains(
        "GOVT ACCOUNT", regex=False
    )
    cat2 = ~cat3 & ftu.str.contains("NOT TRANSFERABLE", regex=False) & _contains_any(
        ftu, ("GOVT", "GOVERNMENT", "PAO", "DDO")
    )
    cat1 = ~cat3 & ~cat2 & (
        _contains_any(ftu, vocab.GOVT_MARKERS_HIGH)
        | _contains_any(ftu, vocab.GOVT_MARKERS_MEDIUM)
    )
    is_gov = cat3 | cat2 | cat1
    is_dd = ~is_gov & _contains_any(ftu, vocab.DD_MARKERS)
    is_mc = ~is_gov & ~is_dd & _contains_any(ftu, vocab.MC_MARKERS)
    crossed = (
        ~is_gov & ~is_dd & ~is_mc
        & _contains_any(ftu, ("PAYEE", "CROSSED", "NEGOTIABLE"))
        & ftu.str.contains(_CROSSED_ALT, regex=True)
    )
    nwords_ft = ftu.str.count(r"\S+")
    is_self = (
        ~is_gov & ~is_dd & ~is_mc & ~crossed
        & ftu.str.contains("SELF", regex=False) & (nwords_ft < 15)
    )

    none_s = pd.Series(None, index=idx, dtype="object")
    ctype = none_s.copy()
    ctype[cat3] = "GOVT_GOVT_ACCOUNT"
    ctype[cat2] = "GOVT_NON_TRANSFERABLE"
    ctype[cat1] = "GOVT_NEGOTIABLE"
    ctype[is_dd] = "DEMAND_DRAFT"
    ctype[is_mc] = "MANAGERS_CHEQUE"
    ctype[crossed] = "CROSSED"
    ctype[is_self] = "SELF"
    ctype[ctype.isna()] = "ORDER"

    gov_cat = none_s.copy()
    gov_cat[cat3] = "III"
    gov_cat[cat2] = "II"
    gov_cat[cat1] = "I"

    payee_rule = none_s.copy()
    payee_rule[cat3] = "government_account"
    payee_rule[cat2] = "government_officer"
    payee_rule[cat1] = "government_contractor"
    payee_rule[is_dd] = "dd_standard"
    payee_rule[is_mc] = "mc_standard"
    payee_rule[crossed] = "account_payee"
    payee_rule[is_self] = "self"
    payee_rule[payee_rule.isna()] = "standard"

    # ---- payee (oracle.grammars.extract_payee + govrules/clean_payee) ----
    payee_raw = payee_raw_series(ftu)

    # government branch (oracle.govrules.enforce_payee_rule, gov callers only)
    payee_cleaned = pd.Series(None, index=idx, dtype="object")
    payee_cleaned[cat3] = "GOVERNMENT"
    if cat2.any():
        desig = pd.Series(None, index=idx, dtype="object")
        unset = cat2.copy()
        for d in vocab.OFFICER_DESIGNATIONS:
            if not unset.any():
                break
            hit = unset & ftu.str.contains(d, regex=False)
            desig[hit] = d
            unset &= ~hit
        pr_u = payee_raw.fillna("").str.upper()
        pr_has_desig = pd.Series(False, index=idx)
        for d in vocab.OFFICER_DESIGNATIONS:
            pr_has_desig |= pr_u.str.contains(d, regex=False)
        val = pd.Series("GOVERNMENT OFFICER", index=idx, dtype="object")
        m2 = desig.isna() & (payee_raw.fillna("").str.len() > 0) & pr_has_desig
        val[m2] = "GOVERNMENT - " + payee_raw[m2]
        m1 = desig.notna()
        val[m1] = "GOVERNMENT - " + desig[m1]
        payee_cleaned[cat2] = val[cat2]
    if cat1.any():
        ent = is_government_entity_series(payee_raw)
        v = payee_raw.copy()
        v[ent] = "GOVERNMENT"
        v[v.isna() | v.fillna("").str.len().eq(0)] = "XXX"
        payee_cleaned[cat1] = v[cat1]
    nongov = ~is_gov
    payee_cleaned[nongov] = "XXX"
    ng_has = nongov & payee_raw.notna() & (payee_raw.fillna("").str.len() > 0)
    if ng_has.any():  # clean chain (~100 replaces) only on actual payees
        payee_cleaned[ng_has] = clean_payee_series(payee_raw[ng_has])

    # ---- fields + MICR (oracle.grammars.extract_fields / extract_micr) ----
    dt = full_text.str.extract(_DATE_RE)
    field_date = (dt[0] + dt[1] + dt[2]).where(dt[0].notna())
    am = full_text.str.extract(_AMOUNT_RE, expand=False)
    field_amount = am.str.replace(",", "", regex=False)
    field_account = full_text.str.extract(_ACCOUNT_RE, expand=False)
    mi = full_text.str.extract(_MICR_RE)
    micr_city, micr_bank, micr_serial = mi[0], mi[1], mi[2]

    # ---- issuer (oracle.issuer.process_turn_issuer_v1) ----
    stext = ldf["raw"].str.strip()
    u_raw = stext.str.upper()
    cleaned = clean_v1_series(stext)

    # raw FOR scan: rare rows only (marker + conf gate), python per line in
    # order — first hit per turn wins (issuer_processor_v.py:467-481)
    scan_rows = (
        u_raw.str.contains(_MARKER_ALT, regex=True)
        & (ldf["conf"] >= threshold)
    )
    scan_name = pd.Series(None, index=idx, dtype="object")
    scan_conf = pd.Series(np.nan, index=idx)
    if scan_rows.any():
        for i in ldf.index[scan_rows]:
            r = int(ldf.at[i, "row"])
            if pd.notna(scan_name.iloc[r]):  # first hit per turn wins
                continue
            t = stext.at[i]
            u = u_raw.at[i]
            for marker in vocab.FOR_MARKERS:
                if marker in u:
                    candidate = t[u.find(marker) + len(marker):].strip()
                    if opred.looks_like_real_name(candidate):
                        scan_name.iloc[r] = candidate
                        scan_conf.iloc[r] = ldf.at[i, "conf"]
                        break

    # FOR-line candidates on cleaned text: rare rows, python per line
    # (issuer_processor_v.py:387-397 — break after first valid marker,
    # the line never reaches the normal path)
    is_for_line = cleaned.str.contains(_FOR_LINE_ALT, regex=True)
    cand_rows: list[int] = []
    cand_lineidx: list[int] = []
    cand_conf: list[float] = []
    cand_text: list[str] = []
    cand_isfor: list[bool] = []
    if is_for_line.any():
        for i in ldf.index[is_for_line]:
            t = cleaned.at[i]
            for marker in vocab.FOR_MARKERS:
                if marker in t:
                    parts = t.split(marker, 1)
                    if len(parts) > 1:
                        potential = parts[1].strip()
                        if opred.is_valid_drawer_v1(potential):
                            cand_rows.append(int(ldf.at[i, "row"]))
                            cand_lineidx.append(i)
                            cand_conf.append(float(ldf.at[i, "conf"]))
                            cand_text.append(potential)
                            cand_isfor.append(True)
                            break

    # normal candidates: the hot path, fully vectorized
    normal_mask = ~is_for_line & is_valid_drawer_v1_series(cleaned)
    ncand = pd.DataFrame({
        "row": ldf["row"][normal_mask],
        "lineidx": ldf.index[normal_mask],
        "conf": ldf["conf"][normal_mask],
        "text": cleaned[normal_mask],
    })

    # fuzzy: difflib once per DISTINCT candidate (J6)
    if len(ncand):
        uniq = ncand["text"].unique()
        memo = {t: ofz.match_name_v1(t, drawer_dict) for t in uniq}
        matched = ncand["text"].map({t: v[0] for t, v in memo.items()})
        sim = ncand["text"].map({t: v[1] for t, v in memo.items()})
        final_text = matched.fillna(ncand["text"]).astype("object")

        # scoring (issuer_processor_v.py:419-441, same float add order)
        score = ncand["conf"].copy()
        score[matched.notna()] = (
            score[matched.notna()] + (0.20 + 0.25 * sim[matched.notna()])
        )
        nw = final_text.str.count(r"\S+")
        score[(nw >= 2) & (nw <= 4)] += 0.15
        common, _bad = _word_stats(final_text.str.upper())
        hasc = common > 0
        score[hasc] = score[hasc] + 0.1 * common[hasc]
        susp = _contains_any(final_text, vocab.SUSPICIOUS_SCORE_TERMS)
        score[susp] -= 0.40
    else:
        final_text = pd.Series(dtype="object")
        score = pd.Series(dtype="float64")

    cands = pd.DataFrame({
        "row": pd.concat(
            [pd.Series(cand_rows, dtype="int64"), ncand["row"]],
            ignore_index=True,
        ),
        "lineidx": pd.concat(
            [pd.Series(cand_lineidx, dtype="int64"), ncand["lineidx"]],
            ignore_index=True,
        ),
        "conf": pd.concat(
            [pd.Series(cand_conf, dtype="float64"), ncand["conf"]],
            ignore_index=True,
        ),
        "text": pd.concat(
            [pd.Series(cand_text, dtype="object"), final_text],
            ignore_index=True,
        ),
        "score": pd.concat(
            [pd.Series([c + 0.3 for c in cand_conf], dtype="float64"), score],
            ignore_index=True,
        ),
    })

    issuer = pd.Series("XXX", index=idx, dtype="object")
    issuer_conf = pd.Series(0.0, index=idx)
    if len(cands):
        # oracle top-1: stable sort by score desc keeps earliest line among
        # ties — sort by line order then idxmax picks the first max
        cands = cands.sort_values(["row", "lineidx"], kind="stable")
        best = cands.loc[cands.groupby("row")["score"].idxmax()]
        gate = (
            (best["conf"] >= threshold)
            & looks_like_real_name_series(best["text"]).to_numpy()
        )
        best = best[gate]
        issuer.iloc[best["row"].to_numpy()] = best["text"].to_numpy()
        issuer_conf.iloc[best["row"].to_numpy()] = best["conf"].to_numpy()

    # raw FOR scan short-circuits everything
    hasscan = scan_name.notna()
    issuer[hasscan] = scan_name[hasscan]
    issuer_conf[hasscan] = scan_conf[hasscan]

    # ---- assemble (oracle.turn.extract_turn tail + empty-turn defaults) ----
    empty = ~has_lines
    out = pd.DataFrame({
        "conv_id": pdf["conv_id"].reset_index(drop=True),
        "turn_idx": pdf["turn_idx"].reset_index(drop=True),
        "main_text": content,
        "success": has_lines,
        "error": pd.Series(None, index=idx, dtype="object").mask(
            empty, "No text detected"
        ),
        "cheque_type": ctype.mask(empty, None),
        "is_government": is_gov & ~empty,
        "government_category": gov_cat.mask(empty, None),
        "payee_rule": payee_rule.mask(empty, None),
        "payee_raw": payee_raw.mask(empty, None),
        "payee_cleaned": payee_cleaned.mask(empty, "XXX"),
        "issuer": issuer.mask(empty, "XXX"),
        "issuer_conf": issuer_conf.mask(empty, 0.0),
        "confidence": confidence,
        "field_date": field_date.mask(empty, None),
        "field_amount": field_amount.mask(empty, None),
        "field_account": field_account.mask(empty, None),
        "micr_city": micr_city.mask(empty, None),
        "micr_bank": micr_bank.mask(empty, None),
        "micr_serial": micr_serial.mask(empty, None),
        "status": pd.Series(
            np.where(issuer.mask(empty, "XXX") != "XXX",
                     "AUTO-UPDATED", "REJECTED"),
            index=idx,
        ),
        "opr_no": vocab.FIXED_OPR_NO,
        "file_mark": vocab.FIXED_FILE_MARK,
    })
    return out


def extract_turns_vectorized(spark: SparkSession, transcripts: DataFrame,
                             drawer_dict: list[str],
                             threshold: float = oissuer.DEFAULT_THRESHOLD_V1
                             ) -> DataFrame:
    """mapInPandas wrapper: one Arrow pass, zero shuffles, vectorized."""
    from cheque_ocr_project_spark.operators.extract import (
        RESULT_SCHEMA,
        _ensure_parallelism,
    )

    # The byte-view fast path equates byte length with char length for the
    # matched-candidate gates; a non-ASCII dictionary name would silently
    # diverge from the oracle's char-length semantics, so the documented
    # ASCII contract is validated here, once, at engine entry.
    non_ascii = [n for n in drawer_dict if not n.isascii()]
    if non_ascii:
        raise ValueError(
            "vectorized engine requires an ASCII drawer_dict "
            f"(byte-length == char-length contract); offending names: "
            f"{non_ascii[:5]!r}"
        )

    bc = spark.sparkContext.broadcast(drawer_dict)

    def run(pdf_iter):
        dd = bc.value
        for pdf in pdf_iter:
            yield extract_batch(pdf, dd, threshold)

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    src = _ensure_parallelism(spark, transcripts.select(*cols))
    return src.mapInPandas(run, schema=RESULT_SCHEMA)
