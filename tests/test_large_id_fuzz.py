"""Large-id fuzz sweep (VERDICT r03 #7): every hash-keyed operator run on
ids up to 2^63-1, Spark vs DuckDB bit-for-bit.

Round 3 proved the int64-overflow bug class recurs: ``id * MIX`` wraps
silently in Spark above id ~3.47e9 while DuckDB raises — it was fixed in
``ivf_pivots`` and ``sampling.sample_bucket`` but initially missed in the
split hash of ``train_val_split``/``decontaminate`` (fixed round 4, the
pre-reduced ``pmod(pmod(id, P) * MIX, P)`` form). This sweep runs the full
contract query + oracle on a corpus whose ids straddle 2^31, 2^32, 2^40,
the 3.47e9 overflow threshold, 2^52 (double-mantissa edge) and 2^62/2^63-1
so any future raw-multiply regression fails here, not at 10^12 docs.

Ids are non-negative by contract (DuckDB ``%`` differs from Spark ``pmod``
on negatives — documented in operators/similarity.ivf_pivots).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from test_driver_contract import _canon

LARGE_IDS = [
    0, 1, 7, 999, 4095, 4096, 12345,
    2**31 - 1, 2**31, 2**32, 3_470_000_000, 2**40,
    2**45 + 17, 2**52 + 3, 2**62, 2**62 + 4097, 2**63 - 1,
]

# Texts engineered so the near-dup operators produce non-trivial output:
# two exact duplicates, one near-duplicate pair (long shared prefix), a
# short text, and distinct filler long enough for k=20 winnowing shingles.
_BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz in the village square under paper lanterns"
)
_TEXTS = [
    _BASE,
    _BASE,  # exact duplicate of row 0
    _BASE + " and the crowd hums along softly",  # near-duplicate
    "completely different content about maritime navigation charts "
    "and the careful calibration of brass instruments at sea",
    "short text",
    "numbers 12345 67890 repeated tokens tokens tokens in a medium "
    "length line for shingle coverage across the window",
    # dialect torture: vertical tab + form feed separators (Java/Python \s
    # include \x0b, RE2 \s does not — the oracles use an explicit ASCII
    # class so this row must stay bit-equal), plus \x1c/\x1d file/group
    # separators (whitespace to PYTHON str.split()/\s but not to Java or
    # RE2 — the contract tokenizer is the Java set, so these must be
    # treated as token characters by BOTH engines), bullet lines, ellipsis
    "alpha\x0bbeta gamma\fdelta words\x1chere\x1dtoo\n- bullet line one\n"
    "* bullet two\ntrailing thought...\nthe end of it all",
]
_SOURCES = ["src0", "src1", "src2", "src3", "web"]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("large_id_sf")
    docs = pd.DataFrame({
        "doc_id": pd.array(LARGE_IDS, dtype="int64"),
        "text": [_TEXTS[i % len(_TEXTS)] for i in range(len(LARGE_IDS))],
        "lang": ["en" if i % 3 else "de" for i in range(len(LARGE_IDS))],
        "source": [_SOURCES[i % len(_SOURCES)] for i in range(len(LARGE_IDS))],
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(d / "documents.parquet", index=False)

    rng = np.random.RandomState(41)
    emb = pd.DataFrame({
        "vec_id": pd.array(LARGE_IDS, dtype="int64"),
        "embedding": [
            rng.randn(64).astype("float32") for _ in LARGE_IDS
        ],
        "label": [i % 4 for i in range(len(LARGE_IDS))],
    })
    # one near-identical embedding pair so embedding_near_dup fires
    emb.at[1, "embedding"] = emb.at[0, "embedding"] + np.float32(1e-4)
    emb.to_parquet(d / "embeddings.parquet", index=False)

    events = pd.DataFrame({
        "event_id": pd.array(LARGE_IDS, dtype="int64"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta([i * 11 for i in range(len(LARGE_IDS))], unit="m"),
        "user_id": pd.array(
            [LARGE_IDS[(i * 5) % len(LARGE_IDS)] for i in range(len(LARGE_IDS))],
            dtype="int64",
        ),
        "event_type": [
            ["click", "purchase", "view", "signup", "error"][i % 5]
            for i in range(len(LARGE_IDS))
        ],
        "value": [round(1.5 * i, 2) for i in range(len(LARGE_IDS))],
        "props": ['{"k": %d}' % (i * 7 % 100) for i in range(len(LARGE_IDS))],
    })
    # microsecond timestamps: pandas defaults to nanos, which Spark's
    # parquet reader rejects (PARQUET_TYPE_ILLEGAL)
    events.to_parquet(
        d / "events.parquet", index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'"
        )
    return con


FUZZ_TABLES = {"documents", "embeddings", "events"}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# the r03 bug class lived in these; they must never drop out of the sweep
HASH_KEYED_CORE = {
    "train_val_split", "decontaminate", "stratified_sample",
    "pack_sequences", "winnow_fingerprint", "fingerprint", "dedup_exact",
    "minhash_near_dup", "simhash_near_dup", "ngram_jaccard_pairs",
    "near_dup_clusters", "corpus_filter",
    "ann_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_near_dup", "embedding_lsh_near_dup",
}


def _eligible_queries() -> list[str]:
    """Every oracle-backed query whose SQL references only the fuzz tables
    — the sweep auto-extends to future queries instead of relying on a
    hand-maintained list."""
    import re

    out = []
    for name, sql in entrymod.oracle_sql().items():
        used = {t for t in ALL_TABLES if re.search(rf"\b{t}\b", sql)}
        if used and used <= FUZZ_TABLES:
            out.append(name)
    return sorted(out)


def test_sweep_covers_hash_keyed_core():
    assert HASH_KEYED_CORE <= set(_eligible_queries())


@pytest.mark.parametrize("name", _eligible_queries())
def test_large_ids_match_duckdb(spark, fuzz_dir, fuzz_duck, name):
    sdf = entrymod.queries()[name](spark, fuzz_dir).toPandas()
    ddf = fuzz_duck.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    a, b = _canon(sdf), _canon(ddf)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        bad = [
            i for i, (x, y) in enumerate(zip(av, bv))
            if not ((pd.isna(x) and pd.isna(y)) or x == y
                    or (isinstance(x, float) and isinstance(y, float)
                        and abs(x - y) <= 2e-6))
        ]
        assert not bad, (
            f"{name}.{col}: {len(bad)} mismatches; first {bad[0]}: "
            f"spark={av[bad[0]]!r} duck={bv[bad[0]]!r}"
        )


def test_split_hash_no_overflow_at_max_id(spark, fuzz_dir):
    """The specific r03 finding: above doc_id ~3.47e9 the raw product
    doc_id * 2654435761 exceeds int64. The pre-reduced form must assign
    every id a bucket in [0, 100) without wrapping negative."""
    out = (
        entrymod.queries()["train_val_split"](spark, fuzz_dir)
        .toPandas()
    )
    assert len(out) == len(LARGE_IDS)
    assert out["bucket"].between(0, 99).all()
