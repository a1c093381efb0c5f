"""Deduplication operators for large-scale training-data pipelines.

Four families, each designed for the 100 TB shape:

- ``exact``        — hash-groupBy on a normalized fingerprint (1 shuffle)
- ``minhash_lsh``  — shingle → vectorized MinHash signature (Arrow UDF,
  numpy broadcasting) → band → bucket self-join → signature-estimated
  Jaccard. Only same-band rows ever meet in the join, so the candidate set
  is tiny relative to the n² cross space.
- ``simhash``      — 64-bit SimHash, banded by 16-bit chunks (pigeonhole:
  any pair within Hamming distance 3 shares at least one of 4 chunks) →
  exact Hamming verify.
- ``ngram_jaccard``— exact char-n-gram Jaccard as a native expression
  (array_intersect/array_union), used standalone on bounded candidate sets
  or as the verifier behind the LSH candidates.

All randomness is seeded/deterministic (fixed permutation constants) so
results are reproducible run-to-run and resumable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE_P = (1 << 61) - 1


def _perm_constants(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    if not text or len(text) < k:
        data = [text or ""]
    else:
        data = {text[i : i + k] for i in range(len(text) - k + 1)}
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8", "ignore")) for s in data),
        dtype=np.uint64, count=len(data),
    )


def normalize_text(col: Column) -> Column:
    """Shared normalization for dedup fingerprints: upper + ws collapse."""
    return F.trim(F.regexp_replace(F.upper(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fingerprint, keeper_id, n_dups): keep min-id per identical text."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 13) -> DataFrame:
    """id → array<long> MinHash signature (vectorized per Arrow batch)."""
    a, b = _perm_constants(num_perm, seed)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])

    def batches(pdf_iter):
        for pdf in pdf_iter:
            ids, sigs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                h = _shingle_hashes(text, shingle_k)
                # (num_perm, n_shingles) broadcast, min over shingles
                vals = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE_P
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
                ids.append(i)
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches, schema=schema
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.7,
                      seed: int = 13) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    est_jaccard = fraction of equal MinHash values across the full
    signature — an unbiased Jaccard estimator. Banding: signatures split
    into ``bands`` rows-per-band groups; pairs agreeing on any whole band
    become candidates (classic LSH S-curve)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, seed)
    sigs = sigs.withColumn("sig", F.col("sig"))

    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sigs.select("id", "sig", band_idx).withColumn(
        "band_key",
        F.xxhash64(
            F.col("band"),
            F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band),
        ),
    )

    left = banded.select(
        F.col("band_key"),
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
    )
    right = banded.select(
        F.col("band_key"),
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
    )
    cand = (
        left.join(right, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.size(F.col("sig_a"))
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       bits: int = 64) -> DataFrame:
    """id → 64-bit SimHash over whitespace tokens (vectorized)."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ])

    def batches(pdf_iter):
        weights = np.arange(bits, dtype=np.uint64)
        for pdf in pdf_iter:
            ids, hashes = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                tokens = (text or "").upper().split()
                if not tokens:
                    ids.append(i)
                    hashes.append(0)
                    continue
                th = np.fromiter(
                    (zlib.crc32(t.encode("utf-8", "ignore")) for t in tokens),
                    dtype=np.uint64, count=len(tokens),
                )
                # widen crc32 to 64 deterministic bits
                th = th * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
                bitmat = (th[:, None] >> weights[None, :]) & np.uint64(1)
                # signed arithmetic: uint64 would wrap on negative votes
                votes = bitmat.sum(axis=0).astype(np.int64) * 2 - len(tokens)
                sim = 0
                for j in range(bits):
                    if votes[j] > 0:
                        sim |= 1 << j
                ids.append(i)
                hashes.append(sim - (1 << bits) if sim >= (1 << (bits - 1)) else sim)
            yield pd.DataFrame({"id": ids, "simhash": hashes})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches, schema=schema
    )


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding by four 16-bit chunks: any pair within distance 3 agrees on at
    least one chunk (pigeonhole), so the join only meets same-chunk rows."""
    sigs = simhash_signatures(df, id_col, text_col)
    chunk = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("chunk")
    banded = sigs.select("id", "simhash", chunk).withColumn(
        "chunk_key",
        F.concat_ws(
            ":",
            F.col("chunk"),
            F.expr("shiftrightunsigned(simhash, chunk * 16) & 65535"),
        ),
    )
    left = banded.select("chunk_key", F.col("id").alias("id_a"),
                         F.col("simhash").alias("sim_a"))
    right = banded.select("chunk_key", F.col("id").alias("id_b"),
                          F.col("simhash").alias("sim_b"))
    cand = (
        left.join(right, "chunk_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams as a native array expression."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substr(col, i, F.lit(n)))
    )


def ngram_jaccard(col_a: Column, col_b: Column, n: int = 3) -> Column:
    """Exact Jaccard over distinct char n-grams, as native expressions."""
    ga, gb = char_ngrams(col_a, n), char_ngrams(col_b, n)
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    return F.round(F.try_divide(inter, union), 6)
