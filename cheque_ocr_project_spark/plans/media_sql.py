"""DuckDB oracle SQL for the multimodal stub-feature stages.

Mirrors operators/multimodal.py exactly: media derived from documents
(kind = doc_id mod 3; payload = utf-8 text bytes; meta from byte sizes),
stub decode seed = polyhash(text), features = integer formulas of
(seed, meta). Every step is exact integer arithmetic, so the driver
recomputes all three feature tables bit-for-bit."""

from __future__ import annotations

from cheque_ocr_project_spark.plans.dedup_sql import poly_sql

SEED = poly_sql("text", 7)
N = "octet_length(encode(text))"
WIDTH = f"(({N} % 640) + 32)"
HEIGHT = f"((({N} * 7) % 480) + 32)"
DURATION = f"((({N} * 31) % 60000) + 1000)"


def sql_media_image_features() -> str:
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, {SEED} AS seed,
         {WIDTH} AS w, {HEIGHT} AS h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       ((seed + 31 * w + 7 * h) % 256) / 255.0 AS mean_luma,
       ((seed * 13 + w + h) % 100) / 100.0 AS edge_density,
       'stub' AS decoder
FROM img"""


def sql_media_audio_features() -> str:
    return f"""
WITH aud AS (
  SELECT doc_id AS media_id, {SEED} AS seed, {N} AS n
  FROM documents WHERE doc_id % 3 = 1
)
SELECT media_id, CAST(16000 AS INT) AS sample_rate,
       ((seed * 17 + n) % 1000) / 1000.0 AS rms,
       CAST((seed * 7 + n * 3) % 1000 AS INT) AS zero_crossings
FROM aud"""


def sql_media_frame_sample(fps: float = 1.0) -> str:
    return f"""
WITH vid AS (
  SELECT doc_id AS media_id, {SEED} AS seed,
         greatest(1, CAST(floor({DURATION} / 1000.0 * {fps}) AS INT)) AS nf
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT media_id, seed, unnest(range(0, nf)) AS i FROM vid
)
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(floor(i * 1000 / {fps}) AS INT) AS ts_ms,
       ((seed >> (i % 24)) & 255) / 255.0 AS frame_luma
FROM frames"""
