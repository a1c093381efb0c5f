"""DuckDB oracle SQL for the embedding-LSH operators.

Renders the integer hyperplane spec of ``operators/similarity.py``
(quantize = floor(x*1000 + 0.5); coefficients in {-2..2} from an integer
hash; band code = sign bits of exact integer dot products) so the driver
recomputes the LSH candidate sets bit-for-bit. Dot products of quantized
vectors are sums of integers far below 2^53, so DuckDB's double-valued
``list_dot_product`` is exact for them."""

from __future__ import annotations

from cheque_ocr_project_spark.operators import similarity as SIM

QUANT = "list_transform({vec}, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5))"

COSINE = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)"
)


def _keys_array(dim: int, n_planes: int, n_bands: int, seed: int) -> str:
    """Array of 'b:code' band-key strings over a column named ``q``
    (the quantized vector, computed once per row by the enclosing SELECT)."""
    coeffs = SIM.plane_coeffs(dim, n_planes, n_bands, seed)
    bands = []
    for b in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(q, "
            f"{list(map(int, coeffs[b][p]))}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )
        bands.append(f"'{b}:' || CAST({bits} AS VARCHAR)")
    return f"[{', '.join(bands)}]"


def _sig_cte(src_sql: str, id_alias: str, vec: str, dim: int, n_planes: int,
             n_bands: int, seed: int,
             max_bucket: int | None = None) -> str:
    """(id, band_key) relation: quantize once per row, build the key array,
    unnest it. ``max_bucket`` mirrors dedup.cap_bucket_size on the Spark
    side; here band_key IS the band value (a 'b:code' string, no hashing),
    so the partition key is exactly the Spark cap key."""
    keys = _keys_array(dim, n_planes, n_bands, seed)
    q = QUANT.format(vec=vec)
    inner = f"""(
  SELECT {id_alias}, unnest(keys) AS band_key FROM (
    SELECT {id_alias}, {keys} AS keys FROM (
      SELECT {id_alias}, {q} AS q FROM {src_sql}
    )
  )
)"""
    if max_bucket is None:
        return inner
    # QUALIFY cannot sit on the unnest projection itself — wrap one level
    return f"""(
  SELECT {id_alias}, band_key FROM {inner}
  QUALIFY count(*) OVER (PARTITION BY band_key) <= {max_bucket}
)"""


def sql_ann_lsh_topk(dim: int = 64, k: int = 5, n_planes: int = 4,
                     n_bands: int = 24, seed: int = 29,
                     max_bucket: int | None = None,
                     multiprobe: bool = False) -> str:
    corpus_sig = _sig_cte("embeddings", "vec_id", "embedding",
                          dim, n_planes, n_bands, seed, max_bucket)
    query_sig = _sig_cte("q", "query_id", "qvec", dim, n_planes, n_bands, seed)
    sim = COSINE.format(a="e.embedding", b="qq.qvec")
    probe_cte = ""
    if multiprobe:
        # Hamming-1 multiprobe twin of similarity.lsh_topk(multiprobe=True):
        # each query band key probes itself plus every single-bit XOR flip
        # of its code — pure integer bit-math, identical on both engines.
        probe_cte = f""",
query_sig AS (
  SELECT DISTINCT query_id, band_key FROM (
    SELECT query_id, unnest([band_key] || list_transform(
      range(0, {n_planes}), p ->
        split_part(band_key, ':', 1) || ':' ||
        CAST(xor(CAST(split_part(band_key, ':', 2) AS BIGINT),
                 (CAST(1 AS BIGINT) << p)) AS VARCHAR)
    )) AS band_key
    FROM query_sig_exact
  )
)"""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
corpus_sig AS {corpus_sig},
{'query_sig_exact' if multiprobe else 'query_sig'} AS {query_sig}{probe_cte},
cand AS (
  SELECT DISTINCT qs.query_id, cs.vec_id
  FROM corpus_sig cs JOIN query_sig qs USING (band_key)
  WHERE cs.vec_id <> qs.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, {sim} AS sim
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q qq ON qq.query_id = c.query_id
)
SELECT query_id, neighbor_id, sim, rn FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}"""


def pivots_cte(n_pivots: int) -> str:
    """The hash-sampled pivot CTE — the load-bearing SQL mirror of
    operators/similarity.ivf_pivots (pre-reduced overflow-safe rank key,
    id tiebreak). sql_ann_ivf_topk and sql_kmeans_refine must rank by
    the IDENTICAL formula so their seed sets stay prefix-consistent
    (they pass different n_pivots: 16 vs 8), hence both render this
    single definition."""
    return f"""pivots AS (
  SELECT vec_id AS pivot_id, embedding AS pvec FROM embeddings
  ORDER BY ((vec_id % {SIM.IVF_PIVOT_MOD}) * {SIM.IVF_PIVOT_MIX})
             % {SIM.IVF_PIVOT_MOD} ASC, vec_id ASC
  LIMIT {n_pivots}
)"""


def sql_ann_ivf_topk(k: int = 5, n_pivots: int = 16, nprobe: int = 4) -> str:
    """IVF-flat twin of similarity.ivf_topk: hash-sampled pivots, argmax
    cell assignment, nprobe probing, exact re-rank — all with the round-4
    cosine + id tiebreaks the Spark side uses."""
    asim = COSINE.format(a="e.embedding", b="p.pvec")
    qsim = COSINE.format(a="q.qvec", b="p.pvec")
    sim = COSINE.format(a="e.embedding", b="qq.qvec")
    return f"""
WITH {pivots_cte(n_pivots)},
q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
assign AS (
  SELECT vec_id, pivot_id FROM (
    SELECT e.vec_id, p.pivot_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {asim} DESC, p.pivot_id ASC) AS pr
    FROM embeddings e CROSS JOIN pivots p
  ) WHERE pr = 1
),
probes AS (
  SELECT query_id, pivot_id FROM (
    SELECT q.query_id, p.pivot_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {qsim} DESC, p.pivot_id ASC) AS pr
    FROM q CROSS JOIN pivots p
  ) WHERE pr <= {nprobe}
),
cand AS (
  SELECT DISTINCT pr.query_id, a.vec_id
  FROM assign a JOIN probes pr USING (pivot_id)
  WHERE a.vec_id <> pr.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, {sim} AS sim
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q qq ON qq.query_id = c.query_id
)
SELECT query_id, neighbor_id, sim, rn FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}"""


def sql_embedding_lsh_near_dup(dim: int = 64, threshold: float = 0.3,
                               n_planes: int = 12, n_bands: int = 6,
                               seed: int = 29,
                               max_bucket: int | None = None) -> str:
    sig = _sig_cte("embeddings", "vec_id", "embedding",
                   dim, n_planes, n_bands, seed, max_bucket)
    sim = COSINE.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH sig AS {sig},
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM sig l JOIN sig r USING (band_key)
  WHERE l.vec_id < r.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b, {sim} AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}"""


def seed_assign_ctes(n_pivots: int) -> str:
    """The hash-sampled-pivot seed ASSIGNMENT chain (pivots → exploded
    integer micros → per-(vec, pivot) exact squared-L2 → argmin cell
    ``a0(vec_id, cluster0)``) — the load-bearing SQL mirror of
    similarity.seed_assignment, rendered from one definition so
    sql_kmeans_refine and sql_semantic_dedup can never disagree about
    what a cluster is (the same single-source rule as pivots_cte)."""
    return f"""{pivots_cte(n_pivots)}, vd0 AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(embedding) AS val
  FROM embeddings
), vd AS (
  SELECT vec_id, dim, CAST(floor(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT) AS pm FROM vd0
), pd0 AS (
  SELECT pivot_id, unnest(range(1, len(pvec) + 1)) AS dim,
         unnest(pvec) AS val
  FROM pivots
), pd AS (
  SELECT pivot_id, dim, CAST(floor(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT) AS pm FROM pd0
), d0 AS (
  SELECT v.vec_id, p.pivot_id,
         sum((v.pm - p.pm) * (v.pm - p.pm)) AS dist
  FROM vd v JOIN pd p USING (dim) GROUP BY v.vec_id, p.pivot_id
), a0 AS (
  SELECT vec_id, pivot_id AS cluster0 FROM (
    SELECT vec_id, pivot_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, pivot_id ASC) AS rn
    FROM d0
  ) WHERE rn = 1
)"""


def sql_semantic_dedup(n_pivots: int = 8, threshold: float = 0.3) -> str:
    """Twin of similarity.semantic_dedup: same seed cells
    (seed_assign_ctes), round-4 cosine over the raw float vectors among
    cell-mates, greedy smaller-id-wins survivor rule."""
    sim = COSINE.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH {seed_assign_ctes(n_pivots)},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM a0 a
  JOIN a0 b ON a.cluster0 = b.cluster0 AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE {sim} >= {threshold}
),
dropped AS (SELECT DISTINCT id_b FROM pairs)
SELECT a0.vec_id, a0.cluster0 AS cluster
FROM a0 ANTI JOIN dropped ON a0.vec_id = dropped.id_b"""


def sql_kmeans_refine(n_pivots: int = 8) -> str:
    """Twin of similarity.kmeans_refine: identical hash-sampled seeds,
    integer-micros distances, and offset floor-div centroids. DuckDB's
    sum(BIGINT) widens to HUGEINT, so the centroid mean and every
    squared-distance comparison happen in HUGEINT there — values are far
    below either bound, and cm is cast back to BIGINT to match Spark."""
    off = SIM.KM_OFFSET
    return f"""
WITH {seed_assign_ctes(n_pivots)}, cd AS (
  SELECT a0.cluster0 AS cluster, vd.dim,
         CAST((sum(vd.pm) + count(*) * {off}) // count(*) - {off} AS BIGINT)
           AS cm
  FROM vd JOIN a0 USING (vec_id) GROUP BY a0.cluster0, vd.dim
), d1 AS (
  SELECT vd.vec_id, cd.cluster,
         sum((vd.pm - cd.cm) * (vd.pm - cd.cm)) AS dist
  FROM vd JOIN cd USING (dim) GROUP BY vd.vec_id, cd.cluster
), a1 AS (
  SELECT vec_id, cluster AS cluster1 FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d1
  ) WHERE rn = 1
)
SELECT a0.vec_id, a0.cluster0, a1.cluster1,
       a0.cluster0 <> a1.cluster1 AS moved
FROM a0 JOIN a1 USING (vec_id)"""
