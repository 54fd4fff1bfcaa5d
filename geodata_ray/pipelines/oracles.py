"""DuckDB oracle SQL for every auditable ``queries()`` entry.

The verification half of the driver contract, split out of
``pipelines/queries.py`` (which keeps the Ray Data plans): each
constant here is the ANSI-SQL recomputation of one query's math over
the same parquet inputs (driver sf0.01 tables + the persisted fixture
parquet, ``pipelines/fixtures.py``).  The SQL is independent math, not
a restatement of the engine — hash rules in MEMORY/oracle docs.

Import order is free of cycles: this module pulls a handful of shared
corpus constants from ``queries`` at import time; ``queries`` exposes
these names back lazily via module ``__getattr__`` so existing
``queries.FOO_SQL`` imports keep working.
"""

from __future__ import annotations

import numpy as np

from geodata_ray.cellmath import qcell
from geodata_ray.pipelines.fixtures import fixture_path as _fxp
from geodata_ray.pipelines.queries import (
    REV_MICRO_SQL,
    _GEO_A,
    _GEO_B,
    _GEO_M,
    _MUT_OFFSET,
    _MUT_SUFFIX,
    _NDUP_LIMIT,
    _ORACLE_SF_DIR,
    _PIP_BOXES,
    _spline_profile_const,
)
from geodata_ray.stages import dedup as dedup_mod

def _derive_lat_sql(col: str) -> str:
    return f"((({col} * {_GEO_A}) % {_GEO_M}) / {_GEO_M} * 170.0 - 85.0)"


def _derive_lon_sql(col: str) -> str:
    return f"((({col} * {_GEO_B}) % {_GEO_M}) / {_GEO_M} * 360.0 - 180.0)"


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity)) AS BIGINT)             AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT)  AS sum_base_price_cents,
       CAST(ROUND(SUM(l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)
                                                          AS sum_disc_price_bp,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


TILES_R7_SQL = f"""
SELECT {qcell.cell_sql_expr(_derive_lat_sql('event_id'), _derive_lon_sql('event_id'), 7)} AS cell,
       COUNT(*) AS n_points
FROM events
GROUP BY 1
"""


BBOX_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {_derive_lat_sql('event_id')} AS lat0,
         {_derive_lon_sql('event_id')} AS lon0
  FROM events
)
SELECT event_id, lat0 AS lat, lon0 AS lon
FROM pts
WHERE lat0 BETWEEN -70.0 AND 70.0 AND (lon0 >= 120.0 OR lon0 <= -120.0)
"""


TOP10_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
"""


DAILY_SQL = """
SELECT user_id, DATE_TRUNC('day', ts) AS day,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


CUST_NATION_SQL = """
SELECT n_name, CAST(ROUND(SUM(c_acctbal) * 100) AS BIGINT) AS sum_acctbal_cents,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


SEGMENT_SQL = """
SELECT c_mktsegment, CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


NO_BIG_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


LANG_SQL = "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"


def _jaccard_pairs_cte(threshold: str) -> str:
    """CTE body (``corpus``, ``sh``, ``pairs``) computing the all-pairs
    exact 3-gram shingle Jaccard pairs over the mutation corpus —
    reused standalone by ``_jaccard_pairs_sql`` and composed under
    WITH RECURSIVE by the near-dup clusters oracle."""
    return f"""corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_NDUP_LIMIT}
  UNION ALL
  SELECT doc_id + {_MUT_OFFSET}, text || '{_MUT_SUFFIX}' FROM documents
  WHERE doc_id < {_NDUP_LIMIT}
),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])) AS s
  FROM corpus
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / len(list_distinct(a.s || b.s)) >= {threshold}
)"""


def _jaccard_pairs_sql(threshold: str) -> str:
    """All-pairs exact 3-gram shingle Jaccard over the mutation corpus
    — shared by the MinHash near-dup oracle (0.5) and the prefix-filter
    set-similarity join oracle (0.7)."""
    return f"""
WITH {_jaccard_pairs_cte(threshold)}
SELECT id_a, id_b FROM pairs
"""


NEAR_DUP_SQL = _jaccard_pairs_sql("0.5")


EMBEDDING_DUPS_SQL = f"""
WITH allv AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {_MUT_OFFSET},
         list_transform(embedding::DOUBLE[], x -> x + 0.01) FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.99
"""


ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
"""


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       len(list_filter(string_split(text, ' '),
           w -> w IN ('the','a','of','to','and','in','is','it')))::BIGINT
         AS n_stopwords
FROM documents
"""


HOURLY_SQL = """
SELECT event_type, DATE_TRUNC('hour', ts) AS window,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


SLIDING_SQL = """
WITH assigned AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS window_start FROM events
  UNION ALL
  SELECT event_type, DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR FROM events
)
SELECT event_type, window_start, COUNT(*) AS n_events
FROM assigned GROUP BY 1, 2
"""


TOP3_SEGMENT_SQL = """
WITH ranked AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, o_orderkey, o_totalprice, rank
FROM ranked WHERE rank <= 3
"""


SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE ((doc_id * {_GEO_A}) % {_GEO_M}) % 5 = 0
"""


_PIP_SQL_CASES = "\nUNION ALL\n".join(
    f"""SELECT event_id, '{pid}' AS poly_id FROM pts
WHERE lat0 > {a0} AND lat0 < {a1} AND lon0 > {o0} AND lon0 < {o1}"""
    for pid, a0, a1, o0, o1 in _PIP_BOXES
)


# zonal stats: same box containment, with the exact-cents measure
# carried through and aggregated per zone
_ZONAL_SQL_CASES = "\nUNION ALL\n".join(
    f"""SELECT '{pid}' AS poly_id, cents FROM pts
WHERE lat0 > {a0} AND lat0 < {a1} AND lon0 > {o0} AND lon0 < {o1}"""
    for pid, a0, a1, o0, o1 in _PIP_BOXES
)


PIP_BOXES_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {_derive_lat_sql('event_id')} AS lat0,
         {_derive_lon_sql('event_id')} AS lon0
  FROM events
)
{_PIP_SQL_CASES}
"""


ZONAL_STATS_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {_derive_lat_sql('event_id')} AS lat0,
         {_derive_lon_sql('event_id')} AS lon0,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
hits AS (
{_ZONAL_SQL_CASES}
)
SELECT poly_id, COUNT(*) AS n_points,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents,
       CAST(MAX(cents) AS BIGINT) AS max_value_cents
FROM hits GROUP BY poly_id
"""


KNN_ORACLE_SQL = f"""
WITH refs AS (
  SELECT r AS ref_id,
         40.0 + ((r * {_GEO_A}) % {_GEO_M}) / {_GEO_M} * 10.0 AS rlat,
         ((r * {_GEO_B}) % {_GEO_M}) / {_GEO_M} * 10.0 AS rlon
  FROM range(0, 300) t(r)
),
qs AS (
  SELECT event_id,
         42.0 + ((event_id * {_GEO_A}) % {_GEO_M}) / {_GEO_M} * 6.0 AS qlat,
         2.0 + ((event_id * {_GEO_B}) % {_GEO_M}) / {_GEO_M} * 6.0 AS qlon
  FROM events WHERE event_id < 200
),
d AS (
  SELECT event_id AS query_id, ref_id,
         2 * 6371.0088 * ASIN(SQRT(
           POWER(SIN(RADIANS(rlat - qlat) / 2), 2)
           + COS(RADIANS(qlat)) * COS(RADIANS(rlat))
             * POWER(SIN(RADIANS(rlon - qlon) / 2), 2))) AS dist
  FROM qs, refs
),
ranked AS (
  SELECT query_id, ref_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist, ref_id) AS rank
  FROM d
)
SELECT query_id, ref_id, rank FROM ranked WHERE rank <= 3
"""


ASOF_SQL = """
WITH right_d AS (
  SELECT o_custkey AS custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
),
left_e AS (
  SELECT event_id, ts, user_id % 150 + 1 AS custkey FROM events
)
SELECT e.event_id, r.o_orderkey
FROM left_e e
ASOF JOIN right_d r ON e.custkey = r.custkey AND e.ts >= r.o_orderdate
"""


RUNNING_SQL = """
SELECT event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_cents
FROM events
"""


_PIP_ANTI_COND = " AND ".join(
    f"NOT (lat0 > {a0} AND lat0 < {a1} AND lon0 > {o0} AND lon0 < {o1})"
    for _, a0, a1, o0, o1 in _PIP_BOXES
)


PIP_ANTI_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {_derive_lat_sql('event_id')} AS lat0,
         {_derive_lon_sql('event_id')} AS lon0
  FROM events
)
SELECT event_id FROM pts WHERE {_PIP_ANTI_COND}
"""


Q3_NATIVE_SQL = """
SELECT o_orderkey,
       CAST(ROUND(SUM(l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)
         AS revenue_bp
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue_bp DESC, o_orderkey ASC
LIMIT 10
"""


RANGE_JOIN_SQL = """
WITH e AS (
  SELECT event_id,
         TIMESTAMP '1995-01-01'
           + (((event_id * 2654435761) % 4294967296) % 200000000)
             * INTERVAL 1 SECOND AS ts,
         user_id % 150 + 1 AS custkey
  FROM events
)
SELECT e.event_id, o.o_orderkey
FROM e JOIN orders o
  ON e.custkey = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts <= o.o_orderdate + INTERVAL 30 DAY
"""


PROPS_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


PART_JOIN_SQL = """
SELECT p_brand, CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


_GRID_PQ = f"read_parquet('{_fxp('grid_120')}')"


_RASTER_PQ = {
    lay: f"read_parquet('{_fxp(f'raster_{lay}')}')"
    for lay in ("landcover", "slope", "scatter")
}


FINGERPRINT_SQL = """
WITH h AS (SELECT doc_id, md5(lower(text)) AS x FROM documents),
u AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(x,15,2), substr(x,13,2), substr(x,11,2),
                     substr(x,9,2), substr(x,7,2), substr(x,5,2),
                     substr(x,3,2), substr(x,1,2)) AS UBIGINT)::HUGEINT AS v
  FROM h
)
SELECT doc_id,
       CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
                 THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
         AS fingerprint
FROM u
"""

# per-key quota sample: ROW_NUMBER over the engine's Knuth sampling
# hash (exact integer arithmetic — BIGINT-safe on both sides)
STRATIFIED_SAMPLE_SQL = f"""
WITH r AS (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY (event_id * {_GEO_A}) % {_GEO_M}, event_id
         ) AS rk
  FROM events
)
SELECT event_type, event_id FROM r WHERE rk <= 20
"""

# streaming first-occurrence dedup: with a total arrival order (id
# ASC) the kept row per fingerprint is exactly min(doc_id)
STREAMING_DEDUP_SQL = """
WITH corpus AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 900000, lower(upper(text)) FROM documents
  WHERE doc_id < 100
),
f AS (SELECT doc_id, md5(t) AS x FROM corpus),
u AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(x,15,2), substr(x,13,2), substr(x,11,2),
                     substr(x,9,2), substr(x,7,2), substr(x,5,2),
                     substr(x,3,2), substr(x,1,2)) AS UBIGINT)::HUGEINT AS v
  FROM f
)
SELECT doc_id,
       CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
                 THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
         AS fingerprint
FROM u
QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint)
"""

# contamination: eval set = first 50 docs UPPERCASED with offset ids;
# normalized fingerprints (md5 of lower()) collide with the originals
CONTAMINATION_SQL = """
WITH corpus AS (SELECT doc_id, md5(lower(text)) AS x FROM documents),
ev AS (
  SELECT md5(lower(upper(text))) AS x FROM documents WHERE doc_id < 50
),
hits AS (SELECT c.doc_id, c.x FROM corpus c WHERE c.x IN (SELECT x FROM ev)),
u AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(x,15,2), substr(x,13,2), substr(x,11,2),
                     substr(x,9,2), substr(x,7,2), substr(x,5,2),
                     substr(x,3,2), substr(x,1,2)) AS UBIGINT)::HUGEINT AS v
  FROM hits
)
SELECT doc_id,
       CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
                 THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
         AS fingerprint
FROM u
"""


_U64_M = 1 << 64


_U63 = 1 << 63


def _sql_xor_u64(a: str, b: str) -> str:
    """xor of two u64-valued HUGEINT expressions via BIGINT two's
    complement (DuckDB xor() takes BIGINT)."""
    ai = f"CAST(CASE WHEN ({a}) >= {_U63} THEN ({a}) - {_U64_M} ELSE ({a}) END AS BIGINT)"
    bi = f"CAST(CASE WHEN ({b}) >= {_U63} THEN ({b}) - {_U64_M} ELSE ({b}) END AS BIGINT)"
    x = f"xor({ai}, {bi})"
    return f"(CASE WHEN {x} < 0 THEN {x}::HUGEINT + {_U64_M} ELSE {x}::HUGEINT END)"


def _sql_mulmod64(a: str, c: int) -> str:
    """(a * c) mod 2^64 without overflowing HUGEINT: split ``a`` into
    32-bit halves (each partial product < 2^96)."""
    lo = f"((({a}) % 4294967296) * {c})"
    hi = f"((((({a}) // 4294967296) * {c}) % 4294967296) * 4294967296)"
    return f"(({lo} + {hi}) % {_U64_M})"


def _token_hash_stages_sql(max_token_len: int) -> str:
    """The engine's FNV-offset + per-byte splitmix64 token hash
    (``dedup.hash_tokens_batch``) as ``max_token_len`` unrolled CTE
    stages over a ``toks(doc_id, tok)`` source: ``t0`` seeds the
    accumulator, ``t{{j}}`` absorbs byte ``j``; the final stage
    ``t{{max_token_len}}`` carries ``(doc_id, tok, acc)``.  Each stage
    is a chain of nested subqueries so every intermediate (z1..z5) is
    referenced by NAME — linear SQL size despite splitmix's repeated
    subterms.  Shared by the simhash and hashed-classifier oracles."""
    stages = [
        "t0 AS (SELECT doc_id, tok, "
        f"{dedup_mod._FNV_OFFSET}::HUGEINT AS acc FROM toks)"
    ]
    keep = "doc_id, tok, acc"
    for j in range(1, max_token_len + 1):
        x0 = _sql_xor_u64("acc", f"ascii(substr(tok, {j}, 1))::HUGEINT")
        z1 = f"((x0 + 11400714819323198485) % {_U64_M})"
        z2 = _sql_xor_u64("z1", "z1 // 1073741824")
        z3 = _sql_mulmod64("z2", 13787848793156543929)
        z4 = _sql_xor_u64("z3", "z3 // 134217728")
        z5 = _sql_mulmod64("z4", 10723151780598845931)
        z6 = _sql_xor_u64("z5", "z5 // 2147483648")
        stages.append(
            f"t{j} AS (\n"
            f" SELECT doc_id, tok, COALESCE({z6}, acc) AS acc FROM (\n"
            f"  SELECT {keep}, z1, z2, z3, z4, {z5} AS z5 FROM (\n"
            f"   SELECT {keep}, z1, z2, z3, {z4} AS z4 FROM (\n"
            f"    SELECT {keep}, z1, z2, {z3} AS z3 FROM (\n"
            f"     SELECT {keep}, z1, {z2} AS z2 FROM (\n"
            f"      SELECT {keep}, {z1} AS z1 FROM (\n"
            f"       SELECT {keep}, CASE WHEN length(tok) >= {j} "
            f"THEN {x0} ELSE NULL END AS x0 FROM t{j - 1}\n"
            f"      ))))))\n)"
        )
    return ",\n".join(stages)


def _token_guard_sql(label: str, max_token_len: int) -> str:
    """Fail-loud guard CTE: the per-byte unroll only covers
    ``max_token_len`` ASCII bytes; a longer or non-ASCII token would
    make the ORACLE (not the engine) compute a wrong hash."""
    return f"""guard AS (
  -- the per-byte unroll only covers {max_token_len} ASCII bytes; a
  -- longer or non-ASCII token would make the ORACLE (not the engine)
  -- compute a wrong hash — fail loudly instead of silently mismatching
  SELECT CASE WHEN MAX(strlen(tok)) > {max_token_len}
              OR MAX(CASE WHEN strlen(tok) <> length(tok)
                          THEN 1 ELSE 0 END) = 1
         THEN error('{label} oracle: corpus token exceeds the unrolled '
                    || '{max_token_len}-byte ASCII limit')
         ELSE 1 END AS ok
  FROM toks
)"""


def _simhash_sql(max_token_len: int = 24) -> str:
    """SimHash oracle: per-byte splitmix64 token-hash chain unrolled
    into ``max_token_len`` CTE stages (driver-corpus tokens are ASCII,
    max observed length 16), then bit votes per doc."""
    pow2 = ", ".join(f"({b}, {1 << b})" for b in range(64))
    stages_sql = _token_hash_stages_sql(max_token_len)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
{_token_guard_sql("simhash", max_token_len)},
{stages_sql},
bits AS (
  SELECT t.doc_id, pw.b, pw.p, CAST((t.acc // pw.p) % 2 AS INTEGER) AS bit
  FROM t{max_token_len} t
  CROSS JOIN (VALUES {pow2}) pw(b, p)
),
votes AS (
  SELECT doc_id, b, p, SUM(bit) AS v, COUNT(*) AS ntok
  FROM bits GROUP BY 1, 2, 3
),
sim0 AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * v > ntok THEN p::HUGEINT ELSE 0::HUGEINT END) AS s
  FROM votes GROUP BY 1
)
SELECT doc_id,
       CAST(CASE WHEN s >= {_U63} THEN s - {_U64_M} ELSE s END AS BIGINT)
         AS simhash
FROM sim0 CROSS JOIN guard
WHERE guard.ok = 1
"""


SIMHASH_SQL = _simhash_sql()


def _classifier_sql(
    max_token_len: int = 24,
    n_buckets: int | None = None,
    weight_a: int | None = None,
) -> str:
    """Hashed-linear classifier oracle: the SAME per-byte splitmix
    token-hash unroll as simhash, then bucket = acc % n_buckets,
    weight = (bucket * weight_a) % n_buckets - n_buckets/2, per-doc
    integer sum, threshold at 0.  Tokenization matches the engine's
    shared kernel (lower + single-space split; null text = '' -> one
    empty token)."""
    from geodata_ray.stages.textstats import _CLF_BUCKETS, _CLF_WEIGHT_A

    # single definition: the engine constants ARE the oracle constants
    n_buckets = _CLF_BUCKETS if n_buckets is None else n_buckets
    weight_a = _CLF_WEIGHT_A if weight_a is None else weight_a
    stages_sql = _token_hash_stages_sql(max_token_len)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(COALESCE(text, '')), ' ')) AS tok
  FROM documents
),
{_token_guard_sql("classifier", max_token_len)},
{stages_sql},
scored AS (
  SELECT doc_id,
         CAST(((acc % {n_buckets}) * {weight_a}) % {n_buckets}
              - {n_buckets // 2} AS BIGINT) AS w
  FROM t{max_token_len}
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS score
  FROM scored GROUP BY 1
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(score AS BIGINT) AS score,
       CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM agg CROSS JOIN guard
WHERE guard.ok = 1
"""


def _feature_hash_sql(n_buckets: int = 64, max_token_len: int = 24) -> str:
    """Hashing-trick collision-audit oracle: DISTINCT corpus tokens
    through the SAME per-byte splitmix token-hash unroll as the
    classifier, bucketed mod ``n_buckets``, then the bucket-load
    histogram."""
    stages_sql = _token_hash_stages_sql(max_token_len)
    return f"""
WITH toks AS (
  SELECT DISTINCT 0 AS doc_id, tok FROM (
    SELECT unnest(string_split(lower(COALESCE(text, '')), ' ')) AS tok
    FROM documents
  )
),
{_token_guard_sql("feature_hash", max_token_len)},
{stages_sql},
b AS (
  SELECT CAST(acc % {n_buckets} AS BIGINT) AS bucket,
         COUNT(*) AS n_terms
  FROM t{max_token_len} CROSS JOIN guard
  WHERE guard.ok = 1
  GROUP BY 1
)
SELECT CAST(n_terms AS BIGINT) AS load,
       CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM b GROUP BY 1
"""


TEMPERATURE_SQL = f"""
SELECT ts, lat, lon, CAST(temperature AS DOUBLE) - 273.15 AS temperature_c
FROM {_GRID_PQ}
"""


PM25_SQL = f"""
SELECT ts, lat, lon,
       1e9 * (CAST(dusmass25 AS DOUBLE) + CAST(sssmass25 AS DOUBLE)
              + CAST(bcsmass AS DOUBLE)
              + 1.4 * CAST(ocsmass AS DOUBLE)
              + 1.375 * CAST(so4smass AS DOUBLE)) AS pm25
FROM {_GRID_PQ}
"""


WINDDIR_SQL = f"""
WITH g AS (
  SELECT ts, lat, lon, CAST(ulml AS DOUBLE) AS u, CAST(vlml AS DOUBLE) AS v
  FROM {_GRID_PQ}
),
d AS (SELECT ts, lat, lon, u, v, degrees(atan(u / v)) AS base FROM g)
SELECT ts, lat, lon,
       CAST(ROUND((CASE WHEN v < 0.0 THEN base + 180.0
                        WHEN v > 0.0 AND u < 0.0 THEN base + 360.0
                        ELSE base END) * 1000000) AS BIGINT) AS winddir_udeg
FROM d
"""


# float32 wind speed at 50m + sanitized roughness, shared by the three
# hub-height queries (mirrors conversions.normalize_winds_batch +
# functions.wind.sanitize_roughness bit-for-bit: IEEE sqrt is
# correctly rounded, so f64-sqrt -> f32 matches numpy exactly)
_WND50_CTE = f"""
  SELECT ts, lat, lon,
         CAST(sqrt(CAST(u50m AS DOUBLE) * CAST(u50m AS DOUBLE)
                 + CAST(v50m AS DOUBLE) * CAST(v50m AS DOUBLE)) AS REAL)
           AS wnd50m,
         CASE WHEN CAST(roughness AS DOUBLE) <= 0.0 THEN 0.0002
              ELSE CAST(roughness AS DOUBLE) END AS z0,
         CAST(rhoa AS DOUBLE) AS rhoa_d
  FROM {_GRID_PQ}
"""


WINDSPD_SQL = f"""
WITH g AS ({_WND50_CTE})
SELECT ts, lat, lon,
       CAST(ROUND(CAST(wnd50m AS DOUBLE) * (ln(80.0 / z0) / ln(50.0 / z0))
                  * 1000000) AS BIGINT) AS wnd80m_umps
FROM g
"""


WINDWPD_SQL = f"""
WITH g AS ({_WND50_CTE})
SELECT ts, lat, lon,
       CAST(ROUND((0.5 * rhoa_d) * power(CAST(wnd50m AS DOUBLE), 3)
                  * 10000) AS BIGINT) AS wpd_x10k
FROM g
"""


def _interp_case_sql(x_expr: str, xs, ys) -> str:
    """np.interp as a CASE chain with full-precision literals — the
    same ``slope * (x - x0) + y0`` tree numpy evaluates."""
    parts = [f"CASE WHEN {x_expr} <= {float(xs[0])!r} THEN {float(ys[0])!r}"]
    for i in range(len(xs) - 1):
        x0, x1 = float(xs[i]), float(xs[i + 1])
        y0, y1 = float(ys[i]), float(ys[i + 1])
        parts.append(
            f"WHEN {x_expr} < {x1!r} THEN "
            f"(({y1!r} - {y0!r}) / ({x1!r} - {x0!r})) * ({x_expr} - {x0!r})"
            f" + {y0!r}"
        )
    parts.append(f"ELSE {float(ys[-1])!r} END")
    return "\n       ".join(parts)


def _wind_power_sql() -> str:
    from geodata_ray.functions import convert as C

    t = C.windturbine_smooth(C.TURBINES["fixture_1500kw"], None)
    case = _interp_case_sql("v80", t["V"], t["POW"] / t["P"])
    return f"""
WITH g AS ({_WND50_CTE}),
h AS (SELECT ts, lat, lon,
             CAST(wnd50m AS DOUBLE) * (ln(80.0 / z0) / ln(50.0 / z0)) AS v80
      FROM g)
SELECT ts, lat, lon,
       CAST(ROUND(({case}) * 1000000) AS BIGINT) AS cf_ppm
FROM h
"""


WIND_POWER_SQL = _wind_power_sql()


HEAT_DEMAND_SQL = f"""
WITH g AS (
  SELECT lat, lon, DATE_TRUNC('day', ts) AS day,
         CASE WHEN isnan(CAST(temperature AS DOUBLE)) THEN NULL
              ELSE CAST(temperature AS DOUBLE) END AS t
  FROM {_GRID_PQ}
),
d AS (SELECT lat, lon, day, AVG(t) AS t_daily FROM g GROUP BY 1, 2, 3)
SELECT lat, lon, day,
       CASE WHEN t_daily IS NULL THEN NULL
            ELSE 0.0 + GREATEST(1.0 * ((15.0 + 273.15) - t_daily), 0.0)
       END AS heat_demand
FROM d
"""


# --- PV / solar-thermal oracle SQL.  The whole solar chain (Michalsky
# position -> Reindl clearsky split -> transposition -> panel model)
# is mirrored expression-by-expression; numpy NaN maps to SQL NULL
# (DuckDB: 0/0 -> NULL, 0*NULL -> NULL, GREATEST/LEAST ignore NULL —
# exactly np.fmax/np.fmin's NaN-ignoring semantics), nan_to_num maps
# to COALESCE, and scalar trig CONSTANTS are inlined as numpy-computed
# literals.  Outputs are round(x*scale) BIGINT, which absorbs last-ulp
# libm differences in the trig chain.
def _solar_position_sql() -> str:
    """CTE chain computing (alt, az, atmo=influx_toa) per grid row —
    functions/pv.py solar_position mirrored with identical operation
    order (incl. the fmod-then-correct np.mod idiom for hour angle)."""
    pi = repr(float(np.pi))
    twopi = repr(float(2 * np.pi))
    return f"""
sp0 AS (
  SELECT ts, lat, lon,
         CAST(influx AS DOUBLE) AS influx_r,
         CAST(influx_toa AS DOUBLE) AS atmo,
         CAST(albedo AS DOUBLE) AS albedo_r,
         CAST(temperature AS DOUBLE) AS t_amb,
         epoch_us(ts) / 1e6 AS unixx
  FROM {_GRID_PQ}
),
sp1 AS (
  SELECT *,
         (unixx / 86400.0 + 2440587.5) - 2451545.0 AS n_,
         radians(lat) AS lat_r
  FROM sp0
),
sp2 AS (
  SELECT *,
         radians(357.528 + 0.9856003 * n_) AS g_,
         radians((280.460 + 0.9856474 * n_)
                 + 1.915 * sin(radians(357.528 + 0.9856003 * n_))
                 + 0.020 * sin(2 * radians(357.528 + 0.9856003 * n_)))
           AS ell,
         radians(23.439 - 4e-7 * n_) AS ep
  FROM sp1
),
sp3 AS (
  SELECT *,
         atan2(cos(ep) * sin(ell), cos(ell)) AS ra,
         ((6.697375 + (unixx % 86400.0) / 3600.0 + 0.0657098242 * n_)
          * 15.0 + lon) AS lmst,
         asin(sin(ep) * sin(ell)) AS dec
  FROM sp2
),
sp4 AS (
  SELECT *, radians(lmst) - ra + {pi} AS hx FROM sp3
),
sp5 AS (
  SELECT *, hx % {twopi} AS hm FROM sp4
),
sp6 AS (
  SELECT *,
         (CASE WHEN hm <> 0.0 AND hm < 0.0 THEN hm + {twopi} ELSE hm END)
           - {pi} AS h
  FROM sp5
),
sp7 AS (
  SELECT *,
         asin(LEAST(GREATEST(sin(lat_r) * sin(dec)
                             + cos(lat_r) * cos(dec) * cos(h), -1.0), 1.0))
           AS alt
  FROM sp6
),
sp8 AS (
  SELECT *,
         acos(LEAST(GREATEST(
           (sin(dec) * cos(lat_r) - cos(dec) * sin(lat_r) * cos(h))
           / cos(alt), -1.0), 1.0)) AS az0
  FROM sp7
),
sp9 AS (
  SELECT *,
         CASE WHEN h <= 0.0 THEN az0 ELSE {twopi} - az0 END AS az
  FROM sp8
)"""


def _tilted_simple_sql(slope_deg: float) -> str:
    """Clearsky split + simple transposition for a FIXED slope/south
    azimuth — mirrors diffuse_horizontal + tilted_irradiation(simple).
    Emits column ``irr``."""
    sin_s = repr(float(np.sin(np.deg2rad(slope_deg))))
    cos_s = repr(float(np.cos(np.deg2rad(slope_deg))))
    az_c = repr(float(np.deg2rad(180.0)))
    alt_thr = repr(float(np.deg2rad(1.0)))
    # np.fmin/np.fmax NaN-ignoring semantics via IS NULL guards
    f1v = "(1.020 - 0.254 * k + 0.0123 * sinalt)"
    f2v = "(1.400 - 1.749 * k + 0.177 * sinalt)"
    f3v = "(0.486 * k - 0.182 * sinalt)"
    return f"""
t0 AS (
  SELECT *,
         sin(alt) AS sinalt,
         GREATEST({sin_s} * cos(alt) * cos({az_c} - az)
                  + {cos_s} * sin(alt), 0.0) AS cosinc,
         LEAST(GREATEST(influx_r, 0.0), atmo) AS infc
  FROM sp9
),
t1 AS (
  SELECT *, infc / atmo AS k FROM t0
),
t2 AS (
  SELECT *,
         (CASE WHEN k > 0.0 AND k <= 0.3 THEN 1.0 ELSE 0.0 END)
           * (CASE WHEN {f1v} IS NULL THEN 1.0
                   ELSE LEAST(1.0, {f1v}) END)
         + (CASE WHEN k > 0.3 AND k < 0.78 THEN 1.0 ELSE 0.0 END)
           * LEAST(0.97, CASE WHEN {f2v} IS NULL THEN 0.1
                              ELSE GREATEST(0.1, {f2v}) END)
         + (CASE WHEN k >= 0.78 THEN 1.0 ELSE 0.0 END)
           * (CASE WHEN {f3v} IS NULL THEN 0.1
                   ELSE GREATEST(0.1, {f3v}) END)
           AS fraction
  FROM t1
),
t3 AS (
  SELECT *, infc * fraction AS diffuse FROM t2
),
t4 AS (
  SELECT *, infc - diffuse AS direct FROM t3
),
t5 AS (
  SELECT *,
         direct + diffuse AS total_i,
         (cosinc / sinalt) * direct AS direct_t,
         (1.0 + {cos_s}) / 2.0 * diffuse
           + albedo_r * (direct + diffuse) * ((1.0 - {cos_s}) / 2.0)
           AS diffuse_t
  FROM t4
),
t6 AS (
  SELECT *,
         CASE WHEN alt < {alt_thr} OR total_i <= 0.01 THEN 0.0
              ELSE COALESCE(direct_t, 0.0) + COALESCE(diffuse_t, 0.0)
         END AS irr
  FROM t5
)"""


def _pv_grid_sql() -> str:
    pc_ = {
        "k_1": -0.017162, "k_2": -0.040289, "k_3": -0.004681,
        "k_4": 0.000148, "k_5": 0.000169, "k_6": 0.000005,
    }
    eff = (
        "1 + ({k_1}) * lg + ({k_2}) * (lg * lg)"
        " + t_mod * (({k_3}) + ({k_4}) * lg + ({k_5}) * (lg * lg))"
        " + ({k_6}) * (t_mod * t_mod)"
    ).format(**pc_)
    return f"""
WITH {_solar_position_sql()},
{_tilted_simple_sql(30.0)},
h0 AS (
  SELECT *,
         (1.0 * t_amb + 0.035 * irr) - 25.0 AS t_mod,
         irr / 1000.0 AS gnorm
  FROM t6
),
h1 AS (
  SELECT *, CASE WHEN gnorm > 0.0 THEN ln(gnorm) ELSE NULL END AS lg FROM h0
),
h1b AS (
  SELECT *, {eff} AS eff0 FROM h1
),
h2 AS (
  -- np.nan_to_num(nan=0, neginf=0) then np.maximum(·, 0): parquet sea
  -- cells carry REAL NaN (not NULL) through t_amb, so guard both
  SELECT *,
         GREATEST(CASE WHEN eff0 IS NULL OR isnan(eff0) THEN 0.0
                       ELSE eff0 END, 0.0) AS eff
  FROM h1b
)
SELECT ts, lat, lon,
       CAST(ROUND(gnorm * eff * 0.9 * 1000000) AS BIGINT) AS pv_power_ppm
FROM h2
"""


def _solar_thermal_sql() -> str:
    return f"""
WITH {_solar_position_sql()},
{_tilted_simple_sql(45.0)},
s0 AS (
  SELECT *,
         irr * (0.8 - 3.0 * (((80.0 + 273.15) - t_amb) / irr)) AS raw_out
  FROM t6
)
SELECT ts, lat, lon,
       CAST(ROUND((CASE WHEN raw_out IS NULL OR isnan(raw_out)
                        OR raw_out <= 0.0
                        THEN 0.0 ELSE raw_out END) * 10000) AS BIGINT)
         AS solar_thermal_x10k
FROM s0
"""


def _pv_tracking_sql() -> str:
    """Bofinger panel + Hay-Davies transposition + latitude-optimal
    slope — the pv_tracking_grid chain mirrored per expression.
    Python-computed scalar constants (capacity, D*fraction/ta parts)
    are inlined as literals; sea-cell NaN temperatures surface as NULL
    BIGINT (matching the engine's NaN -> null scaled-int convention).
    """
    d25 = repr(float(np.deg2rad(25.0)))
    d50 = repr(float(np.deg2rad(50.0)))
    d031 = repr(float(np.deg2rad(0.31)))
    d40 = repr(float(np.deg2rad(40.0)))
    az_c = repr(float(np.deg2rad(180.0)))
    alt_thr = repr(float(np.deg2rad(1.0)))
    # bofinger constants (fixture_bofinger)
    A_, B_, C_, D_ = 1.1233, -3.106e-5, -0.0341, 0.00109
    NOCT, Tamb, Intc, Tstd, ta, inv, thr = (
        320.0, 293.0, 800.0, 298.0, 0.9, 0.93, 5.0,
    )
    frac = (NOCT - Tamb) / Intc
    capacity = (A_ + B_ * 1000.0 + C_ * float(np.log(1000.0))) * 1e3
    inv_over_cap = repr(float(inv / capacity))
    f1v = "(1.020 - 0.254 * k + 0.0123 * sinalt)"
    f2v = "(1.400 - 1.749 * k + 0.177 * sinalt)"
    f3v = "(0.486 * k - 0.182 * sinalt)"
    return f"""
WITH {_solar_position_sql()},
o0 AS (
  SELECT *,
         CASE WHEN lat_r <= {d25} THEN 0.87 * lat_r
              WHEN lat_r <= {d50} THEN 0.76 * lat_r + {d031}
              ELSE {d40} END AS slope_l
  FROM sp9
),
o1 AS (
  SELECT *, sin(slope_l) AS sin_s, cos(slope_l) AS cos_s,
         sin(alt) AS sinalt,
         LEAST(GREATEST(influx_r, 0.0), atmo) AS infc
  FROM o0
),
o2 AS (
  SELECT *,
         GREATEST(sin_s * cos(alt) * cos({az_c} - az)
                  + cos_s * sin(alt), 0.0) AS cosinc,
         infc / atmo AS k
  FROM o1
),
o3 AS (
  SELECT *,
         (CASE WHEN k > 0.0 AND k <= 0.3 THEN 1.0 ELSE 0.0 END)
           * (CASE WHEN {f1v} IS NULL THEN 1.0
                   ELSE LEAST(1.0, {f1v}) END)
         + (CASE WHEN k > 0.3 AND k < 0.78 THEN 1.0 ELSE 0.0 END)
           * LEAST(0.97, CASE WHEN {f2v} IS NULL THEN 0.1
                              ELSE GREATEST(0.1, {f2v}) END)
         + (CASE WHEN k >= 0.78 THEN 1.0 ELSE 0.0 END)
           * (CASE WHEN {f3v} IS NULL THEN 0.1
                   ELSE GREATEST(0.1, {f3v}) END)
           AS fraction
  FROM o2
),
o4 AS (SELECT *, infc * fraction AS diffuse FROM o3),
o5 AS (SELECT *, infc - diffuse AS direct FROM o4),
o6 AS (
  SELECT *,
         direct + diffuse AS total_i,
         sqrt(CASE WHEN direct + diffuse > 0.0
                   THEN direct / (direct + diffuse) ELSE 0.0 END) AS fhd,
         direct / atmo AS a_i,
         cosinc / sinalt AS r_b
  FROM o5
),
o7 AS (
  SELECT *,
         ((1.0 - a_i) * ((1 + cos_s) / 2.0)
          * (1.0 + fhd * power(sin(slope_l / 2.0), 3)) + a_i * r_b)
           * diffuse AS diffuse_t0,
         r_b * direct AS direct_t,
         total_i * albedo_r * (1.0 - cos_s) / 2.0 AS ground_t
  FROM o6
),
o8 AS (
  SELECT *,
         CASE WHEN diffuse_t0 IS NULL OR isnan(diffuse_t0)
                   OR diffuse_t0 < 0.0
              THEN 0.0 ELSE diffuse_t0 END AS diffuse_t
  FROM o7
),
o9 AS (
  SELECT *,
         CASE WHEN alt < {alt_thr} OR total_i <= 0.01 THEN 0.0
              ELSE direct_t + diffuse_t + ground_t END AS irr
  FROM o8
),
b0 AS (
  SELECT *,
         ({A_!r} + {B_!r} * irr
          + {C_!r} * (CASE WHEN irr > 0.0 THEN ln(irr) ELSE NULL END))
           AS eta_ref
  FROM o9
),
b1 AS (
  SELECT *,
         eta_ref * (1.0 + {D_!r} * ({frac!r} * irr + (t_amb - {Tstd!r})))
           / (1.0 + {D_!r} * {frac!r} / {ta!r} * eta_ref * irr) AS eta
  FROM b0
),
b2 AS (
  SELECT *,
         CASE WHEN irr < {thr!r} THEN 0.0
              ELSE irr * eta * {inv_over_cap} END AS pwr
  FROM b1
)
SELECT ts, lat, lon,
       CASE WHEN pwr IS NULL OR isnan(pwr) THEN NULL
            ELSE CAST(ROUND(pwr * 1000000) AS BIGINT) END AS pv_power_ppm
FROM b2
"""


PV_GRID_SQL = _pv_grid_sql()


SOLAR_THERMAL_SQL = _solar_thermal_sql()


PV_TRACKING_SQL = _pv_tracking_sql()


def _sql_splitmix_stages(prefix: str, x0_exprs: dict[str, str], src: str) -> str:
    """CTE chain applying ONE splitmix64 finalizer to each named input
    expression (HUGEINT u64), stage-by-stage so every intermediate is
    referenced by name (linear SQL size).  Emits columns ``h_<name>``
    in the final stage ``{prefix}6``."""
    names = list(x0_exprs)
    s0 = ", ".join(f"{x0_exprs[n]} AS x0_{n}" for n in names)
    stages = [f"{prefix}0 AS (SELECT *, {s0} FROM {src})"]
    exprs = [
        lambda c: f"(({c} + 11400714819323198485) % {_U64_M})",
        lambda c: _sql_xor_u64(c, f"{c} // 1073741824"),
        lambda c: _sql_mulmod64(c, 13787848793156543929),
        lambda c: _sql_xor_u64(c, f"{c} // 134217728"),
        lambda c: _sql_mulmod64(c, 10723151780598845931),
        lambda c: _sql_xor_u64(c, f"{c} // 2147483648"),
    ]
    prev = "x0"
    for j, fn in enumerate(exprs, 1):
        out = f"h" if j == len(exprs) else f"z{j}"
        cols = ", ".join(f"{fn(f'{prev}_{n}')} AS {out}_{n}" for n in names)
        stages.append(
            f"{prefix}{j} AS (SELECT *, {cols} FROM {prefix}{j - 1})"
        )
        prev = out
    return ",\n".join(stages)


def _image_ahash_sql(n: int = 200, n_content: int = 125, seed: int = 42) -> str:
    """Perceptual average-hash oracle: regenerates every pixel from
    the generator arithmetic (splitmix geometry + modular RGB
    formulas), replays the integer luma / 8x8 block / cross-multiplied
    mean-comparison hash, and counts copies per hash — end-to-end
    audit of the engine's PPM decode + aHash chain with zero floats."""
    x0 = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 7919}::HUGEINT")
    sm = _sql_splitmix_stages("ia", {"s": x0}, "c0")
    pow2 = ", ".join(f"({b}, {1 << b})" for b in range(64))
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n_content}) t(j)),
{sm},
geom AS (
  SELECT j, CAST(16 + (h_s % 48) AS BIGINT) AS w,
         CAST(16 + ((h_s // 256) % 48) AS BIGINT) AS h
  FROM ia6
),
imgs AS (SELECT i, i % {n_content} AS j FROM range(0, {n}) t(i)),
px AS (
  SELECT m.i, g.w, g.h, xs.x, ys.y,
         (((xs.x * 7 + m.j * 13) % 256) * 299
        + ((ys.y * 5 + m.j * 29) % 256) * 587
        + ((xs.x + ys.y + m.j) % 256) * 114) // 1000 AS luma
  FROM imgs m JOIN geom g USING (j)
  JOIN range(0, 64) xs(x) ON xs.x < g.w
  JOIN range(0, 64) ys(y) ON ys.y < g.h
),
blocks AS (
  SELECT i, (y * 8 // h) * 8 + (x * 8 // w) AS k,
         SUM(luma) AS s, COUNT(*) AS c
  FROM px GROUP BY 1, 2
),
tot AS (SELECT i, SUM(s) AS ts, SUM(c) AS tc FROM blocks GROUP BY 1),
bits AS (
  SELECT b.i, b.k,
         CASE WHEN b.s * t.tc >= t.ts * b.c THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t USING (i)
),
packed AS (
  SELECT i, SUM(CASE WHEN bit = 1 THEN p::HUGEINT
                     ELSE 0::HUGEINT END) AS u
  FROM bits JOIN (VALUES {pow2}) pw(b, p) ON pw.b = bits.k
  GROUP BY i
),
hh AS (
  SELECT i, CAST(CASE WHEN u >= {_U63} THEN u - {_U64_M} ELSE u END
                 AS BIGINT) AS ahash
  FROM packed
)
SELECT i AS image_id, ahash,
       COUNT(*) OVER (PARTITION BY ahash) AS n_copies
FROM hh
"""


def _resize_checksum_sql(n: int = 200, max_side: int = 24,
                         seed: int = 42) -> str:
    """Resize-audit oracle: regenerate source geometry (splitmix) and
    pixels (modular RGB), replay the integer half-even target dims and
    the x*w//nw nearest-neighbor index map, checksum the resized
    raster with position weights — all integers."""
    x0 = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 7919}::HUGEINT")
    sm = _sql_splitmix_stages("rz", {"s": x0}, "c0")
    ms = max_side
    def _dim(src: str) -> str:
        q = f"(({src} * {ms}) // m)"
        r = f"(({src} * {ms}) % m)"
        return (f"CASE WHEN m <= {ms} THEN {src} ELSE GREATEST(1, {q} + "
                f"CASE WHEN 2 * {r} > m OR (2 * {r} = m AND {q} % 2 = 1) "
                f"THEN 1 ELSE 0 END) END")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm},
geom AS (
  SELECT j AS image_id, CAST(16 + (h_s % 48) AS BIGINT) AS w,
         CAST(16 + ((h_s // 256) % 48) AS BIGINT) AS h
  FROM rz6
),
nd AS (
  SELECT image_id, w, h,
         {_dim('w')} AS nw, {_dim('h')} AS nh
  FROM (SELECT image_id, w, h, GREATEST(w, h) AS m FROM geom)
),
val AS (
  SELECT image_id, nw, nh,
         (((xs.x * w) // nw * 7 + image_id * 13) % 256)
       + 256 * (((ys.y * h) // nh * 5 + image_id * 29) % 256)
       + 65536 * (((xs.x * w) // nw + (ys.y * h) // nh + image_id) % 256)
           AS rgb,
         ys.y * nw + xs.x + 1 AS pos
  FROM nd JOIN range(0, 64) xs(x) ON xs.x < nw
          JOIN range(0, 64) ys(y) ON ys.y < nh
)
SELECT image_id, CAST(nw AS BIGINT) AS nw, CAST(nh AS BIGINT) AS nh,
       CAST(SUM(rgb * pos) AS BIGINT) AS checksum
FROM val GROUP BY 1, 2, 3
"""


def _audio_energy_sql(n: int = 100, seed: int = 42) -> str:
    """WAV-decode audit oracle: regenerate every int16 sample from the
    splitmix arithmetic (two unrolled chains: clip length, then
    per-sample value), frame at 256 samples, sum of squares — the
    audio analogue of the image pixel replay."""
    x_len = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 65537}::HUGEINT")
    sm_len = _sql_splitmix_stages("al", {"len": x_len}, "c0")
    x_s = _sql_xor_u64(
        "CAST(clip_id AS HUGEINT) * 1048576 + CAST(p AS HUGEINT)",
        f"{seed * 131071}::HUGEINT",
    )
    sm_s = _sql_splitmix_stages("asx", {"s": x_s}, "p0")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm_len},
clips AS (
  SELECT j AS clip_id, CAST(512 + (h_len % 1024) AS BIGINT) AS length
  FROM al6
),
p0 AS (
  SELECT clip_id, p FROM clips JOIN range(0, 1536) t(p) ON t.p < length
),
{sm_s},
sv AS (
  SELECT clip_id, p // 256 AS frame,
         CAST(h_s % 4096 AS BIGINT) - 2048 AS v
  FROM asx6
)
SELECT clip_id, CAST(frame AS BIGINT) AS frame,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM sv GROUP BY 1, 2
"""


def _scene_deltas_sql(n: int = 60, seed: int = 42) -> str:
    """Video cut-detection oracle: regenerate both adjacent frames'
    pixels from the generator arithmetic (frame content index =
    video*100 + frame) and replay the exact |delta| channel sum."""
    x0 = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 31337}::HUGEINT")
    sm = _sql_splitmix_stages("vd", {"k": x0}, "c0")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm},
vids AS (
  SELECT j AS video_id, CAST(4 + (h_k % 28) AS BIGINT) AS nf FROM vd6
),
pairs AS (
  SELECT video_id, f FROM vids JOIN range(1, 32) t(f) ON t.f < nf
),
px AS (
  SELECT video_id, f,
         video_id * 100 + f AS c1, video_id * 100 + f - 1 AS c0i,
         xs.x, ys.y
  FROM pairs JOIN range(0, 16) xs(x) ON true
             JOIN range(0, 12) ys(y) ON true
),
d AS (
  SELECT video_id, f,
         ABS((x * 7 + c1 * 13) % 256 - (x * 7 + c0i * 13) % 256)
       + ABS((y * 5 + c1 * 29) % 256 - (y * 5 + c0i * 29) % 256)
       + ABS((x + y + c1) % 256 - (x + y + c0i) % 256) AS dd
  FROM px
)
SELECT video_id, CAST(f AS BIGINT) AS frame_no,
       CAST(SUM(dd) AS BIGINT) AS delta
FROM d GROUP BY 1, 2
"""


def _decode_images_sql(n: int = 200, seed: int = 42, cells: int = 5) -> str:
    """Image-decode audit oracle (r5, rows-only conversion): regenerate
    geometry (splitmix) and every pixel (modular RGB arithmetic), then
    replay the x*cells//w column-cell channel sums — verifies header
    parse, dimensions and pixel bytes of the real PPM decode."""
    x0 = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 7919}::HUGEINT")
    sm = _sql_splitmix_stages("di", {"s": x0}, "c0")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm},
geom AS (
  SELECT j AS image_id, CAST(16 + (h_s % 48) AS BIGINT) AS w,
         CAST(16 + ((h_s // 256) % 48) AS BIGINT) AS h
  FROM di6
),
px AS (
  SELECT image_id, (xs.x * {cells}) // w AS cell,
         (xs.x * 7 + image_id * 13) % 256 AS r,
         (ys.y * 5 + image_id * 29) % 256 AS g,
         (xs.x + ys.y + image_id) % 256 AS b
  FROM geom JOIN range(0, 64) xs(x) ON xs.x < w
            JOIN range(0, 64) ys(y) ON ys.y < h
)
SELECT image_id, CAST(cell AS BIGINT) AS cell,
       CAST(SUM(r) AS BIGINT) AS r_sum,
       CAST(SUM(g) AS BIGINT) AS g_sum,
       CAST(SUM(b) AS BIGINT) AS b_sum
FROM px GROUP BY 1, 2
"""


def _audio_features_sql(n: int = 200, seed: int = 42) -> str:
    """WAV-feature audit oracle (r5, rows-only conversion): regenerate
    every int16 sample from the splitmix arithmetic, then replay the
    exact-integer waveform statistics (abs sum, zero crossings via
    LAG, peak).  A MATERIALIZED barrier sits between the splitmix
    chain and the window function so DuckDB cannot push the frame
    predicate down through the chain (round-4 lesson)."""
    x_len = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 65537}::HUGEINT")
    sm_len = _sql_splitmix_stages("fl", {"len": x_len}, "c0")
    x_s = _sql_xor_u64(
        "CAST(clip_id AS HUGEINT) * 1048576 + CAST(p AS HUGEINT)",
        f"{seed * 131071}::HUGEINT",
    )
    sm_s = _sql_splitmix_stages("fsx", {"s": x_s}, "p0")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm_len},
clips AS (
  SELECT j AS clip_id, CAST(512 + (h_len % 1024) AS BIGINT) AS length
  FROM fl6
),
p0 AS (
  SELECT clip_id, p FROM clips JOIN range(0, 1536) t(p) ON t.p < length
),
{sm_s},
sv AS MATERIALIZED (
  SELECT clip_id, p, CAST(h_s % 4096 AS BIGINT) - 2048 AS v
  FROM fsx6
),
lagd AS (
  SELECT clip_id, v,
         LAG(v) OVER (PARTITION BY clip_id ORDER BY p) AS pv
  FROM sv
)
SELECT clip_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
       CAST(SUM(CASE WHEN pv IS NOT NULL AND v * pv < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM lagd GROUP BY 1
"""


def _sample_frames_sql(n: int = 60, seed: int = 42) -> str:
    """Frame-sampling audit oracle (r5, rows-only conversion):
    regenerate every 4th frame's pixels (frame content index =
    video*100 + frame) and replay the exact integer r+g+b raster sum —
    verifies the byte-stream frame walk, the stride and the decode."""
    x0 = _sql_xor_u64("CAST(j AS HUGEINT)", f"{seed * 31337}::HUGEINT")
    sm = _sql_splitmix_stages("sf", {"k": x0}, "c0")
    return f"""
WITH c0 AS (SELECT j FROM range(0, {n}) t(j)),
{sm},
vids AS (
  SELECT j AS video_id, CAST(4 + (h_k % 28) AS BIGINT) AS nf FROM sf6
),
frames AS (
  SELECT video_id, f, video_id * 100 + f AS c
  FROM vids JOIN range(0, 32) t(f) ON t.f < nf AND t.f % 4 = 0
),
px AS (
  SELECT video_id, f,
         (x * 7 + c * 13) % 256 + (y * 5 + c * 29) % 256
         + (x + y + c) % 256 AS s
  FROM frames JOIN range(0, 16) xs(x) ON true
              JOIN range(0, 12) ys(y) ON true
)
SELECT video_id, CAST(f AS BIGINT) AS frame_no,
       CAST(SUM(s) AS BIGINT) AS pixel_sum
FROM px GROUP BY 1, 2
"""



def _checksum_sql() -> str:
    """Per-day anti-entropy checksum: the same unrolled splitmix64
    chain over event ids, summed mod 2^40 per day (HUGEINT sum, one
    final mod — identical residue to the engine's per-batch mod-then-
    sum plan)."""
    sm = _sql_splitmix_stages("ck", {"e": "CAST(event_id AS HUGEINT)"}, "c0")
    m = 1 << 40
    return f"""
WITH c0 AS (SELECT event_id, ts FROM events),
{sm}
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
       CAST(SUM(h_e % {m}) % {m} AS BIGINT) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM ck6 GROUP BY 1
"""


def _hll_sql() -> str:
    """HLL register table over events.user_id: unrolled splitmix64 +
    exact trailing-zero rank (p=12; 2^52 = 4503599627370496)."""
    sm = _sql_splitmix_stages("hl", {"u": "uid"}, "d0")
    return f"""
WITH d0 AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid FROM events),
{sm},
r AS (SELECT CAST(h_u // 4503599627370496 AS BIGINT) AS register,
             CAST(h_u % 4503599627370496 AS BIGINT) AS w FROM hl6),
rk AS (SELECT register,
              CASE WHEN w = 0 THEN 53
                   ELSE bit_count((w & -w) - 1) + 1 END AS rank
       FROM r)
SELECT register, CAST(MAX(rank) AS BIGINT) AS max_rank
FROM rk GROUP BY register
"""


def _near_dup_clusters_sql() -> str:
    """Near-dup cluster sizes: the exact Jaccard pair CTEs composed
    under WITH RECURSIVE with a reachability closure — each node's
    cluster id is the MIN node reachable from it (bounded: the gate
    corpus yields a few hundred pairs, so the closure is tiny)."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_cte("0.5")},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
root AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM root GROUP BY 1
"""


def _hll_merge_sql() -> str:
    """Two-audience HLL register state + union merge: the same
    unrolled splitmix64 + trailing-zero rank as ``_hll_sql``, with
    event_type carried through and pivoted by conditional MAX (absent
    registers coalesce to rank 0, the estimator's zero-register
    convention)."""
    sm = _sql_splitmix_stages("hm", {"u": "uid"}, "d0")
    return f"""
WITH d0 AS (
  SELECT DISTINCT event_type, CAST(user_id AS HUGEINT) AS uid
  FROM events WHERE event_type IN ('view', 'click')
),
{sm},
r AS (SELECT event_type,
             CAST(h_u // 4503599627370496 AS BIGINT) AS register,
             CAST(h_u % 4503599627370496 AS BIGINT) AS w FROM hm6),
rk AS (SELECT event_type, register,
              CASE WHEN w = 0 THEN 53
                   ELSE bit_count((w & -w) - 1) + 1 END AS rank
       FROM r)
SELECT register,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'view'
                              THEN rank END), 0) AS BIGINT)
           AS rank_view,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'click'
                              THEN rank END), 0) AS BIGINT)
           AS rank_click,
       CAST(MAX(rank) AS BIGINT) AS rank_union
FROM rk GROUP BY register
"""


def _kmv_sql(k: int = 64) -> str:
    """KMV bottom-k sketch state: unrolled splitmix64 of the distinct
    user ids, converted to the SIGNED int64 bit view (the engine's
    hash-column convention), ranked ascending, lowest k kept."""
    sm = _sql_splitmix_stages("kv", {"u": "uid"}, "d0")
    return f"""
WITH d0 AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid
            FROM events),
{sm},
s AS (
  SELECT CAST(CASE WHEN h_u >= 9223372036854775808
                   THEN h_u - 18446744073709551616
                   ELSE h_u END AS BIGINT) AS hash_i64
  FROM kv6
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY hash_i64) AS BIGINT) AS rank,
       hash_i64
FROM s ORDER BY hash_i64 LIMIT {k}
"""


def _hilbert_sql(order: int = 15) -> str:
    """Hilbert xy2d replayed as an unrolled CTE chain: one stage per
    bit (constant s per stage), each applying the flip+rotate and
    accumulating ``d`` — pure int64 ops, bit-identical to the numpy
    loop in ``queries.hilbert_xy2d``."""
    stages = []
    prev = "q0"
    for k in range(order):
        s = 1 << (order - 1 - k)
        cur = f"hb{k}"
        stages.append(f"""{cur} AS (
  SELECT event_id,
         CASE WHEN (y & {s}) > 0 THEN x
              WHEN (x & {s}) > 0 THEN {s} - 1 - y
              ELSE y END AS x,
         CASE WHEN (y & {s}) > 0 THEN y
              WHEN (x & {s}) > 0 THEN {s} - 1 - x
              ELSE x END AS y,
         d + {s * s} * xor(
             3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
             CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
  FROM {prev}
)""")
        prev = cur
    chain = ",\n".join(stages)
    return f"""
WITH q0 AS (
  SELECT event_id,
         CAST(FLOOR(({_derive_lon_sql('event_id')} + 180.0)
                    / 360.0 * 32768.0) AS BIGINT) AS x,
         CAST(FLOOR(({_derive_lat_sql('event_id')} + 90.0)
                    / 180.0 * 32768.0) AS BIGINT) AS y,
         CAST(0 AS BIGINT) AS d
  FROM events
),
{chain}
SELECT event_id, CAST(d AS BIGINT) AS hkey FROM {prev}
"""


def _pseudonymize_sql(seed: int) -> str:
    """Signed int64 view of splitmix64(user_id + seed) per event."""
    sm = _sql_splitmix_stages("ps", {"t": "x0v"}, "d0")
    return f"""
WITH d0 AS (
  SELECT event_id,
         (CAST(user_id AS HUGEINT) + {seed}) % {_U64_M} AS x0v
  FROM events
),
{sm}
SELECT event_id,
       CAST(CASE WHEN h_t >= 9223372036854775808
                 THEN h_t - 18446744073709551616
                 ELSE h_t END AS BIGINT) AS user_token
FROM ps6
"""


def _zipf_sql() -> str:
    """Top-100 term rank/frequency state with fixed-point qlog2 of
    both — the same deterministic integer-log recursion as the TF-IDF
    / PMI oracles (16 square-and-truncate rounds)."""
    return """
WITH RECURSIVE tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
top AS (
  SELECT term, n,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT)
             AS rank
  FROM tc ORDER BY n DESC, term LIMIT 100
),
-- explicit DISTINCT over UNION ALL: under WITH RECURSIVE, DuckDB 1.0
-- gives a plain UNION between CTE branches recursive-union semantics
-- and fails to dedup values appearing in both branches
vals AS (SELECT DISTINCT c FROM (
           SELECT n AS c FROM top
           UNION ALL SELECT rank FROM top)),
it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT)
                       << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM vals
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
),
q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16)
SELECT top.rank, top.term, top.n,
       CAST(qr.qlog2 AS BIGINT) AS qlog2_rank_fp,
       CAST(qn.qlog2 AS BIGINT) AS qlog2_n_fp
FROM top JOIN q qr ON qr.c = top.rank JOIN q qn ON qn.c = top.n
"""


def _dbscan_sql() -> str:
    """DBSCAN (eps=32, minPts=5) replayed in SQL: the radius-join band
    self-join (both directions), degree counts, core set, reachability
    closure over core-core edges for cluster ids (min core id —
    components are small at gate scale by parameter choice), border =
    min adjacent core label, everything else noise."""
    sm = _sql_splitmix_stages(
        "db",
        {
            "x": "CAST(event_id AS HUGEINT)",
            "y": _sql_xor_u64(
                "CAST(event_id AS HUGEINT)",
                str(0xD1B54A32D192ED03) + "::HUGEINT",
            ),
        },
        "c0",
    )
    return f"""
WITH RECURSIVE c0 AS (SELECT event_id FROM events),
{sm},
p AS (
  SELECT event_id AS id,
         CAST(h_x % 4096 AS BIGINT) AS qx,
         CAST(h_y % 4096 AS BIGINT) AS qy
  FROM db6
),
e0 AS (
  SELECT a.id AS u, b.id AS v
  FROM p a JOIN p b
    ON a.id <> b.id
   AND b.qx BETWEEN a.qx - 32 AND a.qx + 32
   AND b.qy BETWEEN a.qy - 32 AND a.qy + 32
   AND (a.qx - b.qx) * (a.qx - b.qx)
     + (a.qy - b.qy) * (a.qy - b.qy) <= 1024
),
deg AS (SELECT u AS id, COUNT(*) AS d FROM e0 GROUP BY 1),
core AS (SELECT id FROM deg WHERE d + 1 >= 5),
ce AS (SELECT u, v FROM e0
       WHERE u IN (SELECT id FROM core)
         AND v IN (SELECT id FROM core)),
nodes AS (SELECT DISTINCT u AS id FROM ce),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, e.v FROM reach JOIN ce e ON e.u = reach.r
),
ccm AS (SELECT id, MIN(r) AS l FROM reach GROUP BY id),
core_label AS (
  SELECT core.id, COALESCE(ccm.l, core.id) AS label
  FROM core LEFT JOIN ccm ON ccm.id = core.id
),
border AS (
  SELECT e0.u AS id, MIN(cl.label) AS label
  FROM e0 JOIN core_label cl ON cl.id = e0.v
  WHERE e0.u NOT IN (SELECT id FROM core)
  GROUP BY 1
)
SELECT e.event_id,
       CAST(CASE WHEN cl.id IS NOT NULL THEN 0
                 WHEN b.id IS NOT NULL THEN 1
                 ELSE 2 END AS BIGINT) AS role,
       CAST(COALESCE(cl.label, b.label, -1) AS BIGINT) AS label
FROM events e
LEFT JOIN core_label cl ON cl.id = e.event_id
LEFT JOIN border b ON b.id = e.event_id
"""


def _merkle_sql(levels: int = 6) -> str:
    """Merkle tree replay: leaf = SUM of splitmix64(id * 2^20 + cents)
    mod 2^64 per (event_id %% 64) bucket (series-joined so empty
    buckets are zero), parent = splitmix64(left + 3 * right) — each
    level's hash is one more unrolled splitmix chain."""
    leaf_expr = ("((CAST(event_id AS HUGEINT) * 1048576"
                 " + CAST(ROUND(value * 100) AS HUGEINT))"
                 f" % {_U64_M} + {_U64_M}) % {_U64_M}")
    sm0 = _sql_splitmix_stages("mk", {"h": leaf_expr}, "c0")
    parts = [f"""c0 AS (SELECT event_id, value FROM events),
{sm0},
lraw AS (
  SELECT CAST(event_id % 64 AS BIGINT) AS idx,
         CAST(SUM(h_h) % {_U64_M} AS HUGEINT) AS h
  FROM mk6 GROUP BY 1
),
lv0 AS (
  SELECT g.idx, COALESCE(lraw.h, 0::HUGEINT) AS h
  FROM (SELECT UNNEST(generate_series(0, 63)) AS idx) g
  LEFT JOIN lraw ON lraw.idx = g.idx
)"""]
    for L in range(1, levels + 1):
        pair = (f"pl{L} AS (SELECT l.idx // 2 AS idx,"
                f" (l.h + 3 * r.h) % {_U64_M} AS x0v"
                f" FROM lv{L - 1} l JOIN lv{L - 1} r"
                f" ON r.idx = l.idx + 1 AND l.idx % 2 = 0)")
        smL = _sql_splitmix_stages(f"m{L}x", {"v": "x0v"}, f"pl{L}")
        parts.append(f"{pair},\n{smL},\n"
                     f"lv{L} AS (SELECT idx, h_v AS h FROM m{L}x6)")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({L} AS BIGINT) AS level, CAST(idx AS BIGINT)"
        f" AS idx,"
        f" CAST(CASE WHEN h >= 9223372036854775808"
        f" THEN h - 18446744073709551616 ELSE h END AS BIGINT)"
        f" AS hash_i64 FROM lv{L}"
        for L in range(levels + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


def _mmr_sql(k: int = 10, topn: int = 20) -> str:
    """MMR greedy rerank replayed as a LIST-CARRYING recursive CTE:
    inside a recursive CTE the self-reference only sees the previous
    iteration, so the selected set rides along as a list column;
    each step's argmax(rel - max sim to selected) is a correlated
    order-by/limit over the bounded candidate set."""
    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, g.i AS dim,
         CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024) AS BIGINT)
             AS q
  FROM embeddings CROSS JOIN LATERAL (
    SELECT UNNEST(generate_series(1, 64)) AS i
  ) g
),
q0 AS (SELECT dim, q FROM e WHERE vec_id = 0),
rel AS (
  SELECT e.vec_id AS id, CAST(SUM(e.q * q0.q) AS BIGINT) AS rel
  FROM e JOIN q0 USING (dim) WHERE e.vec_id <> 0 GROUP BY 1
),
cand AS (SELECT id, rel FROM rel ORDER BY rel DESC, id LIMIT {topn}),
sym AS (
  SELECT ea.vec_id AS a, eb.vec_id AS b,
         CAST(SUM(ea.q * eb.q) AS BIGINT) AS s
  FROM e ea JOIN e eb ON ea.dim = eb.dim AND ea.vec_id <> eb.vec_id
  WHERE ea.vec_id IN (SELECT id FROM cand)
    AND eb.vec_id IN (SELECT id FROM cand)
  GROUP BY 1, 2
),
sel(k, picked, chosen) AS (
  SELECT 1,
         (SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1),
         [(SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1)]
  UNION ALL
  SELECT k + 1, nxt, list_append(chosen, nxt)
  FROM (
    SELECT k, chosen,
      (SELECT c.id FROM cand c
       WHERE NOT list_contains(sel.chosen, c.id)
       ORDER BY c.rel - COALESCE(
                 (SELECT MAX(sym.s) FROM sym
                  WHERE sym.a = c.id
                    AND list_contains(sel.chosen, sym.b)), 0)
                DESC, c.id
       LIMIT 1) AS nxt
    FROM sel
  ) WHERE k < {k} AND nxt IS NOT NULL
)
SELECT CAST(sel.k AS BIGINT) AS k, sel.picked AS vec_id,
       cand.rel AS rel_q
FROM sel JOIN cand ON cand.id = sel.picked
"""


def _dedup_canonical_sql() -> str:
    """Near-dup clusters (reachability closure) joined with member
    text lengths; representative = (longest, then smallest id)."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_cte("0.5")},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
root AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
lens AS (SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS n
         FROM corpus),
best AS (
  SELECT root.cluster_id, root.id,
         ROW_NUMBER() OVER (PARTITION BY root.cluster_id
                            ORDER BY lens.n DESC, root.id) AS rk
  FROM root JOIN lens USING (id)
)
SELECT root.id AS doc_id, b.id AS canonical_id
FROM root JOIN (SELECT cluster_id, id FROM best WHERE rk = 1) b
  USING (cluster_id)
"""


def _fold_leakage_sql() -> str:
    """Cross-fold near-duplicate pairs (fold = doc_id %% 5) over the
    exact Jaccard pair CTEs."""
    return f"""
WITH {_jaccard_pairs_cte("0.5")}
SELECT id_a, id_b,
       CAST((id_a // 7) % 5 AS BIGINT) AS fold_a,
       CAST((id_b // 7) % 5 AS BIGINT) AS fold_b
FROM pairs WHERE (id_a // 7) % 5 <> (id_b // 7) % 5
"""


def _bloom_part_sql(d: int = 4, lw: int = 12, nparts: int = 16) -> str:
    """Partition-level Bloom index audit: per-partition DISTINCT bit
    tables (the partitioned-Bloom hashing of ``_bloom_sql``, keyed by
    ``event_id %% nparts``), probe users' bits via the same chain, hit
    = all d bits present; exact presence from a filtered distinct."""
    salt = 0x9E3779B97F4A7C15
    x0 = {
        f"j{j}": f"((uid + {j * salt % (1 << 64)}) % {_U64_M})"
        for j in range(d)
    }
    sm = _sql_splitmix_stages("bp", x0, "d0")
    smq = _sql_splitmix_stages("bq", x0, "q0")
    div = 1 << (64 - lw)
    arms = "\nUNION ALL\n".join(
        f"SELECT part, {j * (1 << lw)} + h_j{j} // {div} AS bit"
        f" FROM bp6"
        for j in range(d)
    )
    qarms = "\nUNION ALL\n".join(
        f"SELECT pu, {j * (1 << lw)} + h_j{j} // {div} AS bit"
        f" FROM bq6"
        for j in range(d)
    )
    probes = ", ".join(f"({p})" for p in (1, 3, 5, 7, 911))
    return f"""
WITH d0 AS (
  SELECT DISTINCT CAST(event_id % {nparts} AS BIGINT) AS part,
         CAST(user_id AS HUGEINT) AS uid
  FROM events
),
{sm},
pbits AS (SELECT DISTINCT part, CAST(bit AS BIGINT) AS bit
          FROM ({arms})),
q0 AS (SELECT pu, CAST(pu AS HUGEINT) AS uid
       FROM (VALUES {probes}) p(pu)),
{smq},
qbits AS (SELECT pu, CAST(bit AS BIGINT) AS bit FROM ({qarms})),
grid AS (
  SELECT q.pu, g.part
  FROM (SELECT DISTINCT pu FROM q0) q,
       (SELECT UNNEST(generate_series(0, {nparts - 1})) AS part) g
),
pres AS (
  SELECT DISTINCT CAST(event_id % {nparts} AS BIGINT) AS part, user_id
  FROM events WHERE user_id IN (1, 3, 5, 7, 911)
)
SELECT CAST(grid.pu AS BIGINT) AS probe_user,
       CAST(grid.part AS BIGINT) AS part,
       CAST(CASE WHEN (SELECT COUNT(*) FROM qbits
                       JOIN pbits ON pbits.part = grid.part
                                 AND pbits.bit = qbits.bit
                       WHERE qbits.pu = grid.pu) = {d}
                 THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM pres
                              WHERE pres.part = grid.part
                                AND pres.user_id = grid.pu)
                 THEN 1 ELSE 0 END AS BIGINT) AS present
FROM grid
"""


def _hll_keyed_sql() -> str:
    """Keyed (per-day) HLL register table — the same unrolled splitmix
    + trailing-zero rank as ``_hll_sql``, grouped by day as well."""
    sm = _sql_splitmix_stages("hk", {"u": "uid"}, "d0")
    return f"""
WITH d0 AS (
  SELECT DISTINCT DATE_TRUNC('day', ts) AS day,
         CAST(user_id AS HUGEINT) AS uid
  FROM events
),
{sm},
r AS (SELECT day, CAST(h_u // 4503599627370496 AS BIGINT) AS register,
             CAST(h_u % 4503599627370496 AS BIGINT) AS w FROM hk6),
rk AS (SELECT day, register,
              CASE WHEN w = 0 THEN 53
                   ELSE bit_count((w & -w) - 1) + 1 END AS rank
       FROM r)
SELECT day, register, CAST(MAX(rank) AS BIGINT) AS max_rank
FROM rk GROUP BY day, register
"""


def _global_shuffle_sql(seed: int = 20260817) -> str:
    """Seeded epoch shuffle over documents (stages/packing.py
    ``global_shuffle``): unrolled splitmix64 of (doc_id + seed) mod
    2^64, converted to its SIGNED int64 bit view (the engine stores
    hashes as int64 views, so the rank order must be the signed one),
    then ROW_NUMBER ranks — machinery fully independent of the
    distributed prefix-sum scan."""
    sm = _sql_splitmix_stages("gs", {"x": "x0v"}, "d0")
    return f"""
WITH d0 AS (
  SELECT doc_id,
         (CAST(doc_id AS HUGEINT) + {seed}) % {_U64_M} AS x0v
  FROM documents
),
{sm},
sgn AS (
  SELECT doc_id,
         CAST(CASE WHEN h_x >= 9223372036854775808
                   THEN h_x - 18446744073709551616
                   ELSE h_x END AS BIGINT) AS shuffle_ord
  FROM gs6
)
SELECT doc_id, shuffle_ord,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_ord) - 1 AS BIGINT)
           AS shuffle_pos
FROM sgn
"""


_PARAGRAPH_DEDUP_SQL = """
WITH pj AS (
  SELECT doc_id, unnest(range(3 + doc_id % 4)) AS para_idx
  FROM documents
),
c AS (
  SELECT doc_id, para_idx,
         CASE WHEN (doc_id + para_idx) % 3 <> 0
              THEN 'para ' || ((doc_id * 7 + para_idx * 13) % 40)
                   || ' body'
              ELSE 'uniq ' || doc_id || '/' || para_idx
         END AS content
  FROM pj
),
w AS (
  SELECT doc_id, para_idx, content,
         ROW_NUMBER() OVER (PARTITION BY content
                            ORDER BY doc_id, para_idx) AS rn,
         COUNT(*) OVER (PARTITION BY content) AS nc
  FROM c
)
SELECT doc_id, CAST(para_idx AS BIGINT) AS para_idx,
       CAST(nc AS BIGINT) AS n_copies
FROM w WHERE rn = 1
"""


_LENGTH_BUCKETS_SQL = """
WITH h AS (SELECT n_chars AS v, COUNT(*) AS n FROM documents GROUP BY 1),
c AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM h),
t AS (SELECT SUM(n) AS tot FROM h),
b AS (SELECT
  (SELECT MIN(v) FROM c, t WHERE cum >= CEIL(0.25 * tot)) AS b1,
  (SELECT MIN(v) FROM c, t WHERE cum >= CEIL(0.50 * tot)) AS b2,
  (SELECT MIN(v) FROM c, t WHERE cum >= CEIL(0.75 * tot)) AS b3)
SELECT doc_id, n_chars,
       CAST((n_chars > b1)::INT + (n_chars > b2)::INT
            + (n_chars > b3)::INT AS BIGINT) AS bucket
FROM documents, b
"""


def _source_mixture_sql(seed: int = 424242) -> str:
    """Epoch mixture oracle (stages/packing.py ``source_mixture``):
    source srcK -> repeat (4 + 3*(K%4))/4; the fractional copy fires
    iff splitmix64(doc_id + seed) < ((3*(K%4)) % 4) * 2^62, replayed
    with the unrolled splitmix CTE chain in exact u64 arithmetic."""
    sm = _sql_splitmix_stages("mx", {"x": "x0v"}, "d0")
    return f"""
WITH d0 AS (
  SELECT doc_id, source,
         CAST(SUBSTR(source, 4) AS BIGINT) % 4 AS m,
         (CAST(doc_id AS HUGEINT) + {seed}) % {_U64_M} AS x0v
  FROM documents
),
{sm},
k AS (
  SELECT doc_id, source,
         (4 + 3 * m) // 4
         + CASE WHEN h_x < CAST((3 * m) % 4 AS HUGEINT)
                           * 4611686018427387904
                THEN 1 ELSE 0 END AS kk
  FROM mx6
)
SELECT doc_id, source, CAST(unnest(range(kk)) AS BIGINT) AS copy_idx
FROM k
"""


_URL_DEDUP_BEST_SQL = """
WITH c AS (
  SELECT doc_id, n_chars,
         'https://site' || ((doc_id // 3) % 97) || '.example.com/p'
             || (doc_id // 3) AS canonical_url
  FROM documents
),
w AS (
  SELECT canonical_url, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY canonical_url
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY canonical_url) AS nd
  FROM c
)
SELECT canonical_url, doc_id, n_chars AS best_score,
       CAST(nd AS BIGINT) AS n_dups
FROM w WHERE rn = 1
"""


def _cms_sql(d: int = 4, lw: int = 12) -> str:
    """Count-Min register table over events.user_id
    (stages/sketch.py ``cms_table``): depth j hashes
    splitmix64(u + j*SALT) and keeps the top ``lw`` bits; exact
    recount per (depth, cell) with ONE shared splitmix chain over all
    depths."""
    salt = 0x9E3779B97F4A7C15
    x0 = {
        f"j{j}": f"((uid + {j * salt % (1 << 64)}) % {_U64_M})"
        for j in range(d)
    }
    sm = _sql_splitmix_stages("cm", x0, "d0")
    div = 1 << (64 - lw)
    arms = "\nUNION ALL\n".join(
        f"SELECT {j} AS depth, h_j{j} // {div} AS cell FROM cm6"
        for j in range(d)
    )
    return f"""
WITH d0 AS (SELECT CAST(user_id AS HUGEINT) AS uid FROM events),
{sm},
u AS ({arms})
SELECT CAST(depth AS BIGINT) AS depth, CAST(cell AS BIGINT) AS cell,
       COUNT(*) AS n
FROM u GROUP BY 1, 2
"""


def _bloom_sql(d: int = 4, lw: int = 12) -> str:
    """Partitioned-Bloom set-bit table over events.user_id
    (stages/sketch.py ``bloom_bits``): the CMS hash arms, DISTINCT
    uids in, DISTINCT bits out (bit = depth * 2^lw + cell)."""
    salt = 0x9E3779B97F4A7C15
    x0 = {
        f"j{j}": f"((uid + {j * salt % (1 << 64)}) % {_U64_M})"
        for j in range(d)
    }
    sm = _sql_splitmix_stages("bl", x0, "d0")
    div = 1 << (64 - lw)
    arms = "\nUNION ALL\n".join(
        f"SELECT {j * (1 << lw)} + h_j{j} // {div} AS bit FROM bl6"
        for j in range(d)
    )
    return f"""
WITH d0 AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid FROM events),
{sm},
u AS ({arms})
SELECT DISTINCT CAST(bit AS BIGINT) AS bit FROM u
"""


def _pagerank_sql(iters: int = 5, scale: int = 10**12, dp: int = 85) -> str:
    """Unrolled fixed-point PageRank (stages/graphcc.py ``pagerank``)
    over the deterministic 3-out-link host graph.  Every CTE is
    MATERIALIZED (each e/deg/nodes is referenced once per iteration;
    plain CTEs would re-inline exponentially)."""
    arms = "\nUNION ALL\n".join(
        f"SELECT (doc_id % 97) AS u, "
        f"((doc_id % 97) + 1 + ((doc_id * {j}) % 96)) % 97 AS v "
        f"FROM documents"
        for j in (1, 2, 3)
    )
    ctes = [
        f"e AS MATERIALIZED (SELECT DISTINCT u, v FROM ({arms}))",
        "nodes AS MATERIALIZED (SELECT u AS node FROM e "
        "UNION SELECT v FROM e)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM nodes)",
        "deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM e GROUP BY 1)",
        f"r0 AS MATERIALIZED (SELECT node, {scale} // cnt AS r "
        f"FROM nodes CROSS JOIN nn)",
    ]
    for t in range(iters):
        ctes.append(
            f"m{t + 1} AS MATERIALIZED (SELECT e.v AS node, "
            f"SUM(((r.r * {dp}) // 100) // deg.d) AS mass "
            f"FROM e JOIN r{t} r ON e.u = r.node "
            f"JOIN deg ON e.u = deg.u GROUP BY 1)"
        )
        ctes.append(
            f"r{t + 1} AS MATERIALIZED (SELECT nodes.node, "
            f"((({scale} * {100 - dp}) // 100) // cnt) "
            f"+ COALESCE(CAST(mass AS BIGINT), 0) AS r "
            f"FROM nodes CROSS JOIN nn "
            f"LEFT JOIN m{t + 1} ON nodes.node = m{t + 1}.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS r "
        f"FROM r{iters}"
    )


def _bloom_probe_sql(d: int = 4, lw: int = 12) -> str:
    """Cross-crawl Bloom probe (stages/sketch.py ``bloom_probe``):
    build bits from even-event users, probe odd-event DISTINCT users;
    maybe_seen <=> ALL d probe bits present in the build bit set —
    the oracle replays the bit tables, honest false positives and
    all."""
    salt = 0x9E3779B97F4A7C15
    div = 1 << (64 - lw)

    def chain(prefix, src):
        x0 = {
            f"j{j}": f"((uid + {j * salt % (1 << 64)}) % {_U64_M})"
            for j in range(d)
        }
        return _sql_splitmix_stages(prefix, x0, src)

    def arms(prefix, with_uid):
        sel = "uid, " if with_uid else ""
        return "\nUNION ALL\n".join(
            f"SELECT {sel}{j * (1 << lw)} + h_j{j} // {div} AS bit "
            f"FROM {prefix}6"
            for j in range(d)
        )

    return f"""
WITH b0 AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid
            FROM events WHERE event_id % 2 = 0),
{chain("bb", "b0")},
bbits AS (SELECT DISTINCT bit FROM ({arms("bb", False)})),
p0 AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid
       FROM events WHERE event_id % 2 = 1),
{chain("pb", "p0")},
parms AS ({arms("pb", True)}),
m AS (SELECT p.uid, COUNT(bb.bit) AS nhit
      FROM parms p LEFT JOIN bbits bb ON p.bit = bb.bit
      GROUP BY 1)
SELECT CAST(uid AS BIGINT) AS user_id, nhit = {d} AS maybe_seen FROM m
"""


_BM25_RETRIEVAL_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(string_split(lower(COALESCE(text, '')), ' '))
           AS term
  FROM documents
),
dlt AS (
  SELECT doc_id,
         CAST(len(string_split(lower(COALESCE(text, '')), ' '))
              AS BIGINT) AS dl
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ('hash', 'join', 'merge', 'vector')
  GROUP BY 1, 2
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
avgt AS (
  SELECT CAST(100 * SUM(dl) // COUNT(*) AS BIGINT) AS avg100 FROM dlt
),
vals AS (SELECT DISTINCT c FROM (
  SELECT df AS c FROM dfc UNION ALL SELECT n FROM nn)),
it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT) << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM vals
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
),
q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16),
idf AS (
  SELECT dfc.term,
         (SELECT q.qlog2 FROM q JOIN nn ON q.c = nn.n) - qd.qlog2
           AS idf_fp
  FROM dfc JOIN q qd ON qd.c = dfc.df
),
sc AS (
  SELECT tf.doc_id,
         CAST(SUM(
           idf.idf_fp * (220 * tf.tf)
           // (100 * tf.tf
               + (120 * (25 + (7500 * dlt.dl) // avgt.avg100)) // 100)
         ) AS BIGINT) AS score_fp
  FROM tf
  JOIN idf USING (term)
  JOIN dlt USING (doc_id)
  CROSS JOIN avgt
  GROUP BY 1
)
SELECT doc_id, score_fp FROM sc
ORDER BY score_fp DESC, doc_id LIMIT 10
"""


_TFIDF_RETRIEVAL_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ('hash', 'join', 'merge', 'vector')
  GROUP BY 1, 2
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
vals AS (SELECT DISTINCT c FROM (
  SELECT df AS c FROM dfc UNION ALL SELECT n FROM nn)),
it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT) << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM vals
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
),
q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16),
idf AS (
  SELECT dfc.term,
         (SELECT q.qlog2 FROM q JOIN nn ON q.c = nn.n) - qd.qlog2
           AS idf_fp
  FROM dfc JOIN q qd ON qd.c = dfc.df
),
sc AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf * idf.idf_fp) AS BIGINT) AS score_fp
  FROM tf JOIN idf USING (term) GROUP BY 1
)
SELECT doc_id, score_fp FROM sc
ORDER BY score_fp DESC, doc_id LIMIT 10
"""


def _cdc_core_sql(mask_mod: int = 64, w: int = 8) -> str:
    """CDC boundaries (stages/dedup.py ``cdc_chunk_batch``): pack the
    w-codepoint window big-endian with ascii() arithmetic (pure-ASCII
    gate corpus = the kernel's byte pack), splitmix the pack, cut
    where h % mask_mod == 0; chunks via LEAD over the per-doc start
    set {0} + cuts."""
    pack = " + ".join(
        f"CAST(ascii(substr(s, CAST(j - {w - 1 - k} AS INT), 1)) "
        f"AS HUGEINT) * {1 << (8 * (w - 1 - k))}"
        for k in range(w)
    )
    # the chain must NOT carry the document text: packed is projected
    # to (doc_id, j, pkv) FIRST, or every one of the 7 chain stages
    # re-materializes ~1 kB of string per window row (measured: the
    # naive form ran minutes; this runs seconds)
    sm = _sql_splitmix_stages("cd", {"x": f"(pkv % {_U64_M})"}, "pkn")
    return f"""
WITH docs AS (
  SELECT doc_id, COALESCE(text, '') AS s,
         CAST(length(COALESCE(text, '')) AS BIGINT) AS L
  FROM documents
),
pk AS (
  SELECT doc_id, s, unnest(generate_series({w}, L - 1)) AS j
  FROM docs
),
pkn AS (SELECT doc_id, j, ({pack}) AS pkv FROM pk),
{sm},
cdm AS MATERIALIZED (SELECT doc_id, j, h_x FROM cd6),
cuts AS (SELECT doc_id, j AS st FROM cdm WHERE h_x % {mask_mod} = 0),
starts AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS st FROM docs
  UNION ALL
  SELECT doc_id, CAST(st AS BIGINT) FROM cuts
),
ord AS (
  SELECT doc_id, st,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY st) - 1
           AS chunk_idx,
         LEAD(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt
  FROM starts
)
"""


def _cdc_sql(mask_mod: int = 64, w: int = 8) -> str:
    """Per-chunk boundary table (gate query ``cdc_chunks_docs``)."""
    return _cdc_core_sql(mask_mod, w) + """
SELECT o.doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(st AS BIGINT) AS start_byte,
       CAST(COALESCE(nxt, d.L) - st AS BIGINT) AS n_bytes
FROM ord o JOIN docs d USING (doc_id)
"""


def _cdc_dup_spans_sql(mask_mod: int = 64, w: int = 8) -> str:
    """Sub-document duplicate spans (``cdc_duplicate_spans``): group
    the CDC chunks by their CONTENT (the engine groups by blake2b-64
    fingerprint — same groups modulo collision, the DEDUP_SQL
    precedent), keep groups with > 1 member."""
    return _cdc_core_sql(mask_mod, w).rstrip() + """,
ck AS (
  SELECT o.doc_id,
         substr(d.s, CAST(st + 1 AS INT),
                CAST(COALESCE(nxt, d.L) - st AS INT)) AS c,
         COALESCE(nxt, d.L) - st AS nb
  FROM ord o JOIN docs d USING (doc_id)
)
SELECT MIN(doc_id) AS doc_id, CAST(MIN(nb) AS BIGINT) AS n_bytes,
       COUNT(*) AS n_copies
FROM ck GROUP BY c HAVING COUNT(*) > 1
"""


_NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(COALESCE(text, ''),
                          '[\x00-\x08\x0e-\x1f\x7f]', '', 'g'),
           '[\t\n\r\f\v ]+', ' ', 'g'),
         '^ +| +$', '', 'g') AS norm_text
FROM documents
"""


_CHUNK_SQL = """
WITH tl AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ts
            FROM documents),
st AS (SELECT doc_id, ts,
              unnest(generate_series(1, len(ts), 20)) AS s
       FROM tl)
SELECT doc_id,
       CAST((s - 1) // 20 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(ts, s, s + 39), ' ') AS chunk_text,
       CAST(LEAST(40, len(ts) - s + 1) AS BIGINT) AS n_tokens
FROM st
"""


_CURATION_SQL = """
WITH s AS (
  SELECT doc_id, text,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','to','and','in','is','it')))::BIGINT
           AS n_stp
  FROM documents
),
w AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws
      FROM documents),
c AS (SELECT doc_id,
    len(list_intersect(ws, ['the','a','of','to','and','is'])) AS n_en,
    len(list_intersect(ws, ['el','la','de','que','y','los'])) AS n_es,
    len(list_intersect(ws, ['der','die','und','das','nicht','ist'])) AS n_de,
    len(list_intersect(ws, ['le','la','et','les','des','un'])) AS n_fr
  FROM w),
l AS (SELECT doc_id,
  CASE WHEN GREATEST(n_en, n_es, n_de, n_fr) = 0 THEN 'und'
       WHEN n_en = GREATEST(n_en, n_es, n_de, n_fr) THEN 'en'
       WHEN n_es = GREATEST(n_en, n_es, n_de, n_fr) THEN 'es'
       WHEN n_de = GREATEST(n_en, n_es, n_de, n_fr) THEN 'de'
       ELSE 'fr' END AS lang_pred FROM c),
f AS (SELECT s.* FROM s JOIN l USING (doc_id)
      WHERE lang_pred = 'en' AND n_tokens BETWEEN 10 AND 100000
        AND n_chars >= 3 * n_tokens AND n_chars <= 12 * n_tokens
        AND 100 * n_stp >= n_tokens),
d AS (SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
      FROM f GROUP BY text),
h AS (SELECT doc_id, doc_id % 97 AS host, n_tokens FROM d),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id)
        AS rk FROM h)
SELECT doc_id, CAST(host AS BIGINT) AS host, n_tokens,
       CAST(rk AS BIGINT) AS "rank"
FROM r WHERE rk <= 2
"""


_TOP_BIGRAMS_SQL = """
WITH tl AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
st AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tl),
ng AS (SELECT array_to_string(list_slice(ts, i, i + 1), ' ') AS ngram
       FROM st),
c AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n FROM ng GROUP BY 1)
SELECT ngram, n FROM c WHERE n >= 2 ORDER BY n DESC, ngram LIMIT 20
"""


_BLOCKLIST_FILTER_SQL = """
WITH h AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 'cdn.' ELSE '' END ||
         'site' || (doc_id % 97) || '.example.com' AS host
  FROM documents
)
SELECT doc_id, host FROM h WHERE (doc_id % 97) % 11 <> 0
"""


_HOST_QUOTA_SQL = """
WITH h AS (
  SELECT doc_id,
         'site' || (doc_id % 97) || '.example.com' AS host
  FROM documents
),
r AS (
  SELECT host, doc_id,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rk
  FROM h
)
SELECT doc_id, host, CAST(rk AS BIGINT) AS "rank"
FROM r WHERE rk <= 3
"""


_LM_CORE_SQL = """
WITH RECURSIVE docs AS (
  SELECT doc_id, COALESCE(text, '') AS s FROM documents
),
pairs AS (
  SELECT doc_id, substr(s, CAST(i AS INT), 2) AS pair
  FROM (SELECT doc_id, s,
               unnest(generate_series(1, length(s) - 1)) AS i
        FROM docs)
),
cnt AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c
        FROM pairs GROUP BY pair),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS c FROM cnt),
vals AS (SELECT DISTINCT c FROM (
  SELECT c FROM cnt UNION ALL SELECT c FROM tot)),
it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT) << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM vals
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
),
q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16),
qn AS (SELECT q.qlog2 AS v FROM q JOIN tot ON q.c = tot.c),
scored AS (
  SELECT p.doc_id, qn.v - q.qlog2 AS sbits
  FROM pairs p
  JOIN cnt USING (pair)
  JOIN q ON q.c = cnt.c
  CROSS JOIN qn
)"""


def _lm_surprisal_sql() -> str:
    """Byte-bigram LM surprisal over documents (stages/lm.py).  The
    fixed-point qlog2 runs as a recursive CTE over the DISTINCT count
    values only (a tiny set): msb from length(bin(c)), then 16 rounds
    of the identical square/truncate/emit-bit loop the numpy kernel
    runs — bit-equal per-doc integer totals.  substr() is codepoint-
    based vs the kernel's bytes; identical on the pure-ASCII gate
    corpus (checked by lm.py's docstring contract).  The shared CTE
    block (``_LM_CORE_SQL``) is composed by this oracle AND
    ``_ppx_buckets_sql``."""
    return _LM_CORE_SQL + """
SELECT d.doc_id,
       CAST(COUNT(s.sbits) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM(s.sbits), 0) AS BIGINT) AS qbits_total
FROM docs d LEFT JOIN scored s USING (doc_id)
GROUP BY d.doc_id
"""


def _ppx_buckets_sql() -> str:
    """CCNet-style perplexity bucketing: the full LM-surprisal CTE
    (shared construction with ``_lm_surprisal_sql``), per-doc
    fixed-point bits/pair ``ppx_fp = qbits_total // n_pairs``, then
    EXACT quartile bucket assignment with the same
    cum >= CEIL(q * tot) thresholds as ``_LENGTH_BUCKETS_SQL`` (dyadic
    q literals — identical in decimal and binary arithmetic)."""
    return f"""{_LM_CORE_SQL},
per AS (
  SELECT d.doc_id,
         CAST(COUNT(s.sbits) AS BIGINT) AS n_pairs,
         CAST(COALESCE(SUM(s.sbits), 0) AS BIGINT) AS qbits_total
  FROM docs d LEFT JOIN scored s USING (doc_id)
  GROUP BY d.doc_id
),
px AS (
  SELECT doc_id,
         CAST(CASE WHEN n_pairs > 0 THEN qbits_total // n_pairs
                   ELSE 0 END AS BIGINT) AS ppx_fp
  FROM per
),
hh AS (SELECT ppx_fp AS v, COUNT(*) AS n FROM px GROUP BY 1),
ccum AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM hh),
tt AS (SELECT SUM(n) AS tot FROM hh),
bb AS (SELECT
  (SELECT MIN(v) FROM ccum, tt WHERE cum >= CEIL(0.25 * tot)) AS b1,
  (SELECT MIN(v) FROM ccum, tt WHERE cum >= CEIL(0.50 * tot)) AS b2,
  (SELECT MIN(v) FROM ccum, tt WHERE cum >= CEIL(0.75 * tot)) AS b3)
SELECT doc_id, ppx_fp,
       CAST((ppx_fp > b1)::INT + (ppx_fp > b2)::INT
            + (ppx_fp > b3)::INT AS BIGINT) AS bucket
FROM px, bb
"""


def _top_pages_sql() -> str:
    """Full SQL mirror of the flagship page-synthesis + geocode +
    tile + salted-top-k chain (pages_from_documents_batch ->
    enrich_pages -> salted_topk_per_key): hash streams are one
    splitmix64 application each (inner constant precomputed), the
    gazetteer with its zipf cumulative weights is inlined, the
    byte-identical extract round-trip reduces score to constructed
    text length, and geocode precedence (coord tag > mention > host)
    becomes CASEs.  Rank = ROW_NUMBER per res-5 cell."""
    from geodata_ray.sources.synth import gazetteer_arrays, splitmix64

    names, glat, glon, cum = gazetteer_arrays()
    g_rows = ", ".join(
        f"({i}, '{names[i]}', {float(glat[i])!r}, {float(glon[i])!r},"
        f" {float(cum[i])!r})"
        for i in range(len(names))
    )
    streams = {70: "city", 71: "nogeo", 72: "coords", 73: "jlat", 74: "jlon"}
    x0 = {}
    for s, nm in streams.items():
        inner = int(splitmix64(np.uint64(42 + s * 0x9E37)))
        inner_i64 = inner - (1 << 64) if inner >= (1 << 63) else inner
        x = f"xor(doc_id, CAST({inner_i64} AS BIGINT))"
        x0[nm] = (
            f"(CASE WHEN {x} < 0 THEN {x}::HUGEINT + {_U64_M}"
            f" ELSE {x}::HUGEINT END)"
        )
    sm = _sql_splitmix_stages("hs", x0, "d0")
    u = {nm: f"((h_{nm} // 2048) / 9007199254740992.0)" for nm in streams.values()}
    return f"""
WITH d0 AS (SELECT doc_id, text FROM documents),
{sm},
gz(gi, gname, glat, glon, gcum) AS (VALUES {g_rows}),
c0 AS (
  SELECT doc_id, text,
         {u["city"]} AS u_city,
         (h_nogeo % 20 = 0) AS no_geo,
         (h_coords % 5 = 0) AND NOT (h_nogeo % 20 = 0) AS has_coords,
         {u["jlat"]} AS u_jlat,
         {u["jlon"]} AS u_jlon
  FROM hs6
),
c1 AS (
  SELECT c0.*,
         LEAST((SELECT COUNT(*) FROM gz WHERE gz.gcum <= c0.u_city), 499)
           AS city
  FROM c0
),
c2 AS (
  SELECT c1.*, gz.gname, gz.glat, gz.glon
  FROM c1 JOIN gz ON gz.gi = c1.city
),
c3 AS (
  SELECT *,
         ROUND(glat + (u_jlat - 0.5) * 0.4, 4) AS jlat,
         ROUND(glon + (u_jlon - 0.5) * 0.4, 4) AS jlon
  FROM c2
),
c4 AS (
  SELECT *,
         'https://' || (CASE WHEN no_geo THEN 'www' ELSE gname END)
           || '.example.com/d' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
           AS url,
         CAST(length(text)
              + CASE WHEN no_geo THEN 0
                     ELSE length(' Observations near ' || gname
                                 || ' continue.') END
              + CASE WHEN has_coords
                     THEN length(' Position @' || printf('%.4f', jlat)
                                 || ',' || printf('%.4f', jlon)
                                 || ' recorded.')
                     ELSE 0 END AS DOUBLE) AS score,
         CASE WHEN has_coords THEN CAST(printf('%.4f', jlat) AS DOUBLE)
              WHEN NOT no_geo THEN glat ELSE NULL END AS geolat,
         CASE WHEN has_coords THEN CAST(printf('%.4f', jlon) AS DOUBLE)
              WHEN NOT no_geo THEN glon ELSE NULL END AS geolon
  FROM c3
),
c5 AS (
  SELECT url, score,
         {qcell.cell_sql_expr("geolat", "geolon", 5)} AS cell
  FROM c4 WHERE geolat IS NOT NULL
),
ranked AS (
  SELECT cell, url, score,
         ROW_NUMBER() OVER (PARTITION BY cell
                            ORDER BY score DESC, url) AS rank
  FROM c5
)
SELECT url, cell, score, rank FROM ranked WHERE rank <= 3
"""


TOP_PAGES_SQL = _top_pages_sql()


_GATE_VEC_IDS: list[int] | None = None


def _gate_vec_ids() -> list[int]:
    """vec_ids of the gate corpus in FILE order (single cached read —
    both iterative-ML oracle builders share it)."""
    global _GATE_VEC_IDS
    if _GATE_VEC_IDS is None:
        try:
            import pyarrow.parquet as pq

            t = pq.read_table(
                f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id"]
            )
            _GATE_VEC_IDS = [int(x) for x in t["vec_id"].to_numpy()]
        except Exception as e:
            # a silent range(500) fallback here would make every
            # kmeans/IVF oracle wrong with no hint why — fail loudly
            raise RuntimeError(
                f"oracle gate corpus missing/unreadable at "
                f"{_ORACLE_SF_DIR}/embeddings.parquet; the kmeans/IVF "
                f"oracle SQL is bound to the gate corpus and cannot be "
                f"built without it"
            ) from e
    return _GATE_VEC_IDS


def _embedding_head_ids(k: int) -> list[int]:
    """vec_ids of the first k rows (FILE order) — the engine's kmeans
    init_table rows."""
    return _gate_vec_ids()[:k]


def _embedding_corpus_size() -> int:
    return len(_gate_vec_ids())


def _kmeans_sql(
    k: int = 8, iters: int = 6, dim: int = 64, src: str | None = None,
    final: str | None = None,
) -> str:
    """Fully-independent SQL Lloyd: the SAME init (first k rows), then
    ``iters`` assign+recompute rounds entirely in SQL (cross-join
    distances, ROW_NUMBER argmin with lowest-cluster tie-break,
    element-wise AVG via generate_series indexing, empty clusters keep
    their previous centroid).  Per-cluster mean sums are exact (float32
    -valued inputs summed in float64), so SQL centroids equal the
    engine's bit-for-bit as long as assignments agree — distance
    expressions differ only in last-ulp accumulation order."""
    d2 = (
        "list_inner_product(e.v, e.v) - 2 * list_inner_product(e.v, c.v)"
        " + list_inner_product(c.v, c.v)"
    )
    # the engine inits from the FIRST k rows in FILE order; read the
    # actual driver file so cluster labels line up even if vec_ids are
    # not 0..k-1 in sorted order (gate runs at sf0.01)
    init_pairs = ", ".join(
        f"({j}, {vid})" for j, vid in enumerate(_embedding_head_ids(k))
    )
    if src is None:
        src = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    parts = [
        f"e AS ({src})",
        f"c0 AS (SELECT i.cl, e.v FROM (VALUES {init_pairs}) i(cl, vid)"
        f" JOIN e ON e.vec_id = i.vid)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""asg{i} AS MATERIALIZED (
  SELECT vec_id, v, cl FROM (
    SELECT e.vec_id, e.v, c.cl,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cl) AS rk
    FROM e CROSS JOIN c{i - 1} c
  ) WHERE rk = 1
)"""
        )
        parts.append(
            f"""cn{i} AS MATERIALIZED (
  SELECT cl, list(m ORDER BY pos) AS v FROM (
    SELECT cl, gs.i AS pos, AVG(v[gs.i]) AS m
    FROM asg{i} CROSS JOIN generate_series(1, {dim}) gs(i)
    GROUP BY 1, 2
  ) GROUP BY cl
)"""
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT cl, v FROM cn{i} UNION ALL"
            f" SELECT cl, v FROM c{i - 1}"
            f" WHERE cl NOT IN (SELECT cl FROM cn{i}))"
        )
    parts.append(
        f"""asgF AS MATERIALIZED (
  SELECT vec_id, v, cl FROM (
    SELECT e.vec_id, e.v, c.cl,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cl) AS rk
    FROM e CROSS JOIN c{iters} c
  ) WHERE rk = 1
)"""
    )
    body = ",\n".join(parts)
    if final is None:
        final = "SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM asgF"
    return f"""
WITH {body}
{final}
"""


def _semdedup_sql(k: int = 8, iters: int = 6, tau: str = "0.99") -> str:
    """SemDeDup oracle: the Lloyd replay above over the mutation
    corpus, then within-cluster cosine pairs and a NOT IN keep —
    greedy-by-id semantics identical to the engine's prune kernel."""
    src = f"""SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + {_MUT_OFFSET},
             list_transform(embedding::DOUBLE[], x -> x + 0.01)
      FROM embeddings"""
    final = f"""SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM asgF
WHERE vec_id NOT IN (
  SELECT b.vec_id
  FROM asgF a JOIN asgF b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {tau}
)"""
    return _kmeans_sql(k=k, iters=iters, src=src, final=final)




def _ivf_sql(n_lists: int = 16, iters: int = 10, dim: int = 64,
             n_probe: int = 4, k: int = 5) -> str:
    """Independent SQL mirror of the IVF pipeline: seeded-choice init
    (indices precomputed — the only non-SQL piece), spherical Lloyd in
    SQL (normalize -> argmax dot -> renormalized means), probe-list
    selection per query, cluster pruning, exact cosine top-k over the
    survivors.  Normalized values make the means inexact-by-ulp across
    engines; assignments tolerate that because cluster margins are
    orders of magnitude wider."""
    rng = np.random.default_rng(5)
    n_corpus = _embedding_corpus_size()
    init_pos = sorted(  # clamp like ivf_build's min(n_lists, N)
        int(x)
        for x in rng.choice(
            n_corpus, size=min(n_lists, n_corpus), replace=False
        )
    )
    # positions -> vec_ids in file order (identity when the file is
    # vec_id-ordered starting at 0, as the driver corpus is)
    head = _embedding_head_ids(n_corpus)
    init_ids = ", ".join(str(head[p]) for p in init_pos)
    dot = "list_inner_product(e.nv, c.v)"
    parts = [
        """e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_inner_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))) AS nv
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl, nv AS v
  FROM e WHERE vec_id IN ({init_ids})
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""asg{i} AS MATERIALIZED (
  SELECT vec_id, nv, cl FROM (
    SELECT e.vec_id, e.nv, c.cl,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot} DESC, c.cl) AS rk
    FROM e CROSS JOIN c{i - 1} c
  ) WHERE rk = 1
)"""
        )
        parts.append(
            f"""cm{i} AS MATERIALIZED (
  SELECT cl, list(m ORDER BY pos) AS mv FROM (
    SELECT cl, gs.i AS pos, AVG(nv[gs.i]) AS m
    FROM asg{i} CROSS JOIN generate_series(1, {dim}) gs(i)
    GROUP BY 1, 2
  ) GROUP BY cl
)"""
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT cl, list_transform(mv,
           x -> x / sqrt(list_inner_product(mv, mv))) AS v
  FROM cm{i}
  UNION ALL
  SELECT cl, v FROM c{i - 1} WHERE cl NOT IN (SELECT cl FROM cm{i})
)"""
        )
    parts.append(
        f"""q AS (SELECT vec_id AS query_id, nv AS qv FROM e WHERE vec_id < 5),
probe AS (
  SELECT DISTINCT cl FROM (
    SELECT q.query_id, c.cl,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_inner_product(q.qv, c.v) DESC,
                                       c.cl) AS rk
    FROM q CROSS JOIN c{iters} c
  ) WHERE rk <= {n_probe}
),
vassign AS (
  SELECT vec_id, nv, cl FROM (
    SELECT e.vec_id, e.nv, c.cl,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {dot} DESC, c.cl) AS rk
    FROM e CROSS JOIN c{iters} c
  ) WHERE rk = 1
),
surv AS (
  SELECT v.vec_id, v.nv FROM vassign v WHERE v.cl IN (SELECT cl FROM probe)
),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         list_inner_product(q.qv, s.nv) AS sim
  FROM q CROSS JOIN surv s WHERE s.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}"""
    )
    body = ",\n".join(parts)
    return f"WITH {body}\n"




_RASTER_BOTH = f"""
  SELECT * FROM {_RASTER_PQ["landcover"]}
  UNION ALL
  SELECT * FROM {_RASTER_PQ["slope"]}
"""


RASTER_AND_SQL = f"""
WITH layers2 AS ({_RASTER_BOTH}),
agg AS (
  SELECT row, col,
         SUM(CASE WHEN CAST(value AS DOUBLE) <> 0.0 THEN 1 ELSE 0 END)
           AS n_nonzero,
         SUM(CASE WHEN layer = 'slope' THEN CAST(value AS DOUBLE)
                  ELSE 0.0 END) AS ref_value
  FROM layers2 GROUP BY 1, 2
)
SELECT row, col,
       CAST(CASE WHEN n_nonzero = 2 THEN ref_value ELSE 0.0 END AS REAL)
         AS value
FROM agg
"""


RASTER_SUM_SQL = f"""
WITH layers2 AS ({_RASTER_BOTH})
SELECT row, col,
       SUM(CASE WHEN layer = 'landcover' THEN 2.0 * CAST(value AS DOUBLE)
                WHEN layer = 'slope' THEN 0.5 * CAST(value AS DOUBLE)
                ELSE 1.0 * CAST(value AS DOUBLE) END) AS value
FROM layers2 GROUP BY 1, 2
"""


RASTER_FILTER_TRIM_SQL = f"""
WITH f AS (
  SELECT layer, row, col, lat, lon,
         CASE WHEN CAST(value AS DOUBLE) IN (1.0, 2.0, 3.0) THEN value
              ELSE CAST(0.0 AS REAL) END AS value
  FROM {_RASTER_PQ["landcover"]}
),
b AS (
  SELECT MIN(row) AS rmin, MAX(row) AS rmax,
         MIN(col) AS cmin, MAX(col) AS cmax
  FROM f WHERE CAST(value AS DOUBLE) <> 0.0
)
SELECT f.layer, f.row, f.col, f.lat, f.lon, f.value
FROM f, b
WHERE f.row BETWEEN b.rmin AND b.rmax AND f.col BETWEEN b.cmin AND b.cmax
"""


RASTER_RESAMPLE_SQL = f"""
SELECT {qcell.cell_sql_expr("lat", "lon", 5)} AS cell,
       AVG(CAST(value AS DOUBLE)) AS value
FROM {_RASTER_PQ["slope"]}
GROUP BY 1
"""


RASTER_MIN_AREA_SQL = f"""
WITH RECURSIVE nz AS (
  SELECT layer, row, col, lat, lon, value
  FROM {_RASTER_PQ["scatter"]}
  WHERE CAST(value AS DOUBLE) <> 0.0
),
walk(row, col, label) AS (
  SELECT row, col, CAST(row AS BIGINT) * 80 + col FROM nz
  UNION
  SELECT n.row, n.col, w.label
  FROM walk w
  CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) d(dr, dc)
  JOIN nz n ON n.row = w.row + d.dr AND n.col = w.col + d.dc
),
lab AS (SELECT row, col, MIN(label) AS label FROM walk GROUP BY 1, 2),
sz AS (SELECT label, COUNT(*) AS n FROM lab GROUP BY 1)
SELECT nz.layer, nz.row, nz.col, nz.lat, nz.lon,
       CAST(CASE WHEN sz.n >= 3 THEN nz.value ELSE 0.0 END AS REAL) AS value
FROM nz
JOIN lab ON lab.row = nz.row AND lab.col = nz.col
JOIN sz ON sz.label = lab.label
"""


# area-weighted variant: identical label propagation, but the
# per-component measure is SUM of the spherical pixel area
# R^2 * dlon * (sin(lat+dlat/2) - sin(lat-dlat/2)) — the same IEEE
# expression pixel_area_km2 evaluates (threshold margin >= 6.9 km^2 on
# this fixture, so last-ulp sin/radians differences cannot flip a row).
RASTER_MIN_AREA_KM2_SQL = f"""
WITH RECURSIVE nz AS (
  SELECT layer, row, col, lat, lon, value,
         POWER(6371.0088, 2) * RADIANS(0.25)
           * (SIN(RADIANS(lat) + RADIANS(0.25) / 2)
              - SIN(RADIANS(lat) - RADIANS(0.25) / 2)) AS px_area
  FROM {_RASTER_PQ["scatter"]}
  WHERE CAST(value AS DOUBLE) <> 0.0
),
walk(row, col, label) AS (
  SELECT row, col, CAST(row AS BIGINT) * 80 + col FROM nz
  UNION
  SELECT n.row, n.col, w.label
  FROM walk w
  CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) d(dr, dc)
  JOIN nz n ON n.row = w.row + d.dr AND n.col = w.col + d.dc
),
lab AS (SELECT row, col, MIN(label) AS label FROM walk GROUP BY 1, 2),
sz AS (
  SELECT lab.label, SUM(nz.px_area) AS area
  FROM lab JOIN nz ON nz.row = lab.row AND nz.col = lab.col
  GROUP BY 1
)
SELECT nz.layer, nz.row, nz.col, nz.lat, nz.lon,
       CAST(CASE WHEN sz.area >= 1800.0 THEN nz.value ELSE 0.0 END AS REAL)
         AS value
FROM nz
JOIN lab ON lab.row = nz.row AND lab.col = nz.col
JOIN sz ON sz.label = lab.label
"""


MASK_ATTACH_SQL = f"""
WITH m AS (
  SELECT row, col,
         CAST(CASE WHEN SUM(CASE WHEN CAST(value AS DOUBLE) <> 0.0
                                 THEN 1 ELSE 0 END) = 2
                   THEN SUM(CASE WHEN layer = 'slope'
                                 THEN CAST(value AS DOUBLE) ELSE 0.0 END)
                   ELSE 0.0 END AS REAL) AS value
  FROM ({_RASTER_BOTH}) GROUP BY 1, 2
),
mm AS (
  SELECT 30.0 + (CAST(row AS DOUBLE) + 0.5) * 0.25 AS mlat,
         -15.0 + (CAST(col AS DOUBLE) + 0.5) * 0.25 AS mlon,
         value
  FROM m
),
cells AS (
  SELECT {qcell.cell_sql_expr("mlat", "mlon", 5)} AS cell,
         AVG(CAST(value AS DOUBLE)) AS mask_value
  FROM mm GROUP BY 1
)
SELECT g.ts, g.lat, g.lon,
       {qcell.cell_sql_expr("g.lat", "g.lon", 5)} AS cell,
       c.mask_value
FROM {_GRID_PQ} g
LEFT JOIN cells c ON c.cell = {qcell.cell_sql_expr("g.lat", "g.lon", 5)}
"""


RUNNING_ACTOR_SQL = """
WITH w AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id,
       CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_sum,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS running_n
FROM w
"""


NORMALIZE_ERA5_SQL = f"""
WITH raw AS (
  SELECT event_id,
         make_timestamp(event_id * 3600000000) AS ts,
         (((event_id * {_GEO_A} + 3 * 7919) % {_GEO_M}) / {_GEO_M})
           * 120.0 - 60.0 AS lat,
         (((event_id * {_GEO_A} + 4 * 7919) % {_GEO_M}) / {_GEO_M})
           * 360.0 - 180.0 AS lon,
         (((event_id * {_GEO_A} + 5 * 7919) % {_GEO_M}) / {_GEO_M})
           * 5e4 AS z,
         (((event_id * {_GEO_A} + 1 * 7919) % {_GEO_M}) / {_GEO_M})
           * 3.6e6 AS ssrd,
         (((event_id * {_GEO_A} + 2 * 7919) % {_GEO_M}) / {_GEO_M}) AS u2,
         (((event_id * {_GEO_A} + 6 * 7919) % {_GEO_M}) / {_GEO_M}) AS u6,
         (((event_id * {_GEO_A} + 7 * 7919) % {_GEO_M}) / {_GEO_M}) AS u7,
         (((event_id * {_GEO_A} + 8 * 7919) % {_GEO_M}) / {_GEO_M})
           * 20 - 10 AS u100,
         (((event_id * {_GEO_A} + 9 * 7919) % {_GEO_M}) / {_GEO_M})
           * 20 - 10 AS v100,
         (((event_id * {_GEO_A} + 10 * 7919) % {_GEO_M}) / {_GEO_M})
           * 2e-4 - 1e-4 AS ro,
         250.0 + (((event_id * {_GEO_A} + 11 * 7919) % {_GEO_M}) / {_GEO_M})
           * 60.0 AS t2m,
         9e4 + (((event_id * {_GEO_A} + 12 * 7919) % {_GEO_M}) / {_GEO_M})
           * 1.5e4 AS sp,
         260.0 + (((event_id * {_GEO_A} + 13 * 7919) % {_GEO_M}) / {_GEO_M})
           * 40.0 AS stl4,
         (((event_id * {_GEO_A} + 14 * 7919) % {_GEO_M}) / {_GEO_M}) AS fsr
  FROM events
),
d AS (
  SELECT *, ssrd * (0.2 + 0.7 * u2) AS fdir,
         ssrd * (0.7 + 0.25 * u6) AS ssr,
         ssrd * (1.0 + 0.3 * u7) AS tisr
  FROM raw
)
SELECT ts, lat, lon,
       z / 9.80665 AS height,
       CASE WHEN isnan((ssrd - ssr) / ssrd) THEN 0.0
            ELSE (ssrd - ssr) / ssrd END AS albedo,
       GREATEST(fdir, 0.0) / 3600.0 AS influx_direct,
       GREATEST(ssrd - fdir, 0.0) / 3600.0 AS influx_diffuse,
       GREATEST(tisr, 0.0) / 3600.0 AS influx_toa,
       sqrt(u100 * u100 + v100 * v100) AS wnd100m,
       GREATEST(ro, 0.0) AS runoff,
       t2m AS temperature,
       sp AS pressure,
       stl4 AS soil_temperature,
       fsr AS roughness
FROM d
"""


PARTITIONED_VIEW_SQL = f"""
SELECT event_id, user_id, value,
       ((event_id * {_GEO_A}) % {_GEO_M}) % 8 AS bucket
FROM events
WHERE ((event_id * {_GEO_A}) % {_GEO_M}) % 8 IN (1, 3)
"""


def _knn_gazetteer_sql() -> str:
    """Brute-force haversine oracle for the cell-local kNN against the
    REAL gazetteer: the 500 (id, lat, lon) rows are inlined as literals
    (np.round(x, 4) float64 repr round-trips exactly), queries derive
    coords from event ids with the shared integer-hash formulas.  A
    green row proves the kRing-pruned plan is exact on this corpus."""
    from geodata_ray.sources.synth import gazetteer_arrays

    _, lats, lons, _ = gazetteer_arrays()
    rows = ", ".join(
        f"({i}, {float(lats[i])!r}, {float(lons[i])!r})"
        for i in range(len(lats))
    )
    return f"""
WITH refs(ref_id, rlat, rlon) AS (VALUES {rows}),
qs AS (
  SELECT event_id, {_derive_lat_sql("event_id")} AS qlat,
         {_derive_lon_sql("event_id")} AS qlon
  FROM events
),
d AS (
  SELECT event_id AS query_id, ref_id,
         2 * 6371.0088 * ASIN(SQRT(
           POWER(SIN(RADIANS(rlat - qlat) / 2), 2)
           + COS(RADIANS(qlat)) * COS(RADIANS(rlat))
             * POWER(SIN(RADIANS(rlon - qlon) / 2), 2))) AS dist
  FROM qs, refs
),
ranked AS (
  SELECT query_id, ref_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist, ref_id) AS rank
  FROM d
)
SELECT query_id, ref_id, rank FROM ranked WHERE rank <= 3
"""


KNN_GAZETTEER_SQL = _knn_gazetteer_sql()


TOP3_SALTED_SQL = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_type, event_id)
           AS rank
  FROM events
)
SELECT event_type, event_id, value, rank FROM ranked WHERE rank <= 3
"""


def _wind_fit_core_sql() -> str:
    """Per-row closed-form 2x2 least squares (speed vs log-height) as
    lateral-alias SQL mirroring ``fit_extrapolation_batch``'s exact
    IEEE trees (4-term sums are sequential in numpy at this width)."""
    terms = [
        ("50.0", "u50m", "v50m"),
        ("10.0", "u10m", "v10m"),
        ("2.0", "u2m", "v2m"),
        ("CAST(hlml AS DOUBLE)", "ulml", "vlml"),
    ]
    cols = []
    for i, (h, u, v) in enumerate(terms, 1):
        H = f"({h} - CAST(disph AS DOUBLE))"
        cols.append(
            f"(CASE WHEN {H} > 0.0 THEN ln({H}) ELSE -1.0 END) AS x{i}"
        )
        cols.append(
            f"sqrt(CAST({u} AS DOUBLE) * CAST({u} AS DOUBLE)"
            f" + CAST({v} AS DOUBLE) * CAST({v} AS DOUBLE)) AS y{i}"
        )
    xy = ",\n         ".join(cols)
    return f"""
  SELECT ts, lat, lon, disph,
         {xy}
  FROM {_GRID_PQ}
"""


WIND_FIT_SQL = f"""
WITH b AS ({_wind_fit_core_sql()}),
s AS (
  SELECT ts, lat, lon, disph, x1, x2, x3, x4, y1, y2, y3, y4,
         x1 + x2 + x3 + x4 AS sx,
         y1 + y2 + y3 + y4 AS sy,
         x1 * x1 + x2 * x2 + x3 * x3 + x4 * x4 AS sxx,
         x1 * y1 + x2 * y2 + x3 * y3 + x4 * y4 AS sxy,
         4 * sxx - sx * sx AS det,
         (4 * sxy - sx * sy) / det AS alpha,
         (sy - alpha * sx) / 4 AS beta,
         (y1 - (alpha * x1 + beta)) * (y1 - (alpha * x1 + beta))
         + (y2 - (alpha * x2 + beta)) * (y2 - (alpha * x2 + beta))
         + (y3 - (alpha * x3 + beta)) * (y3 - (alpha * x3 + beta))
         + (y4 - (alpha * x4 + beta)) * (y4 - (alpha * x4 + beta)) AS ssr
  FROM b
)
SELECT ts, lat, lon, disph,
       CAST(alpha AS REAL) AS alpha,
       CAST(beta AS REAL) AS beta,
       CAST(ssr AS REAL) AS ssr
FROM s
"""


WIND_ESTIMATE_SQL = f"""
WITH b AS ({_wind_fit_core_sql()}),
s AS (
  SELECT ts, lat, lon, disph, x1, x2, x3, x4, y1, y2, y3, y4,
         x1 + x2 + x3 + x4 AS sx,
         y1 + y2 + y3 + y4 AS sy,
         x1 * x1 + x2 * x2 + x3 * x3 + x4 * x4 AS sxx,
         x1 * y1 + x2 * y2 + x3 * y3 + x4 * y4 AS sxy,
         4 * sxx - sx * sx AS det,
         CAST(CAST((4 * sxy - sx * sy) / det AS REAL) AS DOUBLE) AS a,
         CAST(CAST((sy - ((4 * sxy - sx * sy) / det) * sx) / 4 AS REAL)
              AS DOUBLE) AS bt
  FROM b
)
SELECT ts, lat, lon,
       CAST(ROUND(a * ln((30.0 - CAST(disph AS DOUBLE))
                         / exp(-bt / a)) * 1000000) AS BIGINT)
         AS wnd30m_est_um
FROM s
"""


WIND_SPLINE_SQL = f"""
SELECT ts, lat, lon,
       CAST(ROUND(sqrt(CAST(ulml AS DOUBLE) * CAST(ulml AS DOUBLE)
                       + CAST(vlml AS DOUBLE) * CAST(vlml AS DOUBLE))
                  * {_spline_profile_const()!r} * 1000000) AS BIGINT)
         AS wnd80m_est_um
FROM {_GRID_PQ}
"""


TS_SERIES_SQL = f"""
SELECT DATE_TRUNC('day', ts) AS bucket,
       AVG(CASE WHEN isnan(CAST(temperature AS DOUBLE)) THEN NULL
                ELSE CAST(temperature AS DOUBLE) END) AS temperature_mean
FROM {_GRID_PQ}
GROUP BY 1
"""


HEATMAP_SQL = f"""
SELECT lat, lon,
       AVG(CASE WHEN isnan(CAST(temperature AS DOUBLE)) THEN NULL
                ELSE CAST(temperature AS DOUBLE) END) AS temperature_mean
FROM {_GRID_PQ}
GROUP BY 1, 2
"""


EXACT_QUANTILES_SQL = """
WITH o AS (
  SELECT CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (ORDER BY value) AS rn,
         COUNT(*) OVER () AS n
  FROM events
)
SELECT q.q_pct, o.cents AS value_cents
FROM o
JOIN (VALUES (10, 0.1), (25, 0.25), (50, 0.5),
             (75, 0.75), (90, 0.9), (99, 0.99)) q(q_pct, qq)
  ON o.rn = CAST(ceil(q.qq * o.n) AS BIGINT)
"""


def _lsh_buckets_sql(dim: int = 64, bits: int = 16) -> str:
    from geodata_ray.stages.dedup import _hyperplanes

    H = _hyperplanes(dim, bits)  # (dim, bits), rng seed 7
    terms = []
    for j in range(bits):
        vec = ", ".join(repr(float(x)) for x in H[:, j])
        terms.append(
            f"(CASE WHEN list_inner_product(embedding::DOUBLE[], [{vec}])"
            f" > 0.0 THEN {1 << (bits - 1 - j)} ELSE 0 END)"
        )
    expr = "\n     + ".join(terms)
    return f"""
SELECT vec_id, CAST({expr} AS BIGINT) AS bucket
FROM embeddings
"""


LSH_BUCKETS_SQL = _lsh_buckets_sql()


LANGID_SQL = """
WITH w AS (
  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws
  FROM documents
),
c AS (
  SELECT doc_id,
    len(list_intersect(ws, ['the','a','of','to','and','is'])) AS n_en,
    len(list_intersect(ws, ['el','la','de','que','y','los'])) AS n_es,
    len(list_intersect(ws, ['der','die','und','das','nicht','ist'])) AS n_de,
    len(list_intersect(ws, ['le','la','et','les','des','un'])) AS n_fr
  FROM w
)
SELECT doc_id,
  CASE WHEN GREATEST(n_en, n_es, n_de, n_fr) = 0 THEN 'und'
       WHEN n_en = GREATEST(n_en, n_es, n_de, n_fr) THEN 'en'
       WHEN n_es = GREATEST(n_en, n_es, n_de, n_fr) THEN 'es'
       WHEN n_de = GREATEST(n_en, n_es, n_de, n_fr) THEN 'de'
       ELSE 'fr' END AS lang_pred
FROM c
"""


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','to','and','in','is','it')))::BIGINT
           AS n_stopwords
  FROM documents
),
m AS (
  SELECT *,
    CASE WHEN n_tokens > 0 THEN n_chars / GREATEST(n_tokens, 1) ELSE 0.0 END
      AS mean_word,
    CASE WHEN n_tokens > 0 THEN n_stopwords / GREATEST(n_tokens, 1) ELSE 0.0 END
      AS stop_ratio
  FROM t
)
SELECT doc_id, n_tokens, n_chars, n_stopwords,
  0.4 * (CASE WHEN mean_word >= 3.0 AND mean_word <= 12.0 THEN 1 ELSE 0 END)
  + 0.3 * (CASE WHEN stop_ratio >= 0.01 THEN 1 ELSE 0 END)
  + 0.3 * (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1 ELSE 0 END)
  AS quality
FROM m
"""



TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((n.nd + 1.0) / (df.df + 1.0)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rk
  FROM s
)
SELECT doc_id, term, CAST(rk AS BIGINT) AS "rank" FROM r WHERE rk <= 3
"""


_NGRAM_DECON_SQL = """
        WITH ev AS (
            SELECT DISTINCT array_to_string(
                list_slice(string_split(lower(text), ' '), 3, 10), ' '
            ) AS ng
            FROM documents WHERE doc_id < 50
        ),
        tl AS (
            SELECT doc_id, string_split(lower(text), ' ') AS ts
            FROM documents
        ),
        st AS (
            SELECT doc_id, ts,
                   unnest(generate_series(1, len(ts) - 7)) AS i
            FROM tl
        ),
        ng AS (
            SELECT doc_id,
                   array_to_string(list_slice(ts, i, i + 7), ' ') AS ng
            FROM st
        ),
        hits AS (SELECT DISTINCT ng.doc_id, ng.ng FROM ng JOIN ev USING (ng))
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_ngrams
        FROM hits GROUP BY 1
    """


def _pretrain_sql(seq_len: int = 512) -> str:
    """Headline pretraining-data pipeline oracle: the full curation
    query (_CURATION_SQL) and the n-gram decontamination query
    (_NGRAM_DECON_SQL) wrapped as CTEs (a CTE body may carry its own
    WITH in DuckDB), survivors anti-joined, then the pack_sequences
    window prefix-sum in Knuth-hash order — every piece the SAME text
    as its standalone oracle, so the composition cannot drift."""
    return f"""
WITH cur AS ({_CURATION_SQL}),
hits AS ({_NGRAM_DECON_SQL}),
clean AS (
  SELECT doc_id, n_tokens FROM cur
  WHERE doc_id NOT IN (SELECT doc_id FROM hits)
),
d AS (
  SELECT doc_id, n_tokens,
         (doc_id * 2654435761) % 4294967296 AS ord
  FROM clean
),
p AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM d
)
SELECT doc_id, start_tok,
       CAST(start_tok // {seq_len} AS BIGINT) AS first_seq,
       CAST(CASE WHEN n_tokens > 0
                 THEN (start_tok + n_tokens - 1) // {seq_len}
                 ELSE start_tok // {seq_len} END AS BIGINT) AS last_seq
FROM p
"""


def _winnowing_sql(k: int = 8, w: int = 4, prefix_len: int = 200) -> str:
    """Winnowing oracle: replay the k-gram byte packing + splitmix64
    hash, then select each window's rightmost-min via a MAX over the
    HUGEINT pack ``(2^64-1 - hash) * 2^32 + pos`` (min hash wins, ties
    to the LARGEST position), dedup (doc, pos).  ASCII prefix only —
    the engine's documented contract (char pos == byte pos)."""
    pack = " + ".join(
        f"ascii(substr(s, i + {b}, 1)) * {256 ** b}::HUGEINT"
        for b in range(k)
    )
    sm = _sql_splitmix_stages("wn", {"f": f"({pack})"}, "g")
    u64max = (1 << 64) - 1
    return f"""
        WITH t AS (
          SELECT doc_id, substr(lower(text), 1, {prefix_len}) AS s
          FROM documents WHERE text IS NOT NULL
        ),
        a AS (
          SELECT doc_id, s FROM t
          WHERE length(s) >= {k + w - 1}
            AND octet_length(encode(s)) = length(s)
        ),
        g AS (
          SELECT doc_id, s, gs.i
          FROM a CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, length(s) - {k - 1}))
                   AS i
          ) gs
        ),
        {sm},
        pk AS (
          SELECT doc_id, i, h_f,
                 ({u64max}::HUGEINT - h_f) * 4294967296 + i AS pack,
                 COUNT(*) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
                 ) AS wlen
          FROM wn6
        ),
        win AS (
          SELECT doc_id,
                 MAX(pack) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
                 ) AS sel,
                 wlen
          FROM pk
        ),
        sel AS (
          SELECT DISTINCT doc_id,
                 CAST(sel % 4294967296 AS BIGINT) AS pos,
                 ({u64max}::HUGEINT - sel // 4294967296) AS fp_u
          FROM win WHERE wlen = {w}
        )
        SELECT doc_id, pos,
               CAST(CASE WHEN fp_u >= 9223372036854775808::HUGEINT
                         THEN fp_u - 18446744073709551616::HUGEINT
                         ELSE fp_u END AS BIGINT) AS fp
        FROM sel
    """




def _compact_cells_sql(res: int = 4, min_res: int = 2) -> str:
    """Cell-compaction oracle: unrolled per-level peels — parents with
    all 4 children present promote, partial-group children are kept
    final.  Shares the bit-layout SQL with the engine via
    ``qcell.parent_sql_expr``."""
    cell = qcell.cell_sql_expr(
        _derive_lat_sql("event_id"), _derive_lon_sql("event_id"), res
    )
    parts = [
        f"pts AS (SELECT {cell} AS cell FROM events)",
        f"c{res} AS MATERIALIZED (SELECT DISTINCT cell FROM pts)",
    ]
    keeps = []
    for r in range(res, min_res, -1):
        par = qcell.parent_sql_expr("cell")
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT {par} AS p, COUNT(*) AS n "
            f"FROM c{r} GROUP BY 1)"
        )
        parts.append(
            f"k{r} AS (SELECT cell FROM c{r} JOIN p{r} "
            f"ON {par} = p{r}.p WHERE p{r}.n < 4)"
        )
        parts.append(
            f"c{r - 1} AS MATERIALIZED "
            f"(SELECT p AS cell FROM p{r} WHERE n = 4)"
        )
        keeps.append(f"SELECT cell FROM k{r}")
    keeps.append(f"SELECT cell FROM c{min_res}")
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(keeps)
    return f"WITH {body}\n{union}"


def _pr_curve_sql() -> str:
    """PR-curve oracle: the full classifier hash-replay SQL as a
    subquery, joined back to documents for the lang ground truth,
    cross-joined with the fixed threshold grid."""
    from geodata_ray.pipelines.queries import _PR_THRESHOLDS

    vals = ", ".join(f"({t})" for t in _PR_THRESHOLDS)
    return f"""
WITH sc AS MATERIALIZED ({_classifier_sql()}),
lab AS (
  SELECT sc.doc_id, sc.score, (d.lang = 'en') AS pos
  FROM sc JOIN documents d USING (doc_id)
),
t(threshold) AS (VALUES {vals})
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(SUM(CASE WHEN score >= threshold AND pos
                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN score >= threshold AND NOT pos
                THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN score < threshold AND pos
                THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN score < threshold AND NOT pos
                THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM lab CROSS JOIN t GROUP BY 1
"""




def _ann_recall_sql() -> str:
    """ANN recall@5 oracle: the exact and IVF top-k replays as
    materialized subqueries, intersected per query."""
    return f"""
WITH ex AS MATERIALIZED ({ANN_TOPK_SQL}),
iv AS MATERIALIZED ({_ivf_sql()}),
hits AS (
  SELECT ex.query_id,
         CAST(COUNT(iv.neighbor_id) AS BIGINT) AS n_hits
  FROM ex LEFT JOIN iv
    ON ex.query_id = iv.query_id
   AND ex.neighbor_id = iv.neighbor_id
  GROUP BY 1
)
SELECT query_id, n_hits,
       CAST(n_hits * 10000 // 5 AS BIGINT) AS recall_bp
FROM hits
"""


def _winnowing_pairs_sql(min_shared: int = 3, max_df: int = 50) -> str:
    """MOSS match-join oracle: the winnowing replay as a materialized
    subquery, the paper's max-df stopword cut on hot fingerprints,
    then a fingerprint-equality self join + pair count."""
    return f"""
WITH sel AS MATERIALIZED ({_winnowing_sql()}),
d0 AS (SELECT DISTINCT doc_id, fp FROM sel),
hot AS (SELECT fp FROM d0 GROUP BY 1 HAVING COUNT(*) > {max_df}),
d AS (SELECT * FROM d0 WHERE fp NOT IN (SELECT fp FROM hot))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
"""


_QLOG2_CTE = """
it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT) << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM vals
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
),
q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16)
"""


def _source_entropy_sql() -> str:
    """Per-source byte entropy oracle: codepoint unnest (== bytes on
    the ASCII-filtered docs), grouped counts, the shared fixed-point
    qlog2 recursive CTE, exact integer fold."""
    return f"""
WITH RECURSIVE a AS (
  SELECT source, text FROM documents
  WHERE text IS NOT NULL
    AND octet_length(encode(text)) = length(text)
),
ch AS (
  SELECT source, ascii(substr(text, gs.i, 1)) AS byte
  FROM a CROSS JOIN LATERAL (
    SELECT UNNEST(generate_series(1, length(text))) AS i
  ) gs
),
cnt AS (
  SELECT source, CAST(byte AS BIGINT) AS byte,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ch GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM cnt GROUP BY 1
),
vals AS (
  SELECT DISTINCT c FROM (
    SELECT n AS c FROM cnt UNION ALL SELECT total FROM tot)
),
{_QLOG2_CTE}
SELECT cnt.source, tot.total AS n_bytes,
       CAST(SUM(cnt.n * (qt.qlog2 - qc.qlog2)) AS BIGINT) AS entropy_q
FROM cnt
JOIN tot USING (source)
JOIN q qc ON qc.c = cnt.n
JOIN q qt ON qt.c = tot.total
GROUP BY 1, 2
"""


_ORACLE_SQL_STATIC = {
    "q1_pricing_summary": Q1_SQL,
    "tiles_r7_events": TILES_R7_SQL,
    "bbox_filter_events": BBOX_SQL,
    "top10_orders": TOP10_SQL,
    "dedup_documents_exact": DEDUP_SQL,
    "daily_user_value": DAILY_SQL,
    "customer_nation_revenue": CUST_NATION_SQL,
    "orders_per_segment": SEGMENT_SQL,
    "customers_without_big_orders": NO_BIG_ORDERS_SQL,
    "lang_counts": LANG_SQL,
    "near_dup_pairs": NEAR_DUP_SQL,
    # exact prefix-filter set-similarity join (recall 1, no MinHash)
    "setsim_join_docs": _jaccard_pairs_sql("0.7"),
    # pruned scan must equal the full-scan filter (proves the zone map
    # is conservative)
    "zonemap_pruned_scan_events": """
        SELECT event_id, value FROM events WHERE value >= 200.0
    """,
    "embedding_dups": EMBEDDING_DUPS_SQL,
    "ann_topk_embeddings": ANN_TOPK_SQL,
    "token_stats_docs": TOKEN_STATS_SQL,
    "hourly_event_counts": HOURLY_SQL,
    "session_windows_users": SESSIONS_SQL,
    "lineitem_part_join": PART_JOIN_SQL,
    "sliding_event_counts": SLIDING_SQL,
    "top3_orders_per_segment": TOP3_SEGMENT_SQL,
    "sample_docs_hash": SAMPLE_SQL,
    "props_json_extract": PROPS_JSON_SQL,
    "pip_boxes_events": PIP_BOXES_SQL,
    "zonal_stats_events": ZONAL_STATS_SQL,
    "image_ahash_dups": _image_ahash_sql(),
    # conversion funnel — chained MIN-after-threshold CTEs
    "funnel_users_events": """
        WITH a AS (
          SELECT user_id, MIN(epoch_us(ts)) AS ta FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        b AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS tb
          FROM events e JOIN a ON e.user_id = a.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > a.ta
          GROUP BY 1
        ),
        c AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS tc
          FROM events e JOIN b ON e.user_id = b.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > b.tb
          GROUP BY 1
        ),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id,
               COALESCE(a.ta, -1) AS view_us,
               COALESCE(b.tb, -1) AS click_us,
               COALESCE(c.tc, -1) AS purchase_us,
               CASE WHEN c.tc IS NOT NULL THEN 3
                    WHEN b.tb IS NOT NULL THEN 2
                    WHEN a.ta IS NOT NULL THEN 1 ELSE 0 END AS n_stages
        FROM u
        LEFT JOIN a USING (user_id)
        LEFT JOIN b USING (user_id)
        LEFT JOIN c USING (user_id)
    """,
    # kNN majority-vote classification — same ranking expression as
    # the audited ANN oracle, k=10, then a windowed vote
    "knn_classify_embeddings": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 25),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
                 list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
          FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id ASC)
                     AS rank
          FROM scored
        ),
        votes AS (
          SELECT query_id, CAST(label AS BIGINT) AS label,
                 COUNT(*) AS n_votes
          FROM ranked WHERE rank <= 10 GROUP BY 1, 2
        )
        SELECT query_id, label AS pred_label,
               CAST(n_votes AS BIGINT) AS n_votes
        FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label ASC) = 1
    """,
    # time-windowed keep-first dedup — QUALIFY row_number replay
    "windowed_dedup_events": """
        WITH p AS (
          SELECT user_id, event_type,
                 epoch_us(ts) // 604800000000 AS week, ts, event_id
          FROM events
        )
        SELECT user_id, event_type, week, event_id FROM p
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type, week
            ORDER BY ts, event_id) = 1
    """,
    # one-pass corpus data-card — token convention matches the shared
    # kernel (space split of COALESCE(text,''))
    "corpus_stats_docs": """
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(COALESCE(text, ''), ' ')))
                    AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(MAX(len(string_split(COALESCE(text, ''), ' ')))
                    AS BIGINT) AS max_doc_tokens
        FROM documents
    """,
    # per-vertex triangle counts — 3-way self-join on the canonical
    # undirected edge set from the PageRank host-graph arithmetic
    "triangle_counts_hosts": """
        WITH raw AS (
          SELECT doc_id % 97 AS u,
                 (doc_id % 97 + 1 + (doc_id * j) % 96) % 97 AS v
          FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(j)
        ),
        e AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
          FROM raw WHERE u <> v
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        verts AS (
          SELECT x AS host FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        )
        SELECT host, COUNT(*) AS n_triangles FROM verts GROUP BY 1
    """,
    "daily_distinct_users": """
        SELECT DATE_TRUNC('day', ts) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    """,
    # ROLLUP levels derive from one finest-level exchange engine-side;
    # the SQL recomputes all levels directly
    "cube_daily_type_events": """
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        GROUP BY CUBE (event_type, 2)
    """,
    "rollup_daily_events": """
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        GROUP BY ROLLUP(event_type, day)
    """,
    # engine discovers the pivoted value set dynamically; the SQL
    # necessarily states it (conditional aggregation)
    "pivot_event_types_daily": """
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY 1
    """,
    # exact integer moment matrix (one mergeable row)
    "moment_matrix_lineitem": """
        WITH m AS (
          SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
                 CAST(ROUND(l_discount * 100) AS BIGINT) AS d
          FROM lineitem
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(p) AS BIGINT) AS sp,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(q * q) AS BIGINT) AS sqq,
               CAST(SUM(p * p) AS BIGINT) AS spp,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(q * p) AS BIGINT) AS sqp,
               CAST(SUM(q * d) AS BIGINT) AS sqd,
               CAST(SUM(p * d) AS BIGINT) AS spd
        FROM m
    """,
    # exact integer z-score: (n*x-S)^2 > k^2*(n*SS-S^2), no float math
    "outlier_events_zscore": """
        WITH b AS (
          SELECT event_id, user_id,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        m AS (
          SELECT user_id, CAST(COUNT(cents) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s,
                 CAST(SUM(cents * cents) AS BIGINT) AS ss
          FROM b GROUP BY 1
        )
        SELECT b.user_id, b.event_id, b.cents
        FROM b JOIN m USING (user_id)
        WHERE b.cents IS NOT NULL AND m.n >= 8
          AND (m.n * b.cents - m.s) * (m.n * b.cents - m.s)
              > 9 * (m.n * m.ss - m.s * m.s)
    """,
    # weighted mean as exact (num, den) integer ratio
    "weighted_discount_lineitem": """
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                        * CAST(ROUND(l_discount * 100) AS BIGINT))
                    AS BIGINT) AS wnum,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                   AS wden
        FROM lineitem GROUP BY 1
    """,
    # day-over-day delta: LAG guarded to consecutive calendar days
    "daily_delta_events": """
        WITH d AS (
          SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS cents
          FROM events GROUP BY 1
        )
        SELECT day, cents,
               CASE WHEN day - LAG(day) OVER (ORDER BY day)
                         = INTERVAL 1 DAY
                    THEN cents - LAG(cents) OVER (ORDER BY day)
               END AS delta_cents
        FROM d
    """,
    # MERGE INTO: LEFT JOIN change set + CASE, inserts unioned
    "merge_upsert_events": """
        WITH base AS (
          SELECT event_id AS id,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT id,
               CASE WHEN id % 10 = 0 THEN cents + 100 ELSE cents END
                   AS cents
        FROM base WHERE id % 10 <> 1
        UNION ALL
        SELECT id + 1000000000, cents + 5 FROM base WHERE id % 10 = 2
    """,
    # schema evolution: v1-writer rows surface with NULL event_type
    "schema_evolution_read_events": """
        SELECT event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN event_id % 2 = 1 THEN event_type END
                   AS event_type
        FROM events
    """,
    # time travel: snapshot v1 must equal the plain timestamp filter
    "time_travel_events": """
        SELECT event_id, strftime(ts, '%Y-%m-%d') AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE ts < TIMESTAMP '2024-01-15'
    """,
    # bot signature: LAG gaps in floor-seconds, exact integer moments
    "bot_signature_users": """
        WITH b AS (
          SELECT user_id, epoch_us(ts) // 1000000 AS ts_s,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rk
          FROM events
        ),
        g AS (
          SELECT a.user_id, b2.ts_s - a.ts_s AS gap
          FROM b a JOIN b b2
            ON a.user_id = b2.user_id AND b2.rk = a.rk + 1
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap) AS BIGINT) AS gap_sum_s,
               CAST(SUM(gap * gap) AS BIGINT) AS gap_sumsq_s,
               COUNT(*) >= 10
               AND COUNT(*) * SUM(gap * gap) - SUM(gap) * SUM(gap) = 0
                 AS is_regular
        FROM g GROUP BY 1
    """,
    # URL template mining: derived paths, digit runs -> N, counts
    "url_templates_docs": """
        WITH p AS (
          SELECT CASE WHEN doc_id % 2 = 0 THEN
              '/' || chr(97 + CAST(doc_id % 5 AS INT)) || '/item/'
              || CAST(doc_id * 7 % 1000 AS VARCHAR)
              || '/page/' || CAST(doc_id % 13 AS VARCHAR)
            ELSE
              '/post/' || CAST(doc_id AS VARCHAR)
              || '/comment/' || CAST(doc_id % 7 AS VARCHAR)
            END AS path
          FROM documents
        )
        SELECT regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
               CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM p GROUP BY 1
    """,
    # frontier politeness: within-host rank * n_hosts + host
    "crawl_frontier_order": """
        SELECT doc_id, doc_id % 101 AS host,
               CAST((ROW_NUMBER() OVER (PARTITION BY doc_id % 101
                                        ORDER BY doc_id) - 1) * 101
                    + doc_id % 101 AS BIGINT) AS fetch_slot
        FROM documents
    """,
    # language-ID confidence: unpivot the four counts, rank, margin
    "langid_margin_docs": """
        WITH w AS (
          SELECT doc_id,
                 list_distinct(string_split(lower(text), ' ')) AS ws
          FROM documents
        ),
        c AS (
          SELECT doc_id,
            len(list_intersect(ws, ['the','a','of','to','and','is']))
              AS n_en,
            len(list_intersect(ws, ['el','la','de','que','y','los']))
              AS n_es,
            len(list_intersect(ws, ['der','die','und','das','nicht','ist']))
              AS n_de,
            len(list_intersect(ws, ['le','la','et','les','des','un']))
              AS n_fr
          FROM w
        ),
        u AS (
          SELECT doc_id, v,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY v DESC) AS rk
          FROM (
            SELECT doc_id, n_en AS v FROM c
            UNION ALL SELECT doc_id, n_es FROM c
            UNION ALL SELECT doc_id, n_de FROM c
            UNION ALL SELECT doc_id, n_fr FROM c
          )
        )
        SELECT doc_id,
               CAST(MAX(CASE WHEN rk = 1 THEN v END) AS BIGINT) AS n_top1,
               CAST(MAX(CASE WHEN rk = 1 THEN v END)
                    - MAX(CASE WHEN rk = 2 THEN v END) AS BIGINT)
                   AS margin
        FROM u GROUP BY doc_id
    """,
    # video cut-detection audit: adjacent-frame pixel replay
    "scene_deltas_video": _scene_deltas_sql(),
    # vocabulary coverage curve: ranked cumulative share, integer bp
    "vocab_coverage_docs": """
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        wc AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1
        ),
        r AS (
          SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) AS rk
          FROM wc
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM wc)
        SELECT CAST(k AS BIGINT) AS k,
               CAST(10000 * (SELECT SUM(n) FROM r WHERE rk <= v.k)
                    // (SELECT t FROM tot) AS BIGINT) AS coverage_bp
        FROM (VALUES (100), (1000), (10000)) v(k)
    """,
    # WAV decode audit: splitmix sample replay + framewise energy
    "audio_energy_frames": _audio_energy_sql(),
    # resize audit: generator pixel replay + integer dim rounding
    "resize_checksum_images": _resize_checksum_sql(),
    # --- sixth wave (round 5) ---
    # robust MAD outliers: ceil-rank median + MAD per key, 3*MAD flag
    "robust_outliers_events": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cents) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM c
        ),
        m AS (
          SELECT event_type, cents AS med FROM r
          WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
        ),
        d AS (
          SELECT c.event_id, c.event_type, c.cents, m.med,
                 ABS(c.cents - m.med) AS dev
          FROM c JOIN m USING (event_type)
        ),
        r2 AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY dev) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM d
        ),
        md AS (
          SELECT event_type, dev AS mad FROM r2
          WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
        )
        SELECT d.event_id, d.event_type, d.cents, d.med, md.mad
        FROM d JOIN md USING (event_type)
        WHERE d.dev > 3 * md.mad
    """,
    # fixed-radius spatial self-join on the derived integer grid:
    # band-predicate self-join over identical splitmix coordinates
    "radius_join_events": f"""
        WITH c0 AS (SELECT event_id FROM events),
        {_sql_splitmix_stages(
            "rj",
            {
                "x": "CAST(event_id AS HUGEINT)",
                "y": _sql_xor_u64(
                    "CAST(event_id AS HUGEINT)",
                    str(0xD1B54A32D192ED03) + "::HUGEINT",
                ),
            },
            "c0",
        )},
        p AS (
          SELECT event_id AS id,
                 CAST(h_x % 4096 AS BIGINT) AS qx,
                 CAST(h_y % 4096 AS BIGINT) AS qy
          FROM rj6
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST((a.qx - b.qx) * (a.qx - b.qx)
                  + (a.qy - b.qy) * (a.qy - b.qy) AS BIGINT) AS d2
        FROM p a JOIN p b
          ON a.id < b.id
         AND b.qx BETWEEN a.qx - 64 AND a.qx + 64
         AND b.qy BETWEEN a.qy - 64 AND a.qy + 64
         AND (a.qx - b.qx) * (a.qx - b.qx)
           + (a.qy - b.qy) * (a.qy - b.qy) <= 4096
    """,
    # event-time watermark lateness: running max over strictly earlier
    # ARRIVALS (event_id order) minus 600 s allowed lateness
    "late_events_watermark": f"""
        WITH w AS (
          SELECT event_id, ts,
                 MAX(ts) OVER (ORDER BY (event_id * {_GEO_A}) % {_GEO_M}
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS mx
          FROM events
        )
        SELECT event_id, ts,
               CAST((epoch_us(mx) - 600000000 - epoch_us(ts))
                    // 1000000 AS BIGINT) AS lateness_sec
        FROM w
        WHERE mx IS NOT NULL
          AND epoch_us(ts) < epoch_us(mx) - 600000000
    """,
    # TPC-H Q4-shaped EXISTS semi-join on available columns
    "q4_priority_exists": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        )
        GROUP BY 1
    """,
    # TPC-H Q10-shaped returned revenue, exact integer micro-units
    "q10_returned_revenue": """
        WITH r AS (
          SELECT l_orderkey,
                 CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100.0)
                      AS BIGINT)
                 * (10000 - CAST(ROUND(CAST(l_discount AS DOUBLE)
                                       * 10000.0) AS BIGINT))
                     AS rev_micro
          FROM lineitem WHERE l_returnflag = 'R'
        )
        SELECT n_name,
               CAST(SUM(rev_micro) AS BIGINT) AS revenue_micro,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM r
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
    # TPC-H Q7-shaped cross-nation volume (exact integer micro-units;
    # every different nation pair so the result is non-empty at all SFs)
    "q7_nation_volume": f"""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 {REV_MICRO_SQL} AS rev_micro,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               l_year,
               CAST(SUM(rev_micro) AS BIGINT) AS revenue_micro
        FROM l
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE ns.n_name <> nc.n_name
        GROUP BY 1, 2, 3
    """,
    # TPC-H Q9-shaped profit by supplier nation x order year
    "q9_profit_by_nation_year": f"""
        SELECT n_name AS supp_nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM({REV_MICRO_SQL}) AS BIGINT) AS profit_micro
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE 'red %'
        GROUP BY 1, 2
    """,
    # TPC-H Q14-shaped promo share (exact integer num/denominator)
    "q14_promo_revenue": f"""
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN {REV_MICRO_SQL} ELSE 0 END)
                    AS BIGINT) AS promo_rev_micro,
               CAST(SUM({REV_MICRO_SQL}) AS BIGINT) AS total_rev_micro,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    # TPC-H Q15-shaped top supplier(s) by quarterly revenue
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM({REV_MICRO_SQL}) AS BIGINT)
                     AS total_revenue_micro
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue_micro
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue_micro = (SELECT MAX(total_revenue_micro)
                                     FROM rev)
    """,
    # TPC-H Q17-shaped small-quantity revenue (exact integer
    # decorrelated threshold: qty < 0.2*avg  <=>  5*qty*cnt < sum)
    "q17_small_quantity_revenue": """
        WITH lf AS (
          SELECT l_partkey,
                 CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                 CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100.0)
                      AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ),
        ag AS (
          SELECT l_partkey AS pk, SUM(qty) AS sum_qty,
                 COUNT(*) AS cnt
          FROM lf GROUP BY 1
        )
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(SUM(cents) AS BIGINT) AS total_price_cents,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lf JOIN ag ON l_partkey = pk
        WHERE 5 * qty * cnt < sum_qty
    """,
    # TPC-H Q2-shaped correlated-min supplier per part
    "q2_min_cost_supplier": """
        WITH eu AS (
          SELECT s_suppkey, s_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        cost AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100.0)
                          AS BIGINT)) AS cost_cents
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN eu   ON l_suppkey = s_suppkey
          WHERE p_size = 15 AND p_type = 'STANDARD'
          GROUP BY 1, 2
        ),
        best AS (
          SELECT l_partkey AS bpk, MIN(cost_cents) AS min_cost_cents
          FROM cost GROUP BY 1
        )
        SELECT s_name, l_partkey AS p_partkey,
               cost_cents AS min_cost_cents
        FROM cost
        JOIN best ON l_partkey = bpk AND cost_cents = best.min_cost_cents
        JOIN eu   ON l_suppkey = s_suppkey
    """,
    # TPC-H Q8-shaped market share (exact integer num/denominator)
    "q8_market_share": f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                             THEN {REV_MICRO_SQL} ELSE 0 END)
                    AS BIGINT) AS nation_rev_micro,
               CAST(SUM({REV_MICRO_SQL}) AS BIGINT) AS total_rev_micro
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    # TPC-H Q11-shaped HAVING against a global scalar (exact integer)
    "q11_important_parts": f"""
        WITH v AS (
          SELECT l_partkey AS p_partkey,
                 CAST(SUM({REV_MICRO_SQL}) AS BIGINT) AS value_micro
          FROM lineitem GROUP BY 1
        )
        SELECT p_partkey, value_micro FROM v
        WHERE value_micro > (SELECT (3 * SUM(value_micro))
                                    // (2 * COUNT(*)) FROM v)
    """,
    # TPC-H Q13-shaped order-count distribution (zero customers kept)
    "q13_order_count_distribution": """
        WITH pc AS (
          SELECT c_custkey, COUNT(o_custkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY 1
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM pc GROUP BY 1
    """,
    # TPC-H Q16-shaped distinct-supplier counts by part attributes
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
              WHERE l_suppkey % 7 <> 0) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY 1, 2, 3
    """,
    # TPC-H Q20-shaped nested semi-join with HAVING
    "q20_qty_semijoin": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small %'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 50
        )
    """,
    # TPC-H Q21-shaped sole-late-supplier wait counts
    "q21_sole_late_supplier": """
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_shipdate > o_orderdate
                                            + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY 1, 2
        ),
        og AS (
          SELECT l_orderkey AS ok, COUNT(*) AS n_supp,
                 SUM(late) AS n_late
          FROM lo GROUP BY 1
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lo
        JOIN og ON l_orderkey = ok
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE late = 1 AND n_supp >= 2 AND n_late = 1
        GROUP BY 1
    """,
    # TPC-H Q6-shaped forecast revenue (exact basis-point filter)
    "q6_forecast_revenue": """
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(ROUND(l_discount * 10000) AS BIGINT))
                    AS BIGINT) AS revenue_micro,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND CAST(ROUND(l_discount * 10000) AS BIGINT)
              BETWEEN 500 AND 700
          AND l_quantity < 24
    """,
    # TPC-H Q12-shaped late-line priority counts by return flag
    # (lateness = ship > orderdate + 60 days, the q21 convention)
    "q12_late_lines_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1
    """,
    # association rules: exact integer support/confidence/lift
    # components per unordered event-type pair
    "association_rules_events": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        p AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM d a JOIN d b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
          GROUP BY 1, 2
        ),
        t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
              FROM d GROUP BY 1),
        u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
              FROM d)
        SELECT type_a, type_b, n_ab,
               ta.n_t AS n_a, tb.n_t AS n_b, u.n_users
        FROM p
        JOIN t ta ON ta.event_type = type_a
        JOIN t tb ON tb.event_type = type_b
        CROSS JOIN u
    """,
    # NTILE(4) quartiles over per-user total value cents
    # (deterministic tiebreak: ORDER BY cents, user_id)
    "ntile_value_users": """
        WITH agg AS (
          SELECT user_id,
                 CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
          FROM events GROUP BY 1
        )
        SELECT user_id, cents,
               CAST(NTILE(4) OVER (ORDER BY cents, user_id)
                    AS BIGINT) AS tile
        FROM agg
    """,
    # weighted median unit price over the (cents -> quantity) histogram
    "weighted_median_lineitem": """
        WITH h AS (
          SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                      AS BIGINT) AS w
          FROM lineitem GROUP BY 1
        ),
        c AS (
          SELECT cents, w,
                 SUM(w) OVER (ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw
          FROM h
        ),
        t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM h)
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(MIN(cents) AS BIGINT) AS median_cents,
               CAST(MIN(tw) AS BIGINT) AS total_weight
        FROM c, t WHERE cw * 2 >= tw
    """,
    # 16-way equi-depth partition plan + realized partition audit
    "range_partition_plan_events": """
        WITH o AS (
          SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r AS (
          SELECT cents,
                 ROW_NUMBER() OVER (ORDER BY cents) AS rn,
                 COUNT(*) OVER () AS n
          FROM o
        ),
        b AS (
          SELECT q.i, r.cents AS bv
          FROM r JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),
                              (9),(10),(11),(12),(13),(14),(15))
                      q(i)
            ON r.rn = CAST(ceil(q.i * r.n / 16.0) AS BIGINT)
        ),
        p AS (
          SELECT o.cents,
                 (SELECT COUNT(*) FROM b WHERE b.bv < o.cents)
                     AS partition_id
          FROM o
        )
        SELECT partition_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM p GROUP BY 1
    """,
    # deterministic class balancing: copies to reach the majority size
    "class_balance_docs": """
        WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents
                   GROUP BY 1),
        m AS (SELECT MAX(cnt) AS target FROM c),
        r AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY doc_id) - 1 AS rk
          FROM documents
        )
        SELECT r.doc_id, r.lang,
               CAST(m.target // c.cnt
                    + CASE WHEN r.rk < m.target % c.cnt
                           THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM r JOIN c ON r.lang = c.lang CROSS JOIN m
    """,
    # per-user median inter-arrival gap (ceil-rank quantile_disc)
    "interarrival_median_users": """
        WITH o AS (
          SELECT user_id,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS pts,
                 ts
          FROM events
        ),
        d AS (
          SELECT user_id,
                 CAST(epoch_us(ts) - epoch_us(pts) AS BIGINT) AS gap_us
          FROM o WHERE pts IS NOT NULL
        ),
        r AS (
          SELECT user_id, gap_us,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY gap_us) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM d
        )
        SELECT user_id, CAST(50 AS BIGINT) AS q_pct, gap_us
        FROM r WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
    """,
    # STRING_AGG of the sorted distinct per-day event types
    "string_agg_daily_types_events": """
        WITH d AS (SELECT DISTINCT
                     CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                     event_type
                   FROM events)
        SELECT day,
               STRING_AGG(event_type, ',' ORDER BY event_type)
                   AS types_csv,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM d GROUP BY day
    """,
    # TPC-H Q19-shaped disjunctive-predicate revenue, by brand branch
    "q19_or_predicates_revenue": f"""
        SELECT p_brand,
               CAST(SUM({REV_MICRO_SQL}) AS BIGINT) AS revenue_micro,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1'
               AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#2'
               AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3'
               AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)
        GROUP BY 1
    """,
    # reciprocal (mutual) directed edges on the derived host graph
    "mutual_links_hosts": """
        WITH e AS (
          SELECT DISTINCT u, v FROM (
            SELECT doc_id % 97 AS u,
                   ((doc_id % 97) * 3 + doc_id % 7 + 1) % 97 AS v
            FROM documents
            UNION ALL
            SELECT doc_id % 97,
                   ((doc_id % 97) * 5 + doc_id % 11 + 2) % 97
            FROM documents
          ) WHERE u <> v
        )
        SELECT a.u, a.v
        FROM e a JOIN e b ON a.u = b.v AND a.v = b.u
        WHERE a.u < a.v
    """,
    # --- seventh wave (round 5) ---
    # keyed interval union: gaps-and-islands running max over ends
    "interval_coverage_users": """
        WITH iv AS (
          SELECT user_id, epoch_us(ts) AS s,
                 epoch_us(ts) + 300000000 AS e
          FROM events
        ),
        w AS (
          SELECT user_id, s, e,
                 MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS m
          FROM iv
        )
        SELECT user_id,
               CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(m, s - 1)), 0))
                    AS BIGINT) AS covered_us
        FROM w GROUP BY 1
    """,
    # weighted SSSP: bounded recursive-CTE path enumeration (UNION
    # dedupes (v, d) states; non-negative weights make every prefix of
    # a sub-cutoff path sub-cutoff, so MIN over enumerated paths is
    # the true distance for every node with dist < 150)
    "sssp_hosts": """
        WITH RECURSIVE e AS (
          SELECT u, v, 1 + (u * 7 + v * 13) % 9 AS w FROM (
            SELECT DISTINCT u, v FROM (
              SELECT doc_id % 97 AS u,
                     ((doc_id % 97) * 3 + doc_id % 7 + 1) % 97 AS v
              FROM documents
              UNION ALL
              SELECT doc_id % 97,
                     ((doc_id % 97) * 5 + doc_id % 11 + 2) % 97
              FROM documents
            ) WHERE u <> v
          )
        ),
        p(v, d) AS (
          SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
          UNION
          SELECT e.v, p.d + e.w FROM p JOIN e ON e.u = p.v
          WHERE p.d + e.w < 150
        )
        SELECT v AS node, CAST(MIN(d) AS BIGINT) AS dist
        FROM p GROUP BY 1
    """,
    # seasonal count anomaly: exact integer 3-sigma on bucket counts
    "seasonal_anomaly_events": """
        WITH b AS (
          SELECT event_type,
                 epoch_us(ts) // 86400000000 AS day_idx,
                 (epoch_us(ts) // 3600000000) % 24 AS hour,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2, 3
        ),
        m AS (
          SELECT event_type, hour, COUNT(*) AS n,
                 SUM(x) AS s, SUM(x * x) AS ss
          FROM b GROUP BY 1, 2
        )
        SELECT b.event_type, CAST(b.day_idx AS BIGINT) AS day_idx,
               CAST(b.hour AS BIGINT) AS hour, b.x AS n_events
        FROM b JOIN m USING (event_type, hour)
        WHERE m.n >= 3
          AND (m.n * b.x - m.s) * (m.n * b.x - m.s)
              > 9 * (m.n * m.ss - m.s * m.s)
    """,
    # integer Efraimidis-Spirakis bottom-k: splitmix priority // weight
    "weighted_sample_events": f"""
        WITH c0 AS (
          SELECT event_id,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        {_sql_splitmix_stages(
            "ws", {"s": "CAST(event_id AS HUGEINT)"}, "c0"
        )},
        p AS (
          SELECT event_id,
                 CAST(((cents % 1000) + 1000) % 1000 + 1 AS BIGINT) AS w,
                 CAST((h_s // 2)
                      // (((cents % 1000) + 1000) % 1000 + 1)
                      AS BIGINT) AS priority
          FROM ws6
        )
        SELECT event_id, w, priority FROM p
        ORDER BY priority, event_id LIMIT 100
    """,
    # distinct day-of-month bits: OR == SUM over distinct powers
    "activity_bitmap_users": """
        WITH d AS (SELECT DISTINCT user_id, day(ts) AS dom FROM events)
        SELECT user_id,
               CAST(SUM(1::BIGINT << (dom - 1)) AS BIGINT) AS bitmap,
               CAST(COUNT(*) AS BIGINT) AS active_days
        FROM d GROUP BY 1
    """,
    # largest-remainder (Hamilton) apportionment, exact integers
    "apportion_crawl_budget": """
        WITH c AS (
          SELECT doc_id % 97 AS host, CAST(COUNT(*) AS BIGINT) AS docs
          FROM documents GROUP BY 1
        ),
        t AS (SELECT SUM(docs) AS total FROM c),
        a AS (
          SELECT host, docs,
                 CAST(docs * 1000000 // (SELECT total FROM t)
                      AS BIGINT) AS base,
                 docs * 1000000 % (SELECT total FROM t) AS rem
          FROM c
        ),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC) AS rk,
                 (SELECT 1000000 - SUM(base) FROM a) AS leftover
          FROM a
        )
        SELECT host, docs,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS budget
        FROM r
    """,
    # r5 rows-only conversions: generator replay for the remaining
    # binary decodes (VERDICT r4 #4)
    "decode_images_ppm": _decode_images_sql(),
    "audio_features_wav": _audio_features_sql(),
    "sample_frames_stream": _sample_frames_sql(),
    # per-row trailing window: RANGE frame with peers, exact count
    "trailing_window_count_events": """
        SELECT event_id,
               CAST(COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_trailing_1h
        FROM events
    """,
    # geohash: Z-order arithmetic interleave + base32 substring decode
    "geohash_events": f"""
        WITH q AS (
          SELECT event_id,
                 CAST(FLOOR(({_derive_lat_sql('event_id')} + 90.0)
                            / 180.0 * 1048576.0) AS BIGINT) AS qy,
                 CAST(FLOOR(({_derive_lon_sql('event_id')} + 180.0)
                            / 360.0 * 1048576.0) AS BIGINT) AS qx
          FROM events
        ),
        g AS (
          SELECT event_id,
                 CAST(SUM(((qy // (1::BIGINT << i)) % 2)
                            * (1::BIGINT << (2 * i))
                          + ((qx // (1::BIGINT << i)) % 2)
                            * (1::BIGINT << (2 * i + 1))) AS BIGINT)
                     AS gh_int
          FROM q, range(20) t(i)
          GROUP BY event_id
        )
        SELECT event_id, gh_int,
               array_to_string(list_transform(range(8), j ->
                 substring('0123456789bcdefghjkmnpqrstuvwxyz',
                   CAST((gh_int // (1::BIGINT << CAST((7 - j) * 5 AS INT)))
                        % 32 AS INT) + 1, 1)), '') AS geohash
        FROM g
    """,
    # SCD2 validity intervals: LEAD over (user, ts, event_id)
    "scd2_intervals_users": """
        SELECT user_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
               CAST(LEAD(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS valid_to_us
        FROM events
    """,
    # data-quality expectation suite: per-check violation counts
    "dq_suite_events": """
        SELECT 'row_count' AS check, CAST(COUNT(*) AS BIGINT)
               AS n_violations FROM events
        UNION ALL SELECT 'event_id_null',
          CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
        UNION ALL SELECT 'value_null',
          CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
        UNION ALL SELECT 'value_negative',
          CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
        UNION ALL SELECT 'value_gt_250',
          CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
        UNION ALL SELECT 'event_type_unknown',
          CAST(SUM(CASE WHEN event_type NOT IN
            ('click','view','purchase','signup','error')
            THEN 1 ELSE 0 END) AS BIGINT) FROM events
        UNION ALL SELECT 'ts_out_of_range',
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
            OR ts >= TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
        UNION ALL SELECT 'event_id_duplicate',
          -- nulls form one group (n nulls = n-1 duplicates), matching
          -- the engine's validity-keyed grouping
          CAST(COUNT(*) - COUNT(DISTINCT event_id)
               - CASE WHEN COUNT(*) > COUNT(event_id) THEN 1 ELSE 0 END
               AS BIGINT) FROM events
    """,
    # entity resolution: recursive-CTE transitive closure over the two
    # blocking keys (pairs within {17j,17j+1} and {23j,23j+1})
    "entity_resolution_customers": """
        WITH RECURSIVE r AS (SELECT c_custkey AS id FROM customer),
        e1 AS (
          SELECT a.id AS u, b.id AS v FROM r a JOIN r b
          ON a.id % 17 <= 1 AND b.id % 17 <= 1
             AND a.id // 17 = b.id // 17 AND a.id < b.id
        ),
        e2 AS (
          SELECT a.id AS u, b.id AS v FROM r a JOIN r b
          ON a.id % 23 <= 1 AND b.id % 23 <= 1
             AND a.id // 23 = b.id // 23 AND a.id < b.id
        ),
        edges AS (
          SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1
          UNION ALL SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2
        ),
        reach(node, rr) AS (
          SELECT id, id FROM r
          UNION
          SELECT e.v, reach.rr FROM reach JOIN edges e ON e.u = reach.node
        )
        SELECT node AS record_id, CAST(MIN(rr) AS BIGINT) AS entity_id
        FROM reach GROUP BY 1
    """,
    # BPE step-1 pair statistics: vocabulary-weighted substring pairs
    "bpe_pair_counts_docs": """
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        wc AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1
        ),
        p AS (
          SELECT substring(word, CAST(i AS INT), 2) AS pair, n
          FROM wc, unnest(range(1, length(word))) AS t(i)
        )
        SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs
        FROM p GROUP BY 1 HAVING SUM(n) >= 100
    """,
    # compaction must be byte-faithful: the oracle IS the source table
    "compact_files_roundtrip": """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
    """,
    # golden record: window argmax joined to grouped profile
    "golden_record_users": """
        WITH base AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        prof AS (
          SELECT user_id,
                 CAST(MIN(ts_us) AS BIGINT) AS first_seen_us,
                 CAST(MAX(ts_us) AS BIGINT) AS last_seen_us,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(cents) AS BIGINT) AS total_cents
          FROM base GROUP BY 1
        ),
        lastt AS (
          SELECT user_id, event_type AS last_type FROM base
          QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts_us DESC,
                                              event_id DESC) = 1
        )
        SELECT prof.*, lastt.last_type
        FROM prof JOIN lastt USING (user_id)
    """,
    # first-occurrence sequence support
    "type_sequence_counts": """
        WITH f AS (
          SELECT user_id, event_type,
                 MIN(epoch_us(ts)) AS t0
          FROM events GROUP BY 1, 2
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM f a
        JOIN f b ON a.user_id = b.user_id AND a.t0 < b.t0
        GROUP BY 1, 2
    """,
    # Pareto skyline: the NOT EXISTS dominance definition
    "skyline_orders": """
        WITH o AS (
          SELECT o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
                 o_orderdate
          FROM orders
        )
        SELECT o_orderkey, price_cents, o_orderdate FROM o b
        WHERE NOT EXISTS (
          SELECT 1 FROM o a
          WHERE a.price_cents >= b.price_cents
            AND a.o_orderdate <= b.o_orderdate
            AND (a.price_cents > b.price_cents
                 OR a.o_orderdate < b.o_orderdate)
        )
    """,
    # distinct-key INTERSECT
    "retained_users_events": """
        SELECT DISTINCT user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-15'
        INTERSECT
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'
    """,
    # fixed-width histogram ($25 bins; cents nonneg so // == floor)
    "value_histogram_events": """
        WITH b AS (
          SELECT CAST(ROUND(value * 100) AS BIGINT) // 2500 AS bin
          FROM events
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(bin * 2500 AS BIGINT) AS lo_cents
        FROM b GROUP BY bin
    """,
    # referential-integrity audit: LEFT JOIN null counts
    "integrity_audit": """
        SELECT 'lineitem_orphan_orders' AS check_name,
               CAST((SELECT COUNT(*) FROM lineitem l
                     LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'orders_orphan_customers',
               CAST((SELECT COUNT(*) FROM orders o
                     LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                     WHERE c.c_custkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'events_users_not_customers',
               CAST((SELECT COUNT(*) FROM events e
                     LEFT JOIN customer c ON e.user_id = c.c_custkey
                     WHERE c.c_custkey IS NULL) AS BIGINT)
    """,
    # market-basket pair support: independent distinct self-join
    "type_pair_support_events": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM d a
        JOIN d b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    # per-row CDF via RANGE window (ties included on both sides)
    "percentile_rank_events": """
        WITH o AS (
          SELECT event_id, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, event_type, cents,
               CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY cents
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS rank_le
        FROM o
    """,
    # integer EWMA: the halving recursion replayed level-by-level
    # (values are non-negative, so // agrees across engines)
    "ewma_user_values": """
        WITH RECURSIVE o AS (
          SELECT user_id, event_id,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ),
        r(user_id, event_id, rn, s) AS (
          SELECT user_id, event_id, rn, cents FROM o WHERE rn = 1
          UNION ALL
          SELECT o.user_id, o.event_id, o.rn, (r.s + o.cents) // 2
          FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        )
        SELECT user_id, event_id, CAST(s AS BIGINT) AS ewma_cents FROM r
    """,
    # grouped mode with deterministic tie-break
    "top_event_type_per_user": """
        SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n
        FROM (
          SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        )
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) = 1
    """,
    # cohort retention triangle
    "cohort_retention_users": """
        WITH w AS (
          SELECT user_id,
                 DATE_DIFF('second', TIMESTAMP '1970-01-01', ts)
                   // 86400 // 7 AS wk
          FROM events
        ),
        f AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY 1)
        SELECT f.cohort AS cohort_week, w.wk - f.cohort AS week_offset,
               CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
        FROM w JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    # Z-order rank: the SQL interleaves bits arithmetically (sum over
    # bit positions) and ranks with ROW_NUMBER over the same order key
    "zorder_rank_events": f"""
        WITH q AS (
          SELECT event_id,
                 CAST(FLOOR(({_derive_lat_sql('event_id')} + 90.0)
                            / 180.0 * 32768.0) AS BIGINT) AS qy,
                 CAST(FLOOR(({_derive_lon_sql('event_id')} + 180.0)
                            / 360.0 * 32768.0) AS BIGINT) AS qx
          FROM events
        ),
        z AS (
          SELECT event_id,
                 CAST(SUM(((qx // (1::BIGINT << i)) % 2)
                            * (1::BIGINT << (2 * i))
                          + ((qy // (1::BIGINT << i)) % 2)
                            * (1::BIGINT << (2 * i + 1))) AS BIGINT)
                     AS zkey
          FROM q, range(15) t(i)
          GROUP BY event_id
        )
        SELECT event_id, zkey,
               CAST(ROW_NUMBER() OVER
                    (ORDER BY zkey * 4294967296 + event_id) - 1
                    AS BIGINT) AS zpos
        FROM z
    """,
    # incremental view maintenance engine-side; the oracle recomputes
    # the whole aggregate from scratch (merge == recompute)
    "incremental_daily_merge": """
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        GROUP BY 1
    """,
    # PMI collocations: the same fixed-point qlog2 recursion the LM
    # oracles use, over N*c_xy and c_x*c_y products
    "pmi_bigrams_docs": """
        WITH RECURSIVE tl AS (
          SELECT string_split(lower(COALESCE(text, '')), ' ') AS ts
          FROM documents
        ),
        uni AS (SELECT unnest(ts) AS term FROM tl),
        cu AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cx
               FROM uni GROUP BY 1),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni),
        st AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
               FROM tl),
        bg AS (
          SELECT ts[i] AS x, ts[i+1] AS y,
                 CAST(COUNT(*) AS BIGINT) AS cxy
          FROM st GROUP BY 1, 2
          HAVING COUNT(*) >= 5
        ),
        j AS (
          SELECT bg.x, bg.y, bg.cxy,
                 (SELECT n FROM nn) * bg.cxy AS ca,
                 cux.cx * cuy.cx AS cb
          FROM bg
          JOIN cu cux ON cux.term = bg.x
          JOIN cu cuy ON cuy.term = bg.y
        ),
        vals AS (
          SELECT DISTINCT c FROM (
            SELECT ca AS c FROM j UNION ALL SELECT cb FROM j)
        ),
        it AS (
          SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
                 CAST((CAST(c AS HUGEINT) * 1073741824)
                      // (CAST(CAST(1 AS BIGINT)
                           << CAST(length(bin(c)) - 1 AS INT)
                           AS HUGEINT)) AS HUGEINT) AS m,
                 CAST(0 AS BIGINT) AS frac, 0 AS k
          FROM vals
          UNION ALL
          SELECT c, msb,
                 CASE WHEN (m * m) // 1073741824 >= 2147483648
                      THEN ((m * m) // 1073741824) // 2
                      ELSE (m * m) // 1073741824 END,
                 frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                                 THEN 1 ELSE 0 END,
                 k + 1
          FROM it WHERE k < 16
        ),
        q AS (SELECT c, msb * 65536 + frac AS qlog2 FROM it WHERE k = 16)
        SELECT j.x || ' ' || j.y AS ngram, j.cxy AS n,
               CAST(qa.qlog2 - qb.qlog2 AS BIGINT) AS pmi_fp
        FROM j
        JOIN q qa ON qa.c = j.ca
        JOIN q qb ON qb.c = j.cb
        ORDER BY pmi_fp DESC, ngram
        LIMIT 20
    """,
    # fuzzy join: the oracle is the ALL-PAIRS plan (cross join +
    # levenshtein) — independent of the engine's deletion-variant
    # blocking
    "fuzzy_match_parts": """
        WITH dirty AS (
          SELECT p_partkey + 1000000 AS d_id,
                 SUBSTRING(p_name, 1, (p_partkey % LENGTH(p_name))) ||
                 SUBSTRING(p_name, (p_partkey % LENGTH(p_name)) + 2)
                     AS d_name
          FROM part
        )
        SELECT p.p_partkey AS left_id, d.d_id AS right_id
        FROM part p CROSS JOIN dirty d
        WHERE levenshtein(p.p_name, d.d_name) <= 1
    """,
    # winsorized totals: exact p10/p90 per key via ceil-rank window,
    # then LEAST/GREATEST clip + sum
    "winsorized_value_events": """
        WITH o AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ),
        qb AS (
          SELECT event_type,
                 MIN(CASE WHEN rn = CAST(ceil(0.10 * n) AS BIGINT)
                          THEN cents END) AS lo,
                 MIN(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                          THEN cents END) AS hi
          FROM o GROUP BY 1
        )
        SELECT o.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(LEAST(GREATEST(o.cents, qb.lo), qb.hi)) AS BIGINT)
                   AS win_cents
        FROM o JOIN qb USING (event_type)
        GROUP BY 1
    """,
    # session attribution: gaps-and-islands + first/last row per island
    "session_attribution_users": """
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CASE WHEN LAG(ts) OVER w IS NULL
                           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ),
        agg AS (
          SELECT user_id, sid, MIN(ts) AS session_start,
                 MAX(ts) AS session_end,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(cents) AS BIGINT) AS value_sum
          FROM s GROUP BY 1, 2
        ),
        f AS (
          SELECT user_id, sid, event_type AS first_type FROM s
          QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) = 1
        ),
        l AS (
          SELECT user_id, sid, event_type AS last_type FROM s
          QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT a.user_id, a.session_start, a.session_end, a.n_events,
               a.value_sum, f.first_type, l.last_type
        FROM agg a
        JOIN f USING (user_id, sid)
        JOIN l USING (user_id, sid)
    """,
    # grid density clustering: independent recursive-CTE min-label walk
    # over the same quantization (4-connected, no wrap)
    "grid_clusters_events": f"""
        WITH RECURSIVE pts AS (
          SELECT CAST(FLOOR(({_derive_lat_sql('event_id')} + 90.0) / 4.0)
                      AS BIGINT) AS r,
                 CAST(FLOOR(({_derive_lon_sql('event_id')} + 180.0) / 4.0)
                      AS BIGINT) AS c
          FROM events
        ),
        cnt AS (SELECT r, c, COUNT(*) AS n FROM pts GROUP BY 1, 2),
        dense AS (SELECT r, c, n FROM cnt WHERE n >= 10),
        walk(r, c, label) AS (
          SELECT r, c, r * 90 + c FROM dense
          UNION
          SELECT n2.r, n2.c, w.label FROM walk w
          CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) d(dr, dc)
          JOIN dense n2 ON n2.r = w.r + d.dr AND n2.c = w.c + d.dc
        ),
        lab AS (SELECT r, c, MIN(label) AS label FROM walk GROUP BY 1, 2)
        SELECT label AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(n) AS BIGINT) AS n_points
        FROM lab JOIN dense USING (r, c)
        GROUP BY 1
    """,
    # BFS levels: the SQL expands the same edge arithmetic and takes
    # the min depth per reachable node
    "bfs_hosts_2hop": """
        WITH e AS (
          SELECT DISTINCT doc_id % 97 AS u,
                 (doc_id % 97 + 1 + (doc_id * j) % 96) % 97 AS v
          FROM documents, (VALUES (1), (2), (3)) t(j)
        ),
        seeds AS (SELECT k AS node FROM range(97) t(k) WHERE k % 31 = 0),
        l1 AS (
          SELECT DISTINCT e.v AS node FROM e JOIN seeds s ON e.u = s.node
        ),
        l2 AS (
          SELECT DISTINCT e.v AS node FROM e JOIN l1 ON e.u = l1.node
        ),
        lv AS (
          SELECT node, 0 AS dist FROM seeds
          UNION ALL SELECT node, 1 FROM l1
          UNION ALL SELECT node, 2 FROM l2
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        FROM lv GROUP BY node
    """,
    # broadcast interval lookup engine-side; the SQL regenerates the
    # boundary table and counts boundaries <= ip (same as searchsorted
    # side='right')
    "ip_range_lookup_events": f"""
        WITH ips AS (
          SELECT event_id, (event_id * {_GEO_A}) % {_GEO_M} AS ip
          FROM events
        ),
        bnds AS (
          SELECT ((k + 1) * {_GEO_B}) % {_GEO_M} AS b FROM range(255) t(k)
        )
        SELECT i.event_id, i.ip, CAST(COUNT(b.b) AS BIGINT) AS asn_id
        FROM ips i LEFT JOIN bnds b ON b.b <= i.ip
        GROUP BY i.event_id, i.ip
    """,
    # per-user OLS slope as the exact integer pair (num, den); x = epoch
    # days since 2024-01-01, y = exact cents — all-integer moments
    "user_value_trend_events": """
        WITH m AS (
          SELECT user_id,
                 DATE_DIFF('second', TIMESTAMP '1970-01-01', ts) // 86400
                     - 19723 AS x,
                 CAST(ROUND(value * 100) AS BIGINT) AS y
          FROM events
        ),
        a AS (
          SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM m GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
        FROM a
        WHERE n * sxx - sx * sx > 0
    """,
    # TPC-H Q5 shape; revenue as exact per-row fixed-point integers
    # (cents x (100 - discount_bp)) so the SUM is order-independent
    "q5_region_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    # per-group exact quantile_disc — ceil-rank over a keyed window;
    # ordering by float value == ordering by cents (monotone scale)
    "grouped_quantiles_events": """
        WITH o AS (
          SELECT event_type,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type, q.q_pct, o.cents AS value_cents
        FROM o
        JOIN (VALUES (25, 0.25), (50, 0.5), (75, 0.75), (90, 0.9))
             q(q_pct, qq)
          ON o.rn = CAST(ceil(q.qq * o.n) AS BIGINT)
    """,
    # Bloom-prefiltered join == the plain join (FPs dropped by the
    # exact per-bucket hash join)
    "bloom_join_lineitem": """
        SELECT l_orderkey, COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS total_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000
        GROUP BY 1
    """,
    # per-user trajectory hops — LAG window over the pure-integer grid
    "trajectory_stats_events": f"""
        WITH p AS (
          SELECT user_id, ts, event_id,
                 ((event_id * {_GEO_A}) % {_GEO_M}) * 720 // {_GEO_M} AS gx,
                 ((event_id * {_GEO_B}) % {_GEO_M}) * 360 // {_GEO_M} AS gy
          FROM events
        ),
        h AS (
          SELECT user_id,
                 GREATEST(abs(gx - LAG(gx) OVER w),
                          abs(gy - LAG(gy) OVER w)) AS d
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, COUNT(*) AS n_pts, COUNT(d) AS n_moves,
               CAST(COALESCE(SUM(d), 0) AS BIGINT) AS total_dist,
               CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_hop
        FROM h GROUP BY user_id
    """,
    # 3x3 focal stencil on the slope raster — range self-join oracle
    "kring_smooth_raster": f"""
        WITH g AS (
          SELECT row, col,
                 CAST(ROUND(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
          FROM {_RASTER_PQ["slope"]}
        ),
        nb AS (
          SELECT g1.row AS row, g1.col AS col, g2.v AS v
          FROM g g1 JOIN g g2
            ON g2.row BETWEEN g1.row - 1 AND g1.row + 1
           AND g2.col BETWEEN g1.col - 1 AND g1.col + 1
        )
        SELECT row, col, COUNT(*) AS n_nbrs,
               CAST(SUM(v) AS BIGINT) AS sum_v
        FROM nb GROUP BY 1, 2
    """,
    "knn_oracle_events": KNN_ORACLE_SQL,
    "asof_latest_order": ASOF_SQL,
    "running_user_totals": RUNNING_SQL,
    "pip_boxes_anti": PIP_ANTI_SQL,
    "q3_shipping_native": Q3_NATIVE_SQL,
    "range_join_orders_events": RANGE_JOIN_SQL,
    "langid_docs": LANGID_SQL,
    # declared-vs-predicted language confusion matrix
    "lang_confusion_docs": f"""
        SELECT d.lang, p.lang_pred,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM ({LANGID_SQL}) p JOIN documents d USING (doc_id)
        GROUP BY 1, 2
    """,
    "quality_docs": QUALITY_SQL,
    "tfidf_top_terms_docs": TFIDF_SQL,
    "heavy_hitter_users": (
        "SELECT user_id, COUNT(*) AS n_rows FROM events "
        "GROUP BY 1 HAVING COUNT(*) >= 80"
    ),
    "stratified_sample_events": STRATIFIED_SAMPLE_SQL,
    "contamination_check": CONTAMINATION_SQL,
    "streaming_dedup_docs": STREAMING_DEDUP_SQL,
    # expected redacted text straight from the generator (the planted
    # email/phone/IP become typed placeholders; originals untouched)
    "redact_pii_docs": (
        "SELECT doc_id,"
        " text || ' Contact <EMAIL> or <PHONE> from <IP> now."
        " SSN <SSN> IBAN <IBAN> end.' AS clean_text"
        " FROM documents"
    ),
    # expected clean text straight from the generator: original text +
    # the unique tail; the common 'subscribe' line must be gone
    "boilerplate_removal_docs": (
        "SELECT doc_id,"
        " text || chr(10) || 'Unique tail ' || doc_id AS clean_text"
        " FROM documents"
    ),
    # ground truth canonical URL straight from the doc_id arithmetic —
    # fully independent of the engine's regex normalizer
    "url_canonicalize_docs": (
        "SELECT doc_id,"
        " 'https://site' || (doc_id % 97) || '.example.com/d' || doc_id"
        "   AS canonical_url,"
        " 'site' || (doc_id % 97) || '.example.com' AS host"
        " FROM documents"
    ),
    "fingerprint_docs": FINGERPRINT_SQL,
    "simhash_docs": SIMHASH_SQL,
    "lsh_buckets_embeddings": LSH_BUCKETS_SQL,
    # conversion family (fixture-parquet oracles; see comment above
    # TEMPERATURE_SQL)
    "temperature_grid": TEMPERATURE_SQL,
    "pm25_grid": PM25_SQL,
    "winddir_grid": WINDDIR_SQL,
    "windspd_grid": WINDSPD_SQL,
    "windwpd_grid": WINDWPD_SQL,
    "wind_power_grid": WIND_POWER_SQL,
    "heat_demand_grid": HEAT_DEMAND_SQL,
    # raster algebra family
    "raster_and_merge": RASTER_AND_SQL,
    "raster_sum_merge": RASTER_SUM_SQL,
    "raster_filter_trim": RASTER_FILTER_TRIM_SQL,
    "raster_resample_r5": RASTER_RESAMPLE_SQL,
    "raster_min_area": RASTER_MIN_AREA_SQL,
    "raster_min_area_km2": RASTER_MIN_AREA_KM2_SQL,
    # round-2 additions
    "embedding_dups_lsh": EMBEDDING_DUPS_SQL,
    "mask_save_load_attach": MASK_ATTACH_SQL,
    "partitioned_view_events": PARTITIONED_VIEW_SQL,
    "knn_events_gazetteer": KNN_GAZETTEER_SQL,
    "top3_events_per_type_salted": TOP3_SALTED_SQL,
    "running_totals_actor_stream": RUNNING_ACTOR_SQL,
    "normalize_era5_raw": NORMALIZE_ERA5_SQL,
    "pv_grid": PV_GRID_SQL,
    "solar_thermal_grid": SOLAR_THERMAL_SQL,
    "pv_tracking_grid": PV_TRACKING_SQL,
    "top_pages_per_tile": TOP_PAGES_SQL,
    "exact_quantiles_events": EXACT_QUANTILES_SQL,
    "ts_series_grid": TS_SERIES_SQL,
    "heatmap_grid": HEATMAP_SQL,
    "wind_spline_estimate_grid": WIND_SPLINE_SQL,
    "wind_model_fit_grid": WIND_FIT_SQL,
    "wind_model_estimate_grid": WIND_ESTIMATE_SQL,
    # round 4: HLL sketch state (the float estimate is golden-tested;
    # the mergeable register table hash-matches exactly)
    "hll_registers_events": _hll_sql(),
    "near_dup_clusters_docs": _near_dup_clusters_sql(),
    "hll_merge_types_events": _hll_merge_sql(),
    "kmv_sketch_events": _kmv_sql(),
    "hilbert_rank_events": _hilbert_sql(),
    "dbscan_labels_events": _dbscan_sql(),
    "merkle_tree_events": _merkle_sql(),
    "bloom_partition_index_events": _bloom_part_sql(),
    "fold_leakage_audit_docs": _fold_leakage_sql(),
    "mmr_rerank_embeddings": _mmr_sql(),
    "dedup_canonical_docs": _dedup_canonical_sql(),
    # two-sample KS drift statistic, division-free
    "ks_test_events": """
        WITH v AS (
          SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type IN ('view', 'click')
        ),
        s AS (
          SELECT c,
                 CAST(SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS b
          FROM v GROUP BY 1
        ),
        cum AS (
          SELECT c, SUM(a) OVER (ORDER BY c) AS ca,
                 SUM(b) OVER (ORDER BY c) AS cb
          FROM s
        ),
        t AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                     CAST(SUM(b) AS BIGINT) AS nb FROM s)
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(MAX(ABS(ca * t.nb - cb * t.na)) AS BIGINT)
                   AS ks_scaled,
               t.na AS n_a, t.nb AS n_b
        FROM cum, t GROUP BY t.na, t.nb
    """,
    # local clustering coefficient per host (floor-ppm, exact ints)
    "clustering_coeff_hosts": """
        WITH raw AS (
          SELECT doc_id % 97 AS u,
                 (doc_id % 97 + 1 + (doc_id * j) % 96) % 97 AS v
          FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(j)
        ),
        e AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
          FROM raw WHERE u <> v
        ),
        deg AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT a AS host FROM e UNION ALL SELECT b FROM e)
          GROUP BY 1
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        tcnt AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n
          FROM (
            SELECT x AS host FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) GROUP BY 1
        )
        SELECT d.host, d.deg,
               CAST(COALESCE(t.n, 0) AS BIGINT) AS n_triangles,
               CAST(CASE WHEN d.deg >= 2
                         THEN (2 * COALESCE(t.n, 0) * 1000000)
                              // (d.deg * (d.deg - 1))
                         ELSE 0 END AS BIGINT) AS coeff_ppm
        FROM deg d LEFT JOIN tcnt t USING (host)
    """,
    # Benford first-digit audit (hardcoded floor-ppm expectation)
    "benford_audit_events": """
        WITH x AS (
          SELECT ABS(CAST(ROUND(value * 100) AS BIGINT)) AS a
          FROM events
          WHERE ABS(CAST(ROUND(value * 100) AS BIGINT)) > 0
        ),
        c AS (
          SELECT CAST(LEFT(CAST(a AS VARCHAR), 1) AS BIGINT) AS digit,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM x GROUP BY 1
        ),
        tot AS (SELECT SUM(n) AS t FROM c)
        SELECT b.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
               CAST(CASE WHEN tot.t > 0
                         THEN COALESCE(c.n, 0) * 1000000 // tot.t
                         ELSE 0 END AS BIGINT) AS share_ppm,
               b.benford_ppm,
               CAST(CASE WHEN tot.t > 0
                         THEN COALESCE(c.n, 0) * 1000000 // tot.t
                         ELSE 0 END - b.benford_ppm AS BIGINT)
                   AS dev_ppm
        FROM (VALUES
                (CAST(1 AS BIGINT), CAST(301029 AS BIGINT)),
                (2, 176091), (3, 124938), (4, 96910), (5, 79181),
                (6, 66946), (7, 57991), (8, 51152), (9, 45757)
             ) b(digit, benford_ppm)
        LEFT JOIN c ON c.digit = b.digit
        CROSS JOIN tot
    """,
    # Pearson correlation between two daily count series, exact
    # integer moments + signed squared corr in ppb (no sqrt compared)
    "daily_corr_types_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day,
                 CAST(SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1
        ),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM c
        )
        SELECT nd AS n_days, sx AS sum_x, sy AS sum_y,
               CAST(nd * sxy - sx * sy AS BIGINT) AS num,
               CAST(nd * sxx - sx * sx AS BIGINT) AS den_x,
               CAST(nd * syy - sy * sy AS BIGINT) AS den_y,
               CAST(CASE
                 WHEN nd * sxx - sx * sx = 0
                      OR nd * syy - sy * sy = 0 THEN 0
                 ELSE (CASE WHEN nd * sxy - sx * sy < 0
                            THEN -1 ELSE 1 END)
                      * ((CAST(nd * sxy - sx * sy AS HUGEINT)
                          * (nd * sxy - sx * sy) * 1000000000)
                         // (CAST(nd * sxx - sx * sx AS HUGEINT)
                             * (nd * syy - sy * sy)))
               END AS BIGINT) AS corr_sq_ppb
        FROM m
    """,
    # first-order Markov transition matrix over per-user streams
    "markov_transitions_events": """
        WITH o AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        ),
        c AS (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2
        ),
        t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
               CAST(c.n * 1000000 // t.tot AS BIGINT) AS prob_ppm
        FROM c JOIN t USING (from_type)
    """,
    # product-quantization assignment histogram (16 lowest-id
    # vectors = codebook; FLOOR-2^10 quantized; ties -> lowest code)
    "pq_assign_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        cbr AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
          FROM embeddings ORDER BY vec_id LIMIT 16
        ),
        cbv AS (
          SELECT cbr.cidx, q.dim, q.v
          FROM cbr JOIN q ON q.vec_id = cbr.vec_id
        ),
        d AS (
          SELECT q.vec_id, (q.dim - 1) // 8 AS sub, cbv.cidx,
                 CAST(SUM((q.v - cbv.v) * (q.v - cbv.v)) AS BIGINT)
                     AS dist
          FROM q JOIN cbv ON cbv.dim = q.dim
          GROUP BY 1, 2, 3
        ),
        a AS (
          SELECT vec_id, sub, cidx, dist,
                 ROW_NUMBER() OVER (
                   PARTITION BY vec_id, sub ORDER BY dist, cidx
                 ) AS rn
          FROM d
        )
        SELECT CAST(sub AS BIGINT) AS subspace,
               CAST(cidx AS BIGINT) AS code,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dist) AS BIGINT) AS sum_sqdist
        FROM a WHERE rn = 1 GROUP BY 1, 2
    """,
    # merge-on-read positional deletes (1-based pos % 7 == 3 drops)
    "positional_deletes_events": """
        WITH p AS (
          SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (
                   PARTITION BY DATE_TRUNC('day', ts)
                   ORDER BY ts, event_id
                 ) AS pos
          FROM events
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_live,
               CAST(SUM(cents) AS BIGINT) AS cents_live
        FROM p WHERE pos % 7 <> 3 GROUP BY 1
    """,
    # hierarchical subtree rollup over the deterministic 8-ary tree
    "subtree_rollup_parts": """
        WITH RECURSIVE anc(node, cents) AS (
          SELECT p_partkey,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT)
          FROM part
          UNION ALL
          SELECT node // 8, cents FROM anc WHERE node > 0
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(SUM(cents) AS BIGINT) AS subtree_cents,
               CAST(COUNT(*) AS BIGINT) AS n_desc
        FROM anc GROUP BY 1
    """,
    # per-host eccentricity via recursive walk enumeration (bounded
    # 97-node graph: walks dedup on (s, n, d), d <= 96)
    "eccentricity_hosts": """
        WITH RECURSIVE raw AS (
          SELECT doc_id % 97 AS u,
                 (doc_id % 97 + 1 + (doc_id * j) % 96) % 97 AS v
          FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(j)
        ),
        e AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
          FROM raw WHERE u <> v
        ),
        ue AS (
          SELECT a AS u, b AS v FROM e
          UNION ALL SELECT b, a FROM e
        ),
        nodes AS (SELECT DISTINCT u AS n FROM ue),
        walk(s, n, d) AS (
          SELECT n, n, 0 FROM nodes
          UNION
          SELECT w.s, ue.v, w.d + 1
          FROM walk w JOIN ue ON ue.u = w.n
          WHERE w.d < 96
        ),
        md AS (SELECT s, n, MIN(d) AS d FROM walk GROUP BY 1, 2)
        SELECT s AS host, CAST(MAX(d) AS BIGINT) AS ecc,
               CAST(COUNT(*) AS BIGINT) AS n_reachable
        FROM md GROUP BY 1
    """,
    # Flesch-style readability with 16-word pseudo-sentences
    "readability_docs": """
        WITH s AS (
          SELECT doc_id,
                 CAST(LEN(string_split(
                     lower(COALESCE(text, '')), ' ')) AS BIGINT) AS w,
                 CAST(LEN(regexp_extract_all(
                     lower(COALESCE(text, '')), '[aeiou]+'))
                     AS BIGINT) AS v
          FROM documents
        )
        SELECT doc_id, w AS n_words, v AS n_vowel_groups,
               CAST((w + 15) // 16 AS BIGINT) AS n_sents,
               CAST(206835 - (1015 * w) // ((w + 15) // 16)
                           - (84600 * v) // w AS BIGINT)
                   AS flesch_milli
        FROM s
    """,
    # Cohen's kappa over the lang-confusion matrix (exact ints)
    "cohens_kappa_docs": f"""
        WITH conf AS (
          SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
          FROM ({LANGID_SQL}) p JOIN documents d USING (doc_id)
          GROUP BY 1, 2
        ),
        tot AS (SELECT SUM(n) AS nn FROM conf),
        diag AS (SELECT COALESCE(SUM(n), 0) AS ag
                 FROM conf WHERE lang = lang_pred),
        rw AS (SELECT lang AS k, SUM(n) AS r FROM conf GROUP BY 1),
        cl AS (SELECT lang_pred AS k, SUM(n) AS c FROM conf GROUP BY 1),
        rc AS (SELECT COALESCE(SUM(rw.r * cl.c), 0) AS src
               FROM rw JOIN cl USING (k))
        SELECT CAST(nn AS BIGINT) AS n_docs,
               CAST(ag AS BIGINT) AS n_agree,
               CAST(src AS BIGINT) AS sum_rc,
               CAST(CASE WHEN nn * nn - src = 0 THEN 0
                    ELSE (CASE WHEN nn * ag - src < 0
                               THEN -1 ELSE 1 END)
                         * (ABS(nn * ag - src) * 1000000
                            // (nn * nn - src))
               END AS BIGINT) AS kappa_ppm
        FROM tot, diag, rc
    """,
    # hashing-trick bucket-load histogram over the distinct vocab
    "feature_hash_collisions_docs": _feature_hash_sql(),
    # retention half-life from the exact survival curve
    "retention_half_life_events": """
        WITH s AS (
          SELECT user_id,
                 MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS f,
                 MAX(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS l
          FROM events GROUP BY 1
        ),
        d AS (
          SELECT DISTINCT day FROM (
            SELECT f AS day FROM s UNION ALL SELECT l FROM s
          )
        ),
        curve AS (
          SELECT d.day,
                 CAST(((SELECT COUNT(*) FROM s)
                       - (SELECT COUNT(*) FROM s
                          WHERE s.l <= d.day))
                      * 1000000 // (SELECT COUNT(*) FROM s)
                      AS BIGINT) AS surv_ppm
          FROM d
        ),
        hl AS (
          SELECT day, surv_ppm,
                 ROW_NUMBER() OVER (ORDER BY day) AS rn
          FROM curve WHERE surv_ppm < 500000
        )
        SELECT hl.day AS half_life_day,
               hl.surv_ppm AS surv_ppm_at,
               CAST((SELECT COUNT(*) FROM curve) AS BIGINT)
                   AS n_days_observed
        FROM hl WHERE rn = 1
    """,
    # exact duplicate-row multiplicity histogram (double-write audit)
    "duplicate_rows_audit_events": """
        WITH g AS (
          SELECT user_id, ts, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2, 3, 4
        )
        SELECT c AS k_copies, CAST(COUNT(*) AS BIGINT) AS n_groups
        FROM g GROUP BY 1
    """,
    # top-20 longest between-event idle gaps
    "longest_gaps_users_events": """
        WITH o AS (
          SELECT user_id, ts, epoch_us(ts) AS us,
                 LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        ),
        g AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS gap_start,
                 CAST(nxt - us AS BIGINT) AS gap_us
          FROM o WHERE nxt IS NOT NULL
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
            ORDER BY gap_us DESC, user_id, gap_start
          ) AS rank
          FROM g
        )
        SELECT user_id, gap_start, gap_us, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 20
    """,
    # conditional entropy of the event-type Markov chain (qlog2)
    "markov_conditional_entropy_events": f"""
        WITH RECURSIVE o AS (
          SELECT event_type AS a,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS b
          FROM events
        ),
        cnt AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                FROM o WHERE b IS NOT NULL GROUP BY 1, 2),
        na AS (SELECT a, CAST(SUM(c) AS BIGINT) AS n
               FROM cnt GROUP BY 1),
        vals AS (
          SELECT DISTINCT c FROM (
            SELECT c FROM cnt UNION ALL SELECT n FROM na)
        ),
        {_QLOG2_CTE},
        ta AS (SELECT CAST(SUM(na.n * q.qlog2) AS BIGINT) AS t
               FROM na JOIN q ON q.c = na.n),
        tb AS (SELECT CAST(SUM(cnt.c * q.qlog2) AS BIGINT) AS t
               FROM cnt JOIN q ON q.c = cnt.c),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt)
        SELECT tot.n AS n_transitions,
               CAST((SELECT COUNT(*) FROM na) AS BIGINT) AS n_states,
               CAST(ta.t - tb.t AS BIGINT) AS h_cond_q
        FROM tot, ta, tb
    """,
    # Lorenz decile table of user activity (exact tie-safe split)
    "lorenz_deciles_users_events": """
        WITH pu AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1
        ),
        r AS (
          SELECT n,
                 ROW_NUMBER() OVER (ORDER BY n, user_id) AS rn,
                 COUNT(*) OVER () AS u,
                 SUM(n) OVER () AS e
          FROM pu
        ),
        d AS (
          SELECT CAST((rn - 1) * 10 // u AS BIGINT) + 1 AS decile,
                 n, e
          FROM r
        ),
        a AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(n) AS BIGINT) AS events,
                 CAST(MAX(e) AS BIGINT) AS e
          FROM d GROUP BY 1
        )
        SELECT decile, n_users, events,
               CAST(SUM(events) OVER (ORDER BY decile) * 1000000
                    // e AS BIGINT) AS cum_share_ppm
        FROM a
    """,
    # engagement-breadth histogram (bipartite user-side degree dist)
    "user_breadth_histogram_events": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        k AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k_types
              FROM d GROUP BY 1)
        SELECT k_types, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM k GROUP BY 1
    """,
    # per-user type-diversity entropy (fixed-point qlog2)
    "user_type_entropy_events": f"""
        WITH RECURSIVE cnt AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n
                FROM cnt GROUP BY 1),
        vals AS (
          SELECT DISTINCT c FROM (
            SELECT c FROM cnt UNION ALL SELECT n FROM tot)
        ),
        {_QLOG2_CTE}
        SELECT t.user_id, t.n AS n_events,
               CAST(t.n * qn.qlog2 - SUM(cnt.c * qc.qlog2) AS BIGINT)
                   AS entropy_q
        FROM cnt
        JOIN tot t USING (user_id)
        JOIN q qc ON qc.c = cnt.c
        JOIN q qn ON qn.c = t.n
        GROUP BY 1, 2, qn.qlog2
    """,
    # Fano factor (burstiness) of the daily count series per type
    "fano_factor_types_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(n) AS BIGINT) AS s,
                 CAST(SUM(n * n) AS BIGINT) AS ss
          FROM c GROUP BY 1
          HAVING COUNT(*) >= 2 AND SUM(n) > 0
        )
        SELECT event_type, nd AS n_days, s AS sum_n, ss AS sum_n2,
               CAST((nd * ss - s * s) * 1000 // ((nd - 1) * s)
                    AS BIGINT) AS fano_milli
        FROM m
    """,
    # partitioner-hash uniformity audit (scaled chi-square, exact)
    "hash_uniformity_audit_events": f"""
        WITH u AS (
          SELECT DISTINCT CAST(user_id AS HUGEINT) AS uid FROM events
        ),
        {_sql_splitmix_stages("hu", {"u": "uid"}, "u")},
        b AS (SELECT CAST(h_u % 256 AS BIGINT) AS bucket FROM hu6),
        c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM b GROUP BY 1),
        sp AS (SELECT CAST(UNNEST(generate_series(0, 255)) AS BIGINT)
                   AS bucket),
        f AS (SELECT sp.bucket, COALESCE(c.n, 0) AS n
              FROM sp LEFT JOIN c USING (bucket)),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM f)
        SELECT t.nt AS n_ids, CAST(256 AS BIGINT) AS n_buckets,
               CAST(SUM((256 * f.n - t.nt) * (256 * f.n - t.nt))
                    AS BIGINT) AS chi2_num,
               CAST(MAX(f.n) AS BIGINT) AS max_bucket_n,
               CAST(MIN(f.n) AS BIGINT) AS min_bucket_n
        FROM f CROSS JOIN t GROUP BY 1, 2
    """,
    # bloom capacity plan per partition (p=1/1024, ln2 micro const)
    "bloom_size_plan_events": """
        WITH d AS (
          SELECT DISTINCT event_id % 16 AS part, user_id FROM events
        ),
        n AS (
          SELECT part, CAST(COUNT(*) AS BIGINT) AS n_distinct
          FROM d GROUP BY 1
        )
        SELECT CAST(part AS BIGINT) AS part, n_distinct,
               CAST((n_distinct * 10000000 + 693146) // 693147
                    AS BIGINT) AS m_bits,
               CAST(((n_distinct * 10000000 + 693146) // 693147 + 7)
                    // 8 AS BIGINT) AS m_bytes,
               CAST(10 AS BIGINT) AS k_hashes
        FROM n
    """,
    # dedup ROI: bytes before vs after exact-fingerprint dedup
    "dedup_savings_docs": """
        WITH h AS (
          SELECT md5(lower(text)) AS x,
                 octet_length(encode(COALESCE(text, ''))) AS nb
          FROM documents
        ),
        g AS (
          SELECT x, CAST(COUNT(*) AS BIGINT) AS n_copies,
                 CAST(MIN(nb) AS BIGINT) AS kept,
                 CAST(SUM(nb) AS BIGINT) AS tot
          FROM h GROUP BY 1
        ),
        t AS (
          SELECT CAST(SUM(n_copies) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_unique,
                 CAST(SUM(tot) AS BIGINT) AS bytes_total,
                 CAST(SUM(kept) AS BIGINT) AS bytes_kept
          FROM g
        )
        SELECT n_docs, n_unique, bytes_total, bytes_kept,
               CAST(CASE WHEN bytes_total > 0
                         THEN (bytes_total - bytes_kept) * 1000000
                              // bytes_total
                         ELSE 0 END AS BIGINT) AS saved_ppm
        FROM t
    """,
    # per-column parquet storage stats from the file footers.  The
    # driver's gate runs at sf=0.01, so the oracle addresses that
    # file directly (parquet_metadata needs a PATH, not a view —
    # same fixed-path pattern as the grid/raster fixture oracles).
    "parquet_column_stats_events": """
        SELECT path_in_schema AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_row_groups,
               CAST(SUM(num_values) AS BIGINT) AS n_values,
               CAST(SUM(total_compressed_size) AS BIGINT)
                   AS compressed_bytes,
               CAST(SUM(total_uncompressed_size) AS BIGINT)
                   AS uncompressed_bytes,
               CAST(SUM(total_compressed_size) * 1000000
                    // SUM(total_uncompressed_size) AS BIGINT)
                   AS ratio_ppm
        FROM parquet_metadata(
            '/root/testdata/sf0.01/events.parquet')
        GROUP BY 1
    """,
    # word2vec negative-sampling plan (100 splitmix probes over the
    # cumulative unigram ranges, term-ascending)
    "negative_sampling_unigram_docs": f"""
        WITH toks AS (
          SELECT unnest(string_split(lower(COALESCE(text, '')), ' '))
                     AS term
          FROM documents
        ),
        v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks GROUP BY 1),
        o AS (SELECT term, n,
                     SUM(n) OVER (ORDER BY term) - n AS cstart
              FROM v),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM v),
        c0 AS (SELECT i, CAST(i AS HUGEINT) AS x
               FROM range(0, 100) r(i)),
        {_sql_splitmix_stages("ns", {"k": "x"}, "c0")},
        pr AS (SELECT c.i, CAST(h_k % t.tot AS BIGINT) AS u
               FROM ns6 c CROSS JOIN t)
        SELECT CAST(pr.i AS BIGINT) AS probe, pr.u AS u_pos,
               o.term, o.n AS term_n
        FROM pr JOIN o ON pr.u >= o.cstart AND pr.u < o.cstart + o.n
    """,
    # top-3 OLS residual outlier days per type (exact scaled ints)
    "residual_outlier_days_types_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        mn AS (SELECT MIN(day) AS d0 FROM c),
        p AS (
          SELECT event_type, day,
                 CAST((epoch_us(day) - epoch_us(mn.d0))
                      // 86400000000 AS BIGINT) AS x,
                 n AS y
          FROM c CROSS JOIN mn
        ),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nn,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM p GROUP BY 1
        ),
        r AS (
          SELECT p.event_type, CAST(p.day AS TIMESTAMP) AS day,
                 CAST(m.nn * (m.nn * m.sxx - m.sx * m.sx) * p.y
                      - (m.nn * m.sxx - m.sx * m.sx) * m.sy
                      - (m.nn * m.sxy - m.sx * m.sy)
                        * (m.nn * p.x - m.sx) AS BIGINT) AS res_scaled
          FROM p JOIN m USING (event_type)
          WHERE m.nn * m.sxx - m.sx * m.sx <> 0
        ),
        k AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type
            ORDER BY ABS(res_scaled) DESC, day
          ) AS rank
          FROM r
        )
        SELECT event_type, day, res_scaled,
               CAST(rank AS BIGINT) AS rank
        FROM k WHERE rank <= 3
    """,
    # Zipf power-law slope over the rank-frequency state
    "zipf_slope_docs": f"""
        WITH m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(qlog2_rank_fp) AS BIGINT) AS sx,
                 CAST(SUM(qlog2_n_fp) AS BIGINT) AS sy,
                 CAST(SUM(qlog2_rank_fp * qlog2_n_fp) AS BIGINT)
                     AS sxy,
                 CAST(SUM(qlog2_rank_fp * qlog2_rank_fp) AS BIGINT)
                     AS sxx
          FROM ({_zipf_sql()}) z
        )
        SELECT n AS n_terms,
               CAST(n * sxy - sx * sy AS BIGINT) AS num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den,
               CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                    ELSE (CASE WHEN n * sxy - sx * sy < 0
                               THEN -1 ELSE 1 END)
                         * (ABS(n * sxy - sx * sy) * 1000000
                            // (n * sxx - sx * sx))
               END AS BIGINT) AS slope_micro
        FROM m
    """,
    # front-coding compression audit over sorted URLs (byte LCP)
    "front_coding_audit_docs": """
        WITH p AS (
          SELECT CASE WHEN doc_id % 2 = 0 THEN
              '/' || chr(97 + CAST(doc_id % 5 AS INT)) || '/item/'
              || CAST(doc_id * 7 % 1000 AS VARCHAR)
              || '/page/' || CAST(doc_id % 13 AS VARCHAR)
            ELSE
              '/post/' || CAST(doc_id AS VARCHAR)
              || '/comment/' || CAST(doc_id % 7 AS VARCHAR)
            END AS path, doc_id AS key
          FROM documents
        ),
        r AS (
          SELECT path, LAG(path) OVER (ORDER BY path, key) AS prev,
                 ROW_NUMBER() OVER (ORDER BY path, key) AS rid
          FROM p
        ),
        ks AS (SELECT CAST(UNNEST(generate_series(1, 64)) AS INT)
                   AS k),
        m AS (
          SELECT r.rid, MAX(ks.k) AS lcp
          FROM r JOIN ks
            ON ks.k <= LEAST(length(r.path), length(r.prev))
           AND substr(r.path, 1, ks.k) = substr(r.prev, 1, ks.k)
          WHERE r.prev IS NOT NULL
          GROUP BY 1
        ),
        l AS (
          SELECT r.rid, length(r.path) AS len,
                 COALESCE(m.lcp, 0) AS lcp
          FROM r LEFT JOIN m USING (rid)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(SUM(len) AS BIGINT) AS total_bytes,
               CAST(SUM(lcp) AS BIGINT) AS saved_bytes
        FROM l
    """,
    # decision-stump split search with exact qlog2 child entropy
    "decision_stump_events": f"""
        WITH RECURSIVE x AS (
          SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT) // 2048, 15)
                     AS bucket,
                 CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END AS y
          FROM events
        ),
        h AS (
          SELECT bucket, CAST(SUM(y) AS BIGINT) AS p,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM x GROUP BY 1
        ),
        th AS (SELECT k FROM (VALUES (1), (2), (3), (4), (5), (6),
                                     (7), (8), (9), (10), (11), (12),
                                     (13), (14), (15)) t(k)),
        sides AS (
          SELECT th.k,
                 CAST(COALESCE(SUM(CASE WHEN h.bucket < th.k
                                        THEN h.n END), 0)
                      AS BIGINT) AS nl,
                 CAST(COALESCE(SUM(CASE WHEN h.bucket < th.k
                                        THEN h.p END), 0)
                      AS BIGINT) AS pl,
                 CAST(COALESCE(SUM(CASE WHEN h.bucket >= th.k
                                        THEN h.n END), 0)
                      AS BIGINT) AS nr,
                 CAST(COALESCE(SUM(CASE WHEN h.bucket >= th.k
                                        THEN h.p END), 0)
                      AS BIGINT) AS pr
          FROM th CROSS JOIN h GROUP BY 1
        ),
        vals AS (
          SELECT DISTINCT c FROM (
            SELECT nl AS c FROM sides
            UNION ALL SELECT pl FROM sides
            UNION ALL SELECT nl - pl FROM sides
            UNION ALL SELECT nr FROM sides
            UNION ALL SELECT pr FROM sides
            UNION ALL SELECT nr - pr FROM sides
          ) WHERE c > 0
        ),
        {_QLOG2_CTE},
        hq AS (
          SELECT s.k, s.nl, s.pl, s.nr, s.pr,
                 CAST(s.nl * COALESCE(q1.qlog2, 0)
                      - s.pl * COALESCE(q2.qlog2, 0)
                      - (s.nl - s.pl) * COALESCE(q3.qlog2, 0)
                      + s.nr * COALESCE(q4.qlog2, 0)
                      - s.pr * COALESCE(q5.qlog2, 0)
                      - (s.nr - s.pr) * COALESCE(q6.qlog2, 0)
                      AS BIGINT) AS h_q
          FROM sides s
          LEFT JOIN q q1 ON q1.c = s.nl
          LEFT JOIN q q2 ON q2.c = s.pl
          LEFT JOIN q q3 ON q3.c = s.nl - s.pl
          LEFT JOIN q q4 ON q4.c = s.nr
          LEFT JOIN q q5 ON q5.c = s.pr
          LEFT JOIN q q6 ON q6.c = s.nr - s.pr
        ),
        best AS (SELECT k AS bk FROM hq ORDER BY h_q, k LIMIT 1)
        SELECT CAST(hq.k * 2048 AS BIGINT) AS threshold,
               hq.nl AS n_left, hq.pl AS pos_left,
               hq.nr AS n_right, hq.pr AS pos_right, hq.h_q,
               CAST(CASE WHEN hq.k = best.bk
                         THEN 1 ELSE 0 END AS BIGINT) AS is_best
        FROM hq CROSS JOIN best
    """,
    # sliding ROWS-4-PRECEDING max per user (monotonic-deque window)
    "sliding_max_user_values": """
        SELECT event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS max5
        FROM events
    """,
    # unpivot/melt of the dynamic pivot == the direct long aggregate
    "unpivot_daily_types_events": """
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    """,
    # sorted-neighborhood candidate pairs (window 4, <= 10 cents)
    "snm_pairs_customers": """
        WITH c AS (
          SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
                 CAST(c_custkey AS BIGINT) AS key
          FROM customer
        ),
        r AS (
          SELECT cents, key,
                 ROW_NUMBER() OVER (ORDER BY cents, key) AS rn
          FROM c
        )
        SELECT a.key AS key_a, b.key AS key_b,
               CAST(b.cents - a.cents AS BIGINT) AS diff_cents
        FROM r a
        JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
                AND b.cents - a.cents <= 10
    """,
    # OLS slope of daily counts per type (exact integer moments)
    "daily_trend_slope_types_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        mn AS (SELECT MIN(day) AS d0 FROM c),
        p AS (
          SELECT event_type,
                 CAST((epoch_us(day) - epoch_us(mn.d0))
                      // 86400000000 AS BIGINT) AS x,
                 n AS y
          FROM c CROSS JOIN mn
        ),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM p GROUP BY 1
        )
        SELECT event_type, n_days,
               CAST(n_days * sxy - sx * sy AS BIGINT) AS num,
               CAST(n_days * sxx - sx * sx AS BIGINT) AS den,
               CAST(CASE WHEN n_days * sxx - sx * sx = 0 THEN 0
                    ELSE (CASE WHEN n_days * sxy - sx * sy < 0
                               THEN -1 ELSE 1 END)
                         * (ABS(n_days * sxy - sx * sy) * 1000000
                            // (n_days * sxx - sx * sx))
               END AS BIGINT) AS slope_micro
        FROM m
    """,
    # per-dimension variance screening (exact n^2*var moments)
    "dim_variance_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        m AS (
          SELECT dim, CAST(SUM(v) AS BIGINT) AS s,
                 CAST(SUM(v * v) AS BIGINT) AS ss,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM q GROUP BY 1
        ),
        v AS (
          SELECT dim, s, ss,
                 CAST(n * ss - CAST(s AS HUGEINT) * s AS BIGINT)
                     AS var_num
          FROM m
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY var_num DESC, dim)
                     AS rn
          FROM v
        )
        SELECT CAST(dim AS BIGINT) AS dim, s AS sum_q, ss AS sum_q2,
               var_num,
               CAST(CASE WHEN rn <= 8 THEN 1 ELSE 0 END AS BIGINT)
                   AS is_top8
        FROM r
    """,
    # Mean Reciprocal Rank of the first same-label neighbor
    "mrr_same_label_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        anch AS (SELECT vec_id, label FROM embeddings
                 ORDER BY vec_id LIMIT 10),
        d AS (
          SELECT a.vec_id AS anchor_id, e.vec_id AS other_id,
                 MAX(CASE WHEN e.label = a.label
                          THEN 1 ELSE 0 END) AS same,
                 CAST(SUM((qa.v - qe.v) * (qa.v - qe.v)) AS BIGINT)
                     AS dist
          FROM anch a
          JOIN embeddings e ON e.vec_id <> a.vec_id
          JOIN q qa ON qa.vec_id = a.vec_id
          JOIN q qe ON qe.vec_id = e.vec_id AND qe.dim = qa.dim
          GROUP BY 1, 2
        ),
        r AS (
          SELECT anchor_id, same,
                 ROW_NUMBER() OVER (PARTITION BY anchor_id
                                    ORDER BY dist, other_id) AS rnk
          FROM d
        ),
        f AS (SELECT anchor_id, MIN(rnk) AS rank
              FROM r WHERE same = 1 GROUP BY 1)
        SELECT anchor_id, CAST(rank AS BIGINT) AS rank,
               CAST(1000000 // rank AS BIGINT) AS recip_micro
        FROM f
    """,
    # per-label centroid drift between vec_id halves (exact micro)
    "embedding_drift_labels": """
        WITH e AS (
          SELECT vec_id % 2 AS half, label, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        st AS (
          SELECT label, half, dim,
                 CAST(SUM(v) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2, 3
        ),
        j AS (
          SELECT a.label, a.n AS na, b.n AS nb,
                 SUM((CAST(a.s AS HUGEINT) * b.n
                      - CAST(b.s AS HUGEINT) * a.n)
                     * (CAST(a.s AS HUGEINT) * b.n
                        - CAST(b.s AS HUGEINT) * a.n)) AS num
          FROM st a
          JOIN st b ON b.label = a.label AND b.dim = a.dim
                   AND a.half = 0 AND b.half = 1
          GROUP BY 1, 2, 3
        )
        SELECT CAST(label AS BIGINT) AS label,
               na AS n_a, nb AS n_b,
               CAST(num * 1000000
                    // (CAST(na AS HUGEINT) * nb * na * nb)
                    AS BIGINT) AS shift_sq_micro
        FROM j
    """,
    # lead-lag cross-correlation of the two daily series
    "crosscorr_daily_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day,
                 CAST(SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1
        ),
        o AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM c),
        lags AS (SELECT k FROM (VALUES (-3), (-2), (-1), (0), (1),
                                       (2), (3)) t(k)),
        p AS (
          SELECT l.k, a.x AS xa, b.y AS yb
          FROM lags l CROSS JOIN o a
          JOIN o b ON b.rn = a.rn + l.k
        ),
        m AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(xa) AS BIGINT) AS sx,
                 CAST(SUM(yb) AS BIGINT) AS sy,
                 CAST(SUM(xa * yb) AS BIGINT) AS sxy,
                 CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                 CAST(SUM(yb * yb) AS BIGINT) AS syy
          FROM p GROUP BY 1
        )
        SELECT CAST(k AS BIGINT) AS lag,
               CAST(m * sxy - sx * sy AS BIGINT) AS num,
               CAST(m * sxx - sx * sx AS BIGINT) AS den_x,
               CAST(m * syy - sy * sy AS BIGINT) AS den_y,
               CAST(CASE
                 WHEN m * sxx - sx * sx = 0
                      OR m * syy - sy * sy = 0 THEN 0
                 ELSE (CASE WHEN m * sxy - sx * sy < 0
                            THEN -1 ELSE 1 END)
                      * ((CAST(m * sxy - sx * sy AS HUGEINT)
                          * (m * sxy - sx * sy) * 1000000000)
                         // (CAST(m * sxx - sx * sx AS HUGEINT)
                             * (m * syy - sy * sy)))
               END AS BIGINT) AS corr_sq_ppb
        FROM m
    """,
    # PSI drift between time halves, fixed-point qlog2 terms
    "psi_value_drift_events": f"""
        WITH RECURSIVE b AS (
          SELECT (MIN(epoch_us(ts)) // 86400000000
                  + MAX(epoch_us(ts)) // 86400000000) // 2
                 * 86400000000 AS cut
          FROM events
        ),
        x AS (
          SELECT CAST(ROUND(value * 100) AS BIGINT) // 2048 AS bucket,
                 CASE WHEN epoch_us(ts) // 86400000000 * 86400000000
                           < b.cut
                      THEN 1 ELSE 0 END AS first
          FROM events CROSS JOIN b
        ),
        h AS (
          SELECT bucket,
                 CAST(SUM(first) AS BIGINT) AS n_a,
                 CAST(SUM(1 - first) AS BIGINT) AS n_b
          FROM x GROUP BY 1
        ),
        t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM h),
        vals AS (
          SELECT DISTINCT c FROM (
            SELECT CAST(n_a * t.tb AS BIGINT) AS c
            FROM h CROSS JOIN t WHERE n_a > 0 AND n_b > 0
            UNION ALL
            SELECT CAST(n_b * t.ta AS BIGINT)
            FROM h CROSS JOIN t WHERE n_a > 0 AND n_b > 0
          )
        ),
        {_QLOG2_CTE}
        SELECT h.bucket, h.n_a, h.n_b,
               CAST(CASE WHEN h.n_a = 0 OR h.n_b = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS one_sided,
               CAST(CASE WHEN h.n_a = 0 OR h.n_b = 0 THEN 0
                    ELSE (h.n_a * t.tb - h.n_b * t.ta)
                         * (qa.qlog2 - qb.qlog2)
               END AS BIGINT) AS psi_term_q
        FROM h CROSS JOIN t
        LEFT JOIN q qa ON qa.c = h.n_a * t.tb
        LEFT JOIN q qb ON qb.c = h.n_b * t.ta
    """,
    # histogram-intersection similarity between type distributions
    "histogram_intersection_types_events": """
        WITH h AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        t AS (SELECT event_type, SUM(n) AS tot FROM h GROUP BY 1),
        p AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(SUM(LEAST(a.n, b.n)) AS BIGINT) AS inter
          FROM h a
          JOIN h b ON b.cents = a.cents
                  AND b.event_type > a.event_type
          GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, p.inter,
               CAST(p.inter * 1000000 // LEAST(t1.tot, t2.tot)
                    AS BIGINT) AS sim_ppm
        FROM p
        JOIN t t1 ON t1.event_type = p.type_a
        JOIN t t2 ON t2.event_type = p.type_b
    """,
    # user-lifetime survival / churn curve (no censoring)
    "user_lifetime_survival_events": """
        WITH s AS (
          SELECT user_id,
                 MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS f,
                 MAX(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS l
          FROM events GROUP BY 1
        ),
        d AS (
          SELECT DISTINCT day FROM (
            SELECT f AS day FROM s UNION ALL SELECT l FROM s
          )
        )
        SELECT d.day,
               CAST((SELECT COUNT(*) FROM s
                     WHERE s.f <= d.day AND s.l >= d.day)
                    AS BIGINT) AS n_alive,
               CAST((SELECT COUNT(*) FROM s WHERE s.l = d.day)
                    AS BIGINT) AS n_churn,
               CAST(((SELECT COUNT(*) FROM s)
                     - (SELECT COUNT(*) FROM s WHERE s.l <= d.day))
                    * 1000000 // (SELECT COUNT(*) FROM s)
                    AS BIGINT) AS surv_ppm
        FROM d
    """,
    # linear multi-touch attribution (24 h window, floor micro-shares)
    "multitouch_attribution_events": """
        WITH e AS (
          SELECT event_id, user_id, epoch_us(ts) AS us, event_type
          FROM events
        ),
        p AS (SELECT event_id, user_id, us FROM e
              WHERE event_type = 'purchase'),
        tou AS (SELECT user_id, us, event_type FROM e
                WHERE event_type IN ('view', 'click')),
        j AS (
          SELECT p.event_id, tou.event_type,
                 COUNT(*) OVER (PARTITION BY p.event_id) AS k
          FROM p JOIN tou ON tou.user_id = p.user_id
                         AND tou.us >= p.us - 86400000000
                         AND tou.us < p.us
        )
        SELECT event_type,
               CAST(SUM(1000000 // k) AS BIGINT) AS credit_micro,
               CAST(COUNT(*) AS BIGINT) AS n_touches
        FROM j GROUP BY 1
    """,
    # percent-of-parent share over the 8-ary subtree rollup
    "subtree_share_parts": """
        WITH RECURSIVE anc(node, cents) AS (
          SELECT p_partkey,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT)
          FROM part
          UNION ALL
          SELECT node // 8, cents FROM anc WHERE node > 0
        ),
        roll AS (SELECT node, SUM(cents) AS sc FROM anc GROUP BY 1)
        SELECT CAST(c.node AS BIGINT) AS node,
               CAST(c.node // 8 AS BIGINT) AS parent,
               CAST(c.sc * 1000000 // p.sc AS BIGINT) AS share_ppm
        FROM roll c JOIN roll p ON p.node = c.node // 8
        WHERE c.node > 0
    """,
    # exact 2^-age recency decay via integer right shift
    "recency_decay_types_events": """
        WITH mx AS (
          SELECT MAX(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS m
          FROM events
        ),
        x AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CAST((epoch_us(mx.m)
                       - epoch_us(DATE_TRUNC('day', ts)))
                      // 86400000000 AS BIGINT) AS age
          FROM events CROSS JOIN mx
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS raw_cents,
               CAST(SUM(cents // (CAST(1 AS BIGINT)
                                  << LEAST(age, 62))) AS BIGINT)
                   AS decayed_cents
        FROM x GROUP BY 1
    """,
    # per-day type leaderboard rank + movement vs previous day
    "trending_types_daily_events": """
        WITH c AS (
          SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                 event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        r AS (
          SELECT day, event_type, n,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY day ORDER BY n DESC, event_type
                 ) AS BIGINT) AS rank
          FROM c
        )
        SELECT a.day, a.event_type, a.n, a.rank,
               CAST(COALESCE(b.rank, 0) AS BIGINT) AS prev_rank,
               CAST(COALESCE(b.rank, 0) - a.rank AS BIGINT) AS delta
        FROM r a
        LEFT JOIN r b ON b.event_type = a.event_type
                     AND b.day = a.day - INTERVAL 1 DAY
    """,
    # deterministic 15% MLM masking plan (positions only, no bytes)
    "mlm_mask_plan_docs": f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(LEN(string_split(
                     lower(COALESCE(text, '')), ' ')) AS BIGINT) AS n
          FROM documents
        ),
        c0 AS (
          SELECT doc_id, n,
                 CAST(doc_id * 1048576 + g.i AS HUGEINT) AS key
          FROM t CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, n)) AS i
          ) g
        ),
        {_sql_splitmix_stages("mm", {"k": "key"}, "c0")}
        SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN h_k % 100 < 15
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
        FROM mm6 GROUP BY 1
    """,
    # exact-integer shoelace polygon area per nation
    "polygon_area_nations": """
        WITH v AS (
          SELECT n_nationkey, 3 + n_nationkey % 4 AS nv, g.i
          FROM nation CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(0, 5)) AS i
          ) g
          WHERE g.i < 3 + n_nationkey % 4
        ),
        p AS (
          SELECT n_nationkey, nv, i,
                 (n_nationkey * 7 + i * 13) % 100 AS x,
                 (n_nationkey * 11 + i * 17) % 100 AS y,
                 (n_nationkey * 7 + ((i + 1) % nv) * 13) % 100 AS xn,
                 (n_nationkey * 11 + ((i + 1) % nv) * 17) % 100 AS yn
          FROM v
        )
        SELECT n_nationkey, CAST(nv AS BIGINT) AS n_vertices,
               CAST(SUM(x * yn - xn * y) AS BIGINT) AS area2
        FROM p GROUP BY 1, 2
    """,
    # PERCENTILE_CONT in exact micro-units (builtin NOT used)
    "pct_cont_types_events": """
        WITH c AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r AS (
          SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents) - 1 AS idx,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM c
        ),
        pos AS (
          SELECT DISTINCT event_type, n, (n - 1) * 500000 AS posm
          FROM r
        )
        SELECT pos.event_type, CAST(pos.n AS BIGINT) AS n,
               CAST(lo.cents * 1000000
                    + (hi.cents - lo.cents) * (posm % 1000000)
                    AS BIGINT) AS p50_micro
        FROM pos
        JOIN r lo ON lo.event_type = pos.event_type
                 AND lo.idx = posm // 1000000
        JOIN r hi ON hi.event_type = pos.event_type
                 AND hi.idx = LEAST(posm // 1000000 + 1, pos.n - 1)
    """,
    # classifier calibration / reliability bins
    "calibration_bins_docs": f"""
        WITH s AS (
          SELECT doc_id, score FROM ({_classifier_sql()}) z
        ),
        b AS (
          SELECT GREATEST(-8, LEAST(7,
                   (score + 1048576) // 256 - 4096)) AS bin,
                 CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS pos
          FROM s
        ),
        a AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS n_pos
          FROM b GROUP BY 1
        )
        SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
               CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_ppm
        FROM a
    """,
    # Kendall tau-a between the two daily count series (exact ints)
    "kendall_tau_daily_events": """
        WITH c AS (
          SELECT DATE_TRUNC('day', ts) AS day,
                 CAST(SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1
        ),
        p AS (
          SELECT SIGN(a.x - b.x) * SIGN(a.y - b.y) AS s
          FROM c a JOIN c b ON a.day < b.day
        ),
        m AS (
          SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS conc,
                 CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS disc
          FROM p
        )
        SELECT n AS n_days, conc AS n_conc, disc AS n_disc,
               CAST(CASE WHEN n < 2 THEN 0
                    ELSE (CASE WHEN conc - disc < 0
                               THEN -1 ELSE 1 END)
                         * (ABS(conc - disc) * 1000000
                            // (n * (n - 1) // 2))
               END AS BIGINT) AS tau_a_ppm
        FROM m
    """,
    # daily new-user counts + cumulative adoption curve
    "new_users_daily_events": """
        WITH f AS (
          SELECT user_id,
                 MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS day
          FROM events GROUP BY 1
        ),
        d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
              FROM f GROUP BY 1)
        SELECT day, n_new,
               CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT)
                   AS cum_users
        FROM d
    """,
    # lag-1..7 autocorrelation of the daily count series (exact ints)
    "autocorr_daily_events": """
        WITH d AS (
          SELECT DATE_TRUNC('day', ts) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1
        ),
        o AS (SELECT n, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
        lags AS (SELECT k FROM (VALUES (1), (2), (3), (4), (5), (6),
                                       (7)) t(k)),
        p AS (
          SELECT l.k, a.n AS xa, b.n AS xb
          FROM lags l CROSS JOIN o a
          JOIN o b ON b.rn = a.rn + l.k
        ),
        m AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(xa) AS BIGINT) AS sx,
                 CAST(SUM(xb) AS BIGINT) AS sy,
                 CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                 CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                 CAST(SUM(xb * xb) AS BIGINT) AS syy
          FROM p GROUP BY 1
        )
        SELECT CAST(k AS BIGINT) AS lag,
               CAST(m * sxy - sx * sy AS BIGINT) AS num,
               CAST(m * sxx - sx * sx AS BIGINT) AS den_x,
               CAST(m * syy - sy * sy AS BIGINT) AS den_y,
               CAST(CASE
                 WHEN m * sxx - sx * sx = 0
                      OR m * syy - sy * sy = 0 THEN 0
                 ELSE (CASE WHEN m * sxy - sx * sy < 0
                            THEN -1 ELSE 1 END)
                      * ((CAST(m * sxy - sx * sy AS HUGEINT)
                          * (m * sxy - sx * sy) * 1000000000)
                         // (CAST(m * sxx - sx * sx AS HUGEINT)
                             * (m * syy - sy * sy)))
               END AS BIGINT) AS corr_sq_ppb
        FROM m
    """,
    # per-edge triangle support (k-truss ingredient)
    "edge_support_hosts": """
        WITH raw AS (
          SELECT doc_id % 97 AS u,
                 (doc_id % 97 + 1 + (doc_id * j) % 96) % 97 AS v
          FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(j)
        ),
        e AS (
          SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
          FROM raw WHERE u <> v
        ),
        wedge AS (
          SELECT e1.a AS x, e1.b AS k, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        credit AS (
          SELECT x AS a, k AS b FROM wedge
          UNION ALL SELECT k, z FROM wedge
          UNION ALL SELECT x, z FROM wedge
        ),
        sup AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS s
          FROM credit GROUP BY 1, 2
        )
        SELECT e.a, e.b,
               CAST(COALESCE(sup.s, 0) AS BIGINT) AS support
        FROM e LEFT JOIN sup USING (a, b)
    """,
    # Iceberg-style clustering-depth layout metric
    "clustering_depth_events": """
        WITH p AS (
          SELECT event_id % 16 AS part,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r AS (SELECT part, MIN(cents) AS lo, MAX(cents) AS hi
              FROM p GROUP BY 1),
        d AS (
          SELECT r1.part, CAST(COUNT(*) AS BIGINT) AS depth
          FROM r r1 JOIN r r2 ON r2.lo <= r1.lo AND r2.hi >= r1.lo
          GROUP BY 1
        )
        SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_parts,
               CAST(MAX(depth) AS BIGINT) AS max_depth
        FROM d
    """,
    # hard positive/negative triplet mining over 10 anchors
    "triplet_mining_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        anch AS (SELECT vec_id, label FROM embeddings
                 ORDER BY vec_id LIMIT 10),
        d AS (
          SELECT a.vec_id AS anchor_id, e.vec_id AS other_id,
                 CAST(SUM((qa.v - qe.v) * (qa.v - qe.v)) AS BIGINT)
                     AS dist,
                 MAX(CASE WHEN e.label = a.label
                          THEN 1 ELSE 0 END) AS same
          FROM anch a
          JOIN embeddings e ON e.vec_id <> a.vec_id
          JOIN q qa ON qa.vec_id = a.vec_id
          JOIN q qe ON qe.vec_id = e.vec_id AND qe.dim = qa.dim
          GROUP BY 1, 2
        ),
        m AS (
          -- the 2^62 sentinel matches the engine's "no neighbor of
          -- this kind" marker, so singleton-label anchors stay exact
          SELECT anchor_id,
                 COALESCE(MIN(CASE WHEN same = 1 THEN dist END),
                          4611686018427387904) AS d_pos,
                 COALESCE(MIN(CASE WHEN same = 0 THEN dist END),
                          4611686018427387904) AS d_neg
          FROM d GROUP BY 1
        )
        SELECT anchor_id, CAST(d_pos AS BIGINT) AS d_pos,
               CAST(d_neg AS BIGINT) AS d_neg,
               CAST(d_neg - d_pos AS BIGINT) AS margin
        FROM m
    """,
    # p50/p90/p99 of first-view -> first-purchase-after latency
    "conversion_latency_quantiles_events": """
        WITH vf AS (
          SELECT user_id, MIN(ts) AS v0 FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        pf AS (
          SELECT e.user_id, MIN(e.ts) AS p0
          FROM events e
          JOIN vf ON vf.user_id = e.user_id AND e.ts > vf.v0
          WHERE e.event_type = 'purchase'
          GROUP BY 1
        ),
        d AS (
          SELECT CAST((epoch_us(p0) - epoch_us(vf.v0)) // 1000000
                      AS BIGINT) AS lat_s
          FROM pf JOIN vf USING (user_id)
        ),
        r AS (SELECT lat_s, ROW_NUMBER() OVER (ORDER BY lat_s) AS rn,
                     COUNT(*) OVER () AS n
              FROM d)
        SELECT CAST(q.q_pct AS BIGINT) AS q_pct, r.lat_s
        FROM r JOIN (VALUES (50, 0.5), (90, 0.9), (99, 0.99))
                    q(q_pct, qq)
          ON r.rn = CAST(ceil(q.qq * r.n) AS BIGINT)
    """,
    # KMV theta intersection estimate + exact companion
    "theta_intersection_types_events": f"""
        WITH f AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'view'
                          THEN 1 ELSE 0 END) AS in_view,
                 MAX(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS in_click
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1
        ),
        c0 AS (SELECT *, CAST(user_id AS HUGEINT) AS uid FROM f),
        {_sql_splitmix_stages("ti", {"u": "uid"}, "c0")},
        s AS (
          SELECT in_view, in_click,
                 CAST(CASE WHEN h_u >= 9223372036854775808
                           THEN h_u - 18446744073709551616
                           ELSE h_u END AS BIGINT) AS hash_i64
          FROM ti6
        ),
        sk AS (
          SELECT in_view, in_click,
                 ROW_NUMBER() OVER (ORDER BY hash_i64) AS rn
          FROM s
        ),
        sketch AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(in_view * in_click) AS BIGINT) AS nb
          FROM sk WHERE rn <= 64
        ),
        ex AS (
          SELECT CAST(SUM(in_view * in_click) AS BIGINT) AS n_inter,
                 CAST(COUNT(*) AS BIGINT) AS n_union
          FROM f
        )
        SELECT k, nb AS n_both_sketch,
               CAST(CASE WHEN k > 0 THEN nb * 1000000 // k
                         ELSE 0 END AS BIGINT) AS jaccard_est_ppm,
               n_inter, n_union,
               CAST(CASE WHEN n_union > 0
                         THEN n_inter * 1000000 // n_union
                         ELSE 0 END AS BIGINT) AS jaccard_ppm
        FROM sketch, ex
    """,
    # per-vector exact squared norm + dominant dimension
    "l2_norm_audit_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        n2 AS (
          SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS norm2_q
          FROM q GROUP BY 1
        ),
        mx AS (
          SELECT vec_id, v AS max_q, CAST(dim AS BIGINT) AS max_dim,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY v DESC, dim) AS rn
          FROM q
        )
        SELECT n2.vec_id, n2.norm2_q, mx.max_q, mx.max_dim
        FROM n2 JOIN mx ON mx.vec_id = n2.vec_id AND mx.rn = 1
    """,
    # term-frequency drift between corpus halves, top 20 by |delta|
    "term_shift_docs": """
        WITH toks AS (
          SELECT doc_id % 2 AS half, tok FROM (
            SELECT doc_id,
                   unnest(string_split(lower(COALESCE(text, '')), ' '))
                       AS tok
            FROM documents
          )
        ),
        c AS (
          SELECT tok AS term,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b
          FROM toks GROUP BY 1
        ),
        t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM c),
        d AS (
          SELECT term, n_a, n_b,
                 CAST((n_a * 1000000) // t.ta
                      - (n_b * 1000000) // t.tb AS BIGINT) AS delta_ppm
          FROM c CROSS JOIN t
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
            ORDER BY ABS(delta_ppm) DESC, term
          ) AS rn
          FROM d
        )
        SELECT term, n_a, n_b, delta_ppm FROM r WHERE rn <= 20
    """,
    # top first-3-type session paths (30-min gap sessionization)
    "session_paths_events": """
        WITH marked AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, event_id, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        ),
        ranked AS (
          SELECT user_id, sid, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                    ORDER BY ts, event_id) AS rn
          FROM sess
        ),
        paths AS (
          SELECT user_id, sid,
                 STRING_AGG(event_type, '>' ORDER BY rn) AS path
          FROM ranked WHERE rn <= 3 GROUP BY 1, 2
        ),
        pc AS (
          SELECT path, CAST(COUNT(*) AS BIGINT) AS n
          FROM paths GROUP BY 1
        ),
        top AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rn
          FROM pc
        )
        SELECT path, n FROM top WHERE rn <= 20
    """,
    # windowed stream-stream self-join: clicks within 5 min after a
    # view, same user, counted per day of the view
    "view_click_pairs_events": """
        WITH v AS (
          SELECT user_id, epoch_us(ts) AS us, ts FROM events
          WHERE event_type = 'view'
        ),
        c AS (
          SELECT user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'click'
        )
        SELECT CAST(DATE_TRUNC('day', v.ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM v JOIN c ON c.user_id = v.user_id
                     AND c.us > v.us AND c.us <= v.us + 300000000
        GROUP BY 1
    """,
    # exact integer Gram matrix (upper triangle) of the corpus
    "gram_matrix_embeddings": """
        WITH q AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1024)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        )
        SELECT CAST(a.dim AS BIGINT) AS i, CAST(b.dim AS BIGINT) AS j,
               CAST(SUM(a.v * b.v) AS BIGINT) AS s
        FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.dim >= a.dim
        GROUP BY 1, 2
    """,
    # per-type deterministic hash-priority 10-reservoir
    "reservoir_sample_per_type_events": f"""
        WITH c0 AS (
          SELECT event_id, event_type,
                 CAST(event_id AS HUGEINT) AS eid
          FROM events
        ),
        {_sql_splitmix_stages("rs", {"k": "eid"}, "c0")},
        s AS (
          SELECT event_type, event_id,
                 CAST(CASE WHEN h_k >= 9223372036854775808
                           THEN h_k - 18446744073709551616
                           ELSE h_k END AS BIGINT) AS hash_i64
          FROM rs6
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY hash_i64, event_id
          ) AS rank
          FROM s
        )
        SELECT event_type, CAST(rank AS BIGINT) AS rank,
               event_id, hash_i64
        FROM r WHERE rank <= 10
    """,
    # per-dimension rank (quantile) normalization of embeddings
    "rank_normalize_embeddings": """
        WITH e AS (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS q
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        )
        SELECT vec_id, CAST(dim AS BIGINT) AS dim,
               CAST(ROW_NUMBER() OVER (PARTITION BY dim
                                       ORDER BY q, vec_id)
                    AS BIGINT) AS rank
        FROM e
    """,
    # TWAP state per user (LEAD gaps; deterministic event_id ties)
    "twap_user_values": """
        WITH o AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
          FROM events
        ),
        a AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                               ELSE cents * (nxt - ts_us) END)
                      AS BIGINT) AS twap_num,
                 CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS span_us,
                 CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM o GROUP BY 1
        )
        SELECT * FROM a WHERE n_obs >= 2
    """,
    # per-(label, dim) centroid distance outliers, division-free
    "label_outliers_embeddings": """
        WITH e AS (
          SELECT vec_id, label, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS q
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        c AS (SELECT label, dim, SUM(q) AS s, COUNT(*) AS n
              FROM e GROUP BY 1, 2),
        d AS (
          SELECT e.vec_id, e.label,
                 SUM((c.n * e.q - c.s) * (c.n * e.q - c.s)) AS dist2
          FROM e JOIN c ON c.label = e.label AND c.dim = e.dim
          GROUP BY 1, 2
        ),
        r AS (
          SELECT label, vec_id, dist2,
                 ROW_NUMBER() OVER (PARTITION BY label
                                    ORDER BY dist2 DESC, vec_id) AS rk
          FROM d
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(rk AS BIGINT) AS rk, vec_id,
               CAST(dist2 AS BIGINT) AS dist2_scaled
        FROM r WHERE rk <= 5
    """,
    # run-length audit of the global (ts, event_id)-ordered stream
    "rle_runs_events": """
        WITH o AS (
          SELECT event_type,
                 CASE WHEN LAG(event_type)
                             OVER (ORDER BY ts, event_id)
                        IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS is_start
          FROM events
        )
        SELECT event_type, CAST(SUM(is_start) AS BIGINT) AS n_runs,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM o GROUP BY 1
    """,
    # exact quantile_disc of 30-min-gap session durations (seconds)
    "session_duration_quantiles_events": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        ),
        s AS (SELECT user_id, sid, MIN(ts) AS a, MAX(ts) AS b
              FROM sess GROUP BY 1, 2),
        d AS (SELECT CAST((epoch_us(b) - epoch_us(a)) // 1000000
                          AS BIGINT) AS dur_s FROM s),
        r AS (SELECT dur_s,
                     ROW_NUMBER() OVER (ORDER BY dur_s) AS rn,
                     COUNT(*) OVER () AS n
              FROM d)
        SELECT CAST(q.q_pct AS BIGINT) AS q_pct, r.dur_s
        FROM r JOIN (VALUES (50, 0.5), (90, 0.9), (99, 0.99))
                    q(q_pct, qq)
          ON r.rn = CAST(ceil(q.qq * r.n) AS BIGINT)
    """,
    # daily bounce-rate state over 30-minute-gap sessions
    "bounce_rate_daily_events": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        ),
        s AS (
          SELECT user_id, sid, MIN(ts) AS session_start,
                 COUNT(*) AS n_events
          FROM sess GROUP BY 1, 2
        )
        SELECT CAST(DATE_TRUNC('day', session_start) AS TIMESTAMP)
                   AS day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces
        FROM s GROUP BY 1
    """,
    # positional phrase retrieval ('hash join', lower+space tokens)
    "phrase_query_docs": """
        WITH sp AS (
          SELECT doc_id, string_split(lower(text), ' ') AS s
          FROM documents
        ),
        h AS (
          SELECT doc_id,
                 CAST(len(list_filter(range(1, len(s)),
                          i -> s[i] = 'hash' AND s[i+1] = 'join'))
                      AS BIGINT) AS n_hits
          FROM sp
        )
        SELECT doc_id, n_hits FROM h WHERE n_hits > 0
    """,
    # per-(label, dim) exact integer centroid state
    "label_centroids_embeddings": """
        WITH e AS (
          SELECT label, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(dim AS BIGINT) AS dim,
               CAST(SUM(v) AS BIGINT) AS sum_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2
    """,
    # LOCF forward fill over each user's daily last value
    "forward_fill_user_values": """
        WITH o AS (
          SELECT user_id,
                 CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ),
        pd AS (SELECT user_id, day, cents FROM o WHERE rn = 1),
        b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
              FROM pd GROUP BY 1),
        spine AS (
          SELECT user_id,
                 UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
          FROM b
        ),
        f AS (
          SELECT s.user_id, s.day, p.cents
          FROM spine s LEFT JOIN pd p
            ON p.user_id = s.user_id AND p.day = s.day
        )
        SELECT user_id,
               CAST(epoch_us(day) AS BIGINT) AS day_us,
               CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
                      PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cents,
               CAST(CASE WHEN f.cents IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS filled
        FROM f
    """,
    # seasonal (dow x hour) load profile with flat-baseline deviation
    "load_profile_events": """
        WITH c AS (
          SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                 CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        t AS (SELECT SUM(n) AS total FROM c)
        SELECT dow, hour, n,
               CAST(n * 168 - t.total AS BIGINT) AS dev_x168
        FROM c, t
    """,
    "pseudonymize_users_events": _pseudonymize_sql(20260819),
    "zipf_state_docs": _zipf_sql(),
    # F2 self-join size + skew indicators on l_partkey
    "selfjoin_size_lineitem": """
        WITH c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM lineitem GROUP BY 1)
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(SUM(cnt * cnt) AS BIGINT) AS f2_selfjoin_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt
        FROM c
    """,
    # exact audience set algebra for the (view, click) user sets
    "audience_overlap_types_events": """
        WITH d AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'view'
                          THEN 1 ELSE 0 END) AS hv,
                 MAX(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS hc
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1
        )
        SELECT CAST(0 AS BIGINT) AS grp,
               CAST(SUM(hv) AS BIGINT) AS n_view,
               CAST(SUM(hc) AS BIGINT) AS n_click,
               CAST(SUM(hv * hc) AS BIGINT) AS n_both,
               CAST(COUNT(*) AS BIGINT) AS n_union
        FROM d
    """,
    # MODE() per type with the defined (count DESC, cents ASC) tie
    "grouped_mode_cents_events": """
        WITH c AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        r AS (
          SELECT event_type, cents, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, cents) AS rk
          FROM c
        )
        SELECT event_type, cents AS mode_cents, n AS mode_n
        FROM r WHERE rk = 1
    """,
    "partition_checksums_events": _checksum_sql(),
    "daily_hll_users": _hll_keyed_sql(),
    "lm_surprisal_docs": _lm_surprisal_sql(),
    # round 4: seeded deterministic epoch shuffle — the global ORDER
    # itself is hashed (ROW_NUMBER over the signed splitmix64 view)
    "global_shuffle_docs": _global_shuffle_sql(),
    # round 4: sub-document / crawl-merge / mixture operators — each
    # oracle re-derives content from generator arithmetic, never from
    # the engine's split/canonicalize/hash machinery
    "paragraph_dedup_docs": _PARAGRAPH_DEDUP_SQL,
    "length_buckets_docs": _LENGTH_BUCKETS_SQL,
    "source_mixture_docs": _source_mixture_sql(),
    "url_dedup_best_docs": _URL_DEDUP_BEST_SQL,
    "cms_counts_events": _cms_sql(),
    "host_quota_docs": _HOST_QUOTA_SQL,
    "bloom_bits_events": _bloom_sql(),
    "blocklist_filter_docs": _BLOCKLIST_FILTER_SQL,
    "top_bigrams_docs": _TOP_BIGRAMS_SQL,
    # format round-trips: the oracle is the source table itself (with
    # the CSV null/empty-string normalization both sides apply)
    "jsonl_roundtrip_docs": """
        SELECT doc_id, COALESCE(text, '') AS text,
               COALESCE(lang, '') AS lang,
               COALESCE(source, '') AS source, n_chars
        FROM documents
    """,
    "csv_roundtrip_docs": """
        SELECT doc_id, COALESCE(text, '') AS text,
               COALESCE(lang, '') AS lang,
               COALESCE(source, '') AS source, n_chars
        FROM documents
    """,
    "pagerank_hosts_docs": _pagerank_sql(),
    "curation_pipeline_docs": _CURATION_SQL,
    "chunk_documents_docs": _CHUNK_SQL,
    "normalize_text_docs": _NORMALIZE_TEXT_SQL,
    "bloom_probe_events": _bloom_probe_sql(),
    "tfidf_retrieval_docs": _TFIDF_RETRIEVAL_SQL,
    "bm25_retrieval_docs": _BM25_RETRIEVAL_SQL,
    # reciprocal-rank fusion of the two retrievers above: both full
    # SQLs are reused verbatim as subqueries, ranks recomputed with the
    # engine's exact tie-break, contributions floor(2^20/(60+rank))
    "rrf_fusion_docs": f"""
        WITH ta AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) AS r
          FROM ({_TFIDF_RETRIEVAL_SQL})
        ),
        tb AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) AS r
          FROM ({_BM25_RETRIEVAL_SQL})
        ),
        u AS (
          SELECT doc_id, 1048576 // (60 + r) AS c FROM ta
          UNION ALL
          SELECT doc_id, 1048576 // (60 + r) AS c FROM tb
        )
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_fp,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM u GROUP BY 1
        ORDER BY rrf_fp DESC, doc_id LIMIT 10
    """,
    "perplexity_buckets_docs": _ppx_buckets_sql(),
    "cdc_chunks_docs": _cdc_sql(),
    "cdc_dup_spans_docs": _cdc_dup_spans_sql(),
    "pretrain_pipeline_docs": _pretrain_sql(),
    # round 4: hashed-linear classifier scoring — same token-hash
    # unroll as simhash, bucket/weight arithmetic, integer sums
    "classifier_score_docs": _classifier_sql(),
    # curriculum packing — the classifier SQL wrapped as a CTE, then
    # the same window prefix sum as pack_sequences_docs over the
    # (score DESC, doc_id) integer order key
    "curriculum_pack_docs": f"""
        WITH scores AS ({_classifier_sql()}),
        d AS (
            SELECT doc_id, n_tokens AS ntok,
                   -score * 4294967296 + doc_id AS ord
            FROM scores
        ),
        p AS (
            SELECT doc_id, ntok,
                   CAST(COALESCE(SUM(ntok) OVER (
                       ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_tok
            FROM d
        )
        SELECT doc_id, start_tok,
               start_tok // 512 AS first_seq,
               CASE WHEN ntok > 0
                    THEN (start_tok + ntok - 1) // 512
                    ELSE start_tok // 512 END AS last_seq
        FROM p
    """,
    # round 4: incremental crawl diff — both snapshots and the FULL
    # OUTER JOIN re-derived from generator arithmetic; md5 string
    # equality stands in for the engine's md5-64 fingerprint equality
    "crawl_diff_docs": """
        WITH a AS (
            SELECT 'https://site' || (doc_id % 97) || '.example.com/d'
                       || doc_id AS url,
                   md5(lower(COALESCE(text, ''))) AS fp
            FROM documents WHERE doc_id % 10 <> 0
        ),
        b AS (
            SELECT 'https://site' || (doc_id % 97) || '.example.com/d'
                       || doc_id AS url,
                   md5(lower(COALESCE(text, '')
                             || CASE WHEN doc_id % 7 = 3
                                     THEN ' v2' ELSE '' END)) AS fp
            FROM documents WHERE doc_id % 10 <> 5
        )
        SELECT COALESCE(a.url, b.url) AS url,
               CASE WHEN a.url IS NULL THEN 'added'
                    WHEN b.url IS NULL THEN 'removed'
                    WHEN a.fp <> b.fp THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.url = b.url
    """,
    # round 4: inverted index — postings rebuilt with an ordered
    # string_agg over the distinct (term, doc) pairs of THE shared
    # tokenization (lower + single-space split; null text = '')
    "inverted_index_docs": """
        WITH tok0 AS (
            SELECT doc_id,
                   unnest(string_split(lower(COALESCE(text, '')), ' '))
                       AS term
            FROM documents
        ),
        tok AS (SELECT DISTINCT doc_id, term FROM tok0)
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id) AS postings
        FROM tok GROUP BY term HAVING COUNT(*) >= 3
    """,
    # round 4: GPT-3-style n-gram decontamination — eval window is
    # tokens 2..9 zero-based = list_slice(ts, 3, 10) one-based; the
    # tokenization mirrors THE shared kernel (lower + single-space)
    "ngram_decontaminate_docs": _NGRAM_DECON_SQL,
    # round 4: sequence packing recomputed with a SQL window prefix sum
    # (windowed SUM is HUGEINT in DuckDB -> CAST; integer division //)
    "pack_sequences_docs": """
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                   (doc_id * 2654435761) % 4294967296 AS ord
            FROM documents
        ),
        p AS (
            SELECT doc_id, ntok,
                   CAST(COALESCE(SUM(ntok) OVER (
                       ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_tok
            FROM d
        )
        SELECT doc_id, start_tok,
               start_tok // 512 AS first_seq,
               CASE WHEN ntok > 0
                    THEN (start_tok + ntok - 1) // 512
                    ELSE start_tok // 512 END AS last_seq
        FROM p
    """,
    # round 4: per-host aggregates with the host derived from doc_id
    # arithmetic (independent of the URL regex machinery)
    "host_stats_docs": """
        SELECT 'site' || (doc_id % 97) || '.example.com' AS host,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1
    """,
    # round 4: connected-component clustering over the exact pair set,
    # recomputed with a recursive-CTE reachability (fully independent
    # of the engine's union-find / hash-min propagation)
    "near_dup_keep_docs": f"""
        WITH RECURSIVE corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < {_NDUP_LIMIT}
          UNION ALL
          SELECT doc_id + {_MUT_OFFSET}, text || '{_MUT_SUFFIX}'
          FROM documents WHERE doc_id < {_NDUP_LIMIT}
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(
                   list_transform(range(1, len(string_split(text, ' ')) - 1),
                     i -> string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2])) AS s
          FROM corpus
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(a.s || b.s)) >= 0.5
        ),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, r) AS (
          SELECT doc_id, doc_id FROM corpus
          UNION
          SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
        )
        SELECT node AS doc_id, MIN(r) AS cluster_id,
               CAST(node = MIN(r) AS BIGINT) AS is_rep
        FROM reach GROUP BY node
    """,
    # round 4: repetition stats recomputed with INDEPENDENT machinery
    # (list ops + gaps-and-islands window vs the engine's factorize +
    # segment counting)
    "repetition_stats_docs": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
            SELECT doc_id, unnest(ws) AS tk,
                   generate_subscripts(ws, 1) AS pos
            FROM w
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                                   list_slice(ws, 2, len(ws)))) AS b
            FROM w WHERE len(ws) > 1
        ),
        bgc AS (
            SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
        ),
        top_bg AS (
            SELECT doc_id, max(c) AS top_bigram_n FROM bgc GROUP BY 1
        ),
        isl AS (
            SELECT doc_id, tk,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id, tk ORDER BY pos) AS g
            FROM tok
        ),
        runs AS (
            SELECT doc_id, count(*) AS r FROM isl GROUP BY doc_id, tk, g
        ),
        mr AS (SELECT doc_id, max(r) AS max_token_run FROM runs GROUP BY 1)
        SELECT w.doc_id,
               CAST(len(ws) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_tokens,
               CAST(COALESCE(top_bg.top_bigram_n, 0) AS BIGINT)
                   AS top_bigram_n,
               CAST(mr.max_token_run AS BIGINT) AS max_token_run
        FROM w
        LEFT JOIN top_bg USING (doc_id)
        JOIN mr USING (doc_id)
    """,









    # --- sixteenth wave (round 5) ---
    # Gini numerator/denominator in exact ints over sorted counts
    "activity_gini_users": """
        WITH c AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1
        ),
        r AS (
          SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i,
                 COUNT(*) OVER () AS n, SUM(x) OVER () AS total
          FROM c
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_users,
               CAST(MAX(total) AS BIGINT) AS total_events,
               CAST(SUM((2 * i - n - 1) * x) AS BIGINT) AS gini_num,
               CAST(MAX(n) * MAX(total) AS BIGINT) AS gini_den
        FROM r
    """,
    # per-type geometric-mean state: grouped qlog2 sums
    "geo_mean_values_events": f"""
        WITH RECURSIVE c0 AS (
          SELECT event_type,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        pos AS (SELECT * FROM c0 WHERE cents > 0),
        vals AS (SELECT DISTINCT cents AS c FROM pos),
        {_QLOG2_CTE}
        SELECT pos.event_type,
               CAST(SUM(q.qlog2) AS BIGINT) AS qlog_sum,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM pos JOIN q ON q.c = pos.cents
        GROUP BY 1
    """,
    # --- fifteenth wave (round 5) ---
    # DAU + trailing-30d MAU: per-day band join with DISTINCT (the
    # engine side restates it as interval stabbing — no windowed
    # COUNT DISTINCT exists in either engine)
    "dau_mau_daily_events": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 86400000000 AS day
          FROM events
        ),
        days AS (SELECT DISTINCT day FROM ud),
        dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                FROM ud GROUP BY 1),
        mau AS (
          SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
          FROM days d JOIN ud u
            ON u.day BETWEEN d.day - 29 AND d.day
          GROUP BY 1
        )
        SELECT CAST(d.day AS BIGINT) AS day, dau.dau, mau.mau
        FROM days d JOIN dau USING (day) JOIN mau USING (day)
    """,
    # --- fourteenth wave (round 5) ---
    # average neighbor degree as an exact (sum, count) ratio pair
    "avg_neighbor_degree_hosts": """
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT (doc_id % 97) AS u,
                   ((doc_id % 97) + 1 + ((doc_id * 1) % 96)) % 97 AS v
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 2) % 96)) % 97
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 3) % 96)) % 97
            FROM documents
          )
        ),
        d AS (SELECT u AS node, COUNT(*) AS deg FROM e0 GROUP BY 1)
        SELECT CAST(e0.u AS BIGINT) AS node,
               CAST(SUM(COALESCE(dv.deg, 0)) AS BIGINT) AS nbr_deg_sum,
               CAST(COUNT(*) AS BIGINT) AS out_degree
        FROM e0 LEFT JOIN d dv ON e0.v = dv.node
        GROUP BY 1
    """,
    # peak 1-hour rate: max over the trailing-window counts
    "peak_rate_events": """
        WITH w AS (
          SELECT user_id,
                 COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                   AND CURRENT ROW) AS n_trailing
          FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(n_trailing) AS BIGINT) AS peak_1h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM w GROUP BY 1
    """,
    # ratio-to-report in exact basis points
    "revenue_share_lineitem": """
        WITH g AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(ROUND(SUM(l_extendedprice * (1 - l_discount))
                      * 100) AS BIGINT) AS revenue_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1, 2
        ),
        t AS (SELECT SUM(revenue_cents) AS total FROM g)
        SELECT g.*,
               CAST(g.revenue_cents * 10000 // t.total AS BIGINT)
                   AS share_bp
        FROM g, t
    """,
    # Heaps-law vocabulary growth: new distinct BIGRAMS per id decile
    "vocab_growth_docs": """
        WITH toks AS (
          SELECT doc_id,
                 string_split(lower(COALESCE(text, '')), ' ') AS ws
          FROM documents
        ),
        bg AS (
          SELECT doc_id, ws[g.i] || ' ' || ws[g.i + 1] AS term
          FROM toks CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, len(ws) - 1)) AS i
          ) g
        ),
        f AS (SELECT term, MIN(doc_id) AS first_doc FROM bg GROUP BY 1),
        m AS (SELECT MAX(doc_id) AS max_id FROM documents)
        SELECT CAST(first_doc * 10 // (m.max_id + 1) AS BIGINT)
                   AS decile,
               CAST(COUNT(*) AS BIGINT) AS new_terms
        FROM f, m GROUP BY 1
    """,
    # --- thirteenth wave (round 5) ---
    # stream-disorder: arrival rank minus event-time rank, max per key
    "reorder_depth_events": """
        WITH r AS (
          SELECT user_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY event_id) AS ra,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS rt
          FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(ra - rt) AS BIGINT) AS max_reorder_depth,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY 1
    """,
    # --- twelfth wave (round 5) ---
    # axis-aligned box rasterization: corner row/col ranges (the same
    # floor arithmetic as cell_sql_expr), generate_series fan-out
    "box_cover_cells_nations": f"""
        WITH b AS (
          SELECT n_nationkey,
                 LEAST(GREATEST(
                     {_derive_lat_sql('CAST(n_nationkey AS BIGINT)')},
                     -80.0), 80.0) AS lat_c,
                 LEAST(GREATEST(
                     {_derive_lon_sql('CAST(n_nationkey AS BIGINT)')},
                     -170.0), 170.0) AS lon_c,
                 CAST(2 + n_nationkey % 4 AS DOUBLE) AS hh,
                 CAST(3 + n_nationkey % 5 AS DOUBLE) AS hw
          FROM nation
        ),
        r AS (
          SELECT n_nationkey,
                 LEAST(GREATEST(CAST(FLOOR((lat_c - hh + 90.0) / 180.0
                     * 128) AS BIGINT), 0), 127) AS row0,
                 LEAST(GREATEST(CAST(FLOOR((lat_c + hh + 90.0) / 180.0
                     * 128) AS BIGINT), 0), 127) AS row1,
                 LEAST(GREATEST(CAST(FLOOR((lon_c - hw + 180.0) / 360.0
                     * 256) AS BIGINT), 0), 255) AS col0,
                 LEAST(GREATEST(CAST(FLOOR((lon_c + hw + 180.0) / 360.0
                     * 256) AS BIGINT), 0), 255) AS col1
          FROM b
        )
        SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
               CAST(5 * 288230376151711744 + gr.rr * 536870912 + gc.cc
                    AS BIGINT) AS cell
        FROM r
        CROSS JOIN LATERAL (
          SELECT UNNEST(generate_series(row0, row1)) AS rr
        ) gr
        CROSS JOIN LATERAL (
          SELECT UNNEST(generate_series(col0, col1)) AS cc
        ) gc
    """,
    # k-anonymity: quasi-identifier group sizes below k=5
    "k_anonymity_events": """
        SELECT event_type,
               CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)
                   AS hour_of_day,
               -- FLOOR division (numpy floor_divide semantics):
               -- DuckDB // truncates toward zero, so shift negatives
               CAST((CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     - CASE WHEN ROUND(CAST(value AS DOUBLE) * 100.0) < 0
                            THEN 999 ELSE 0 END)
                    // 1000 AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2, 3
        HAVING COUNT(*) < 5
    """,
    # k-fold split audit: splitmix fold + stratification counts
    "kfold_split_docs": f"""
        WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        {_sql_splitmix_stages(
            "kf", {"s": "CAST(doc_id AS HUGEINT)"}, "d"
        )}
        SELECT CAST(h_s % 5 AS BIGINT) AS fold, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM kf6 GROUP BY 1, 2
    """,
    # --- eleventh wave (round 5) ---
    # MaxSim late-interaction retrieval on 2^20-scaled integer dots
    "maxsim_retrieval_embeddings": """
        WITH e AS MATERIALIZED (
          SELECT vec_id, vec_id // 8 AS doc, g.i,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        qv AS (SELECT vec_id AS qt, i, v FROM e WHERE vec_id < 4),
        dots AS (
          SELECT e.doc, e.vec_id, qv.qt, SUM(e.v * qv.v) AS dot
          FROM e JOIN qv USING (i) GROUP BY 1, 2, 3
        ),
        mx AS (SELECT doc, qt, MAX(dot) AS m FROM dots GROUP BY 1, 2)
        SELECT CAST(doc AS BIGINT) AS doc,
               CAST(SUM(m) AS BIGINT) AS maxsim
        FROM mx GROUP BY 1
    """,
    # SQ8 audit: per-dim integer min/max, code + reconstruction replay
    "sq8_quantize_embeddings": """
        WITH e AS MATERIALIZED (
          SELECT vec_id, g.i AS dim,
                 CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS v
          FROM embeddings CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(1, 64)) AS i
          ) g
        ),
        s AS (
          SELECT dim, MIN(v) AS lo,
                 GREATEST(MAX(v) - MIN(v), 1) AS rng
          FROM e GROUP BY 1
        ),
        q AS (
          SELECT e.vec_id, e.dim,
                 (e.v - s.lo) * 255 // s.rng AS code,
                 ABS(e.v - (s.lo + ((e.v - s.lo) * 255 // s.rng)
                            * s.rng // 255)) AS err
          FROM e JOIN s USING (dim)
        )
        SELECT vec_id,
               CAST(SUM(code * dim) AS BIGINT) AS code_checksum,
               CAST(MAX(err) AS BIGINT) AS max_err,
               CAST(SUM(err) AS BIGINT) AS sum_err
        FROM q GROUP BY 1
    """,
    # --- tenth wave (round 5) ---
    "winnowing_match_pairs": _winnowing_pairs_sql(min_shared=8, max_df=20),
    "source_entropy_docs": _source_entropy_sql(),
    # A/B readout: FILTERed exact moments per arm + cross-multiplied
    # mean-difference numerator
    "ab_test_events": """
        WITH c AS (
          SELECT event_type, user_id % 2 AS variant,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        g AS (
          SELECT event_type,
                 CAST(COUNT(*) FILTER (variant = 0) AS BIGINT)
                     AS n_control,
                 CAST(COALESCE(SUM(cents) FILTER (variant = 0), 0)
                     AS BIGINT) AS sum_control,
                 CAST(COALESCE(SUM(cents * cents) FILTER (variant = 0),
                     0) AS BIGINT) AS ss_control,
                 CAST(COUNT(*) FILTER (variant = 1) AS BIGINT)
                     AS n_treat,
                 CAST(COALESCE(SUM(cents) FILTER (variant = 1), 0)
                     AS BIGINT) AS sum_treat,
                 CAST(COALESCE(SUM(cents * cents) FILTER (variant = 1),
                     0) AS BIGINT) AS ss_treat
          FROM c GROUP BY 1
        )
        SELECT *,
               CAST(sum_treat * n_control - sum_control * n_treat
                    AS BIGINT) AS mean_diff_num
        FROM g
    """,
    # interval stabbing via difference array + running sum
    "open_orders_daily": """
        WITH d AS (
          SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                 1 AS delta
          FROM orders
          UNION ALL
          SELECT epoch_us(o_orderdate) // 86400000000 + 30, -1
          FROM orders
        ),
        g AS (SELECT day, SUM(delta) AS net FROM d GROUP BY 1)
        SELECT CAST(day AS BIGINT) AS day,
               CAST(SUM(net) OVER (
                 ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS open_orders
        FROM g
    """,
    # --- ninth wave (round 5) ---
    "compact_cells_events": _compact_cells_sql(),
    "pr_curve_docs": _pr_curve_sql(),
    # RFM: ceil-rank quintile boundaries per measure + bucket scores
    "rfm_segments_users": """
        WITH c AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        u AS (
          SELECT user_id, MAX(day) AS last_day,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 CAST(SUM(cents) AS BIGINT) AS monetary_cents
          FROM c GROUP BY 1
        ),
        m AS (
          SELECT user_id,
                 (SELECT MAX(last_day) FROM u) - last_day
                     AS recency_days,
                 frequency, monetary_cents
          FROM u
        ),
        rq AS (
          SELECT recency_days AS v,
                 ROW_NUMBER() OVER (ORDER BY recency_days) AS rn,
                 COUNT(*) OVER () AS n
          FROM m
        ),
        rb AS (
          SELECT MAX(CASE WHEN q = 1 THEN v END) AS b1,
                 MAX(CASE WHEN q = 2 THEN v END) AS b2,
                 MAX(CASE WHEN q = 3 THEN v END) AS b3,
                 MAX(CASE WHEN q = 4 THEN v END) AS b4
          FROM rq
          JOIN (VALUES (1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
               q(q, qq)
            ON rn = CAST(ceil(qq * n) AS BIGINT)
        ),
        fq AS (
          SELECT frequency AS v,
                 ROW_NUMBER() OVER (ORDER BY frequency) AS rn,
                 COUNT(*) OVER () AS n
          FROM m
        ),
        fb AS (
          SELECT MAX(CASE WHEN q = 1 THEN v END) AS b1,
                 MAX(CASE WHEN q = 2 THEN v END) AS b2,
                 MAX(CASE WHEN q = 3 THEN v END) AS b3,
                 MAX(CASE WHEN q = 4 THEN v END) AS b4
          FROM fq
          JOIN (VALUES (1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
               q(q, qq)
            ON rn = CAST(ceil(qq * n) AS BIGINT)
        ),
        mq AS (
          SELECT monetary_cents AS v,
                 ROW_NUMBER() OVER (ORDER BY monetary_cents) AS rn,
                 COUNT(*) OVER () AS n
          FROM m
        ),
        mb AS (
          SELECT MAX(CASE WHEN q = 1 THEN v END) AS b1,
                 MAX(CASE WHEN q = 2 THEN v END) AS b2,
                 MAX(CASE WHEN q = 3 THEN v END) AS b3,
                 MAX(CASE WHEN q = 4 THEN v END) AS b4
          FROM mq
          JOIN (VALUES (1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
               q(q, qq)
            ON rn = CAST(ceil(qq * n) AS BIGINT)
        ),
        sc AS (
          SELECT m.user_id, m.recency_days, m.frequency,
                 m.monetary_cents,
                 1 + CAST(m.recency_days > rb.b1 AS BIGINT)
                   + CAST(m.recency_days > rb.b2 AS BIGINT)
                   + CAST(m.recency_days > rb.b3 AS BIGINT)
                   + CAST(m.recency_days > rb.b4 AS BIGINT) AS r_score,
                 1 + CAST(m.frequency > fb.b1 AS BIGINT)
                   + CAST(m.frequency > fb.b2 AS BIGINT)
                   + CAST(m.frequency > fb.b3 AS BIGINT)
                   + CAST(m.frequency > fb.b4 AS BIGINT) AS f_score,
                 1 + CAST(m.monetary_cents > mb.b1 AS BIGINT)
                   + CAST(m.monetary_cents > mb.b2 AS BIGINT)
                   + CAST(m.monetary_cents > mb.b3 AS BIGINT)
                   + CAST(m.monetary_cents > mb.b4 AS BIGINT) AS m_score
          FROM m, rb, fb, mb
        )
        SELECT user_id, recency_days, frequency, monetary_cents,
               r_score, f_score, m_score,
               CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
                   AS segment
        FROM sc
    """,
    # HITS: one exact-integer mutual-reinforcement round
    "hits_hosts_docs": """
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT (doc_id % 97) AS u,
                   ((doc_id % 97) + 1 + ((doc_id * 1) % 96)) % 97 AS v
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 2) % 96)) % 97
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 3) % 96)) % 97
            FROM documents
          )
        ),
        a1 AS MATERIALIZED (
          SELECT v AS node, COUNT(*) AS c FROM e0 GROUP BY 1
        ),
        h1 AS MATERIALIZED (
          SELECT e0.u AS node, SUM(a1.c) AS s
          FROM e0 JOIN a1 ON e0.v = a1.node GROUP BY 1
        ),
        a2 AS (
          SELECT e0.v AS node, SUM(h1.s) AS s
          FROM e0 JOIN h1 ON e0.u = h1.node GROUP BY 1
        )
        SELECT CAST(COALESCE(h1.node, a2.node) AS BIGINT) AS node,
               CAST(COALESCE(h1.s, 0) AS BIGINT) AS hub,
               CAST(COALESCE(a2.s, 0) AS BIGINT) AS auth
        FROM h1 FULL JOIN a2 ON h1.node = a2.node
    """,
    # --- eighth wave (round 5) ---
    # OHLC bars: window first/last over (ts, tie) order + grouped
    # min/max — every column exact cents
    "ohlc_candles_events": """
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                 epoch_us(ts) AS ts_us, event_id,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        w AS (
          SELECT event_type, hour, cents,
                 FIRST_VALUE(cents) OVER (
                   PARTITION BY event_type, hour
                   ORDER BY ts_us, event_id) AS o,
                 LAST_VALUE(cents) OVER (
                   PARTITION BY event_type, hour
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS cl
          FROM c
        )
        SELECT event_type, CAST(hour AS BIGINT) AS hour,
               CAST(MIN(o) AS BIGINT) AS open_cents,
               CAST(MAX(cents) AS BIGINT) AS high_cents,
               CAST(MIN(cents) AS BIGINT) AS low_cents,
               CAST(MIN(cl) AS BIGINT) AS close_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM w GROUP BY 1, 2
    """,
    # gap-filled hourly timeline: generate_series spine x distinct
    # keys, LEFT JOIN the counts, COALESCE 0
    "gapfill_hourly_events": """
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        b AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM c),
        t AS (SELECT DISTINCT event_type FROM c),
        s AS (
          SELECT t.event_type, gs.hour
          FROM t CROSS JOIN b
          CROSS JOIN LATERAL (
            SELECT UNNEST(generate_series(b.h0, b.h1)) AS hour
          ) gs
        )
        SELECT s.event_type, CAST(s.hour AS BIGINT) AS hour,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM s LEFT JOIN c
          ON s.event_type = c.event_type AND s.hour = c.hour
    """,
    # winnowing fingerprints: generated hash-replay SQL
    "winnowing_docs": _winnowing_sql(),
    # Q12-style conditional aggregation over a join
    "late_shipment_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN late AND high THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_late_count,
               CAST(SUM(CASE WHEN late AND NOT high THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_late_count,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM (
          SELECT l_returnflag,
                 epoch_us(l_shipdate) - epoch_us(o_orderdate)
                     > 90 * 86400000000 AS late,
                 o_orderpriority IN ('1-URGENT', '2-HIGH') AS high
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        GROUP BY 1
    """,
    # Q18: HAVING-filtered quantity aggregate, then enrich
    "q18_large_orders": """
        WITH s AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qty
          FROM lineitem GROUP BY 1
        ),
        big AS (SELECT * FROM s WHERE sum_qty > 200)
        SELECT c.c_name, o.o_custkey, o.o_orderkey,
               epoch_us(o.o_orderdate) AS o_orderdate_us,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               big.sum_qty
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    # Q22 shape: exact scalar-average broadcast + anti join
    "q22_idle_customers": """
        WITH pos AS (
          SELECT * FROM (
            SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
                   CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 100.0)
                        AS BIGINT) AS cents
            FROM customer
          ) WHERE cents > 0
        ),
        a AS (SELECT SUM(cents) AS s, COUNT(*) AS n FROM pos),
        rich AS (
          SELECT pos.* FROM pos, a WHERE pos.cents * a.n > a.s
        ),
        recent AS (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        )
        SELECT nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM rich
        WHERE c_custkey NOT IN (SELECT o_custkey FROM recent)
        GROUP BY 1
    """,

    # k-core (k=21): 12 unrolled peels over the symmetrized host
    # graph; peeling is monotone + idempotent past the fixpoint, so
    # the fixed unroll equals the engine's early-breaking loop
    "k_core_hosts": """
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT (doc_id % 97) AS u,
                   ((doc_id % 97) + 1 + ((doc_id * 1) % 96)) % 97 AS v
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 2) % 96)) % 97
            FROM documents
            UNION ALL
            SELECT (doc_id % 97),
                   ((doc_id % 97) + 1 + ((doc_id * 3) % 96)) % 97
            FROM documents
          )
        ),
        e AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
          ) WHERE u <> v
        ),
        d1 AS (SELECT u AS node, COUNT(*) AS c FROM e GROUP BY 1),
a1 AS MATERIALIZED (SELECT node FROM d1 WHERE c >= 21),
d2 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a1 x ON e.u = x.node
        JOIN a1 y ON e.v = y.node GROUP BY 1),
a2 AS MATERIALIZED (SELECT node FROM d2 WHERE c >= 21),
d3 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a2 x ON e.u = x.node
        JOIN a2 y ON e.v = y.node GROUP BY 1),
a3 AS MATERIALIZED (SELECT node FROM d3 WHERE c >= 21),
d4 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a3 x ON e.u = x.node
        JOIN a3 y ON e.v = y.node GROUP BY 1),
a4 AS MATERIALIZED (SELECT node FROM d4 WHERE c >= 21),
d5 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a4 x ON e.u = x.node
        JOIN a4 y ON e.v = y.node GROUP BY 1),
a5 AS MATERIALIZED (SELECT node FROM d5 WHERE c >= 21),
d6 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a5 x ON e.u = x.node
        JOIN a5 y ON e.v = y.node GROUP BY 1),
a6 AS MATERIALIZED (SELECT node FROM d6 WHERE c >= 21),
d7 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a6 x ON e.u = x.node
        JOIN a6 y ON e.v = y.node GROUP BY 1),
a7 AS MATERIALIZED (SELECT node FROM d7 WHERE c >= 21),
d8 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a7 x ON e.u = x.node
        JOIN a7 y ON e.v = y.node GROUP BY 1),
a8 AS MATERIALIZED (SELECT node FROM d8 WHERE c >= 21),
d9 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a8 x ON e.u = x.node
        JOIN a8 y ON e.v = y.node GROUP BY 1),
a9 AS MATERIALIZED (SELECT node FROM d9 WHERE c >= 21),
d10 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a9 x ON e.u = x.node
        JOIN a9 y ON e.v = y.node GROUP BY 1),
a10 AS MATERIALIZED (SELECT node FROM d10 WHERE c >= 21),
d11 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a10 x ON e.u = x.node
        JOIN a10 y ON e.v = y.node GROUP BY 1),
a11 AS MATERIALIZED (SELECT node FROM d11 WHERE c >= 21),
d12 AS (SELECT e.u AS node, COUNT(*) AS c FROM e
        JOIN a11 x ON e.u = x.node
        JOIN a11 y ON e.v = y.node GROUP BY 1),
a12 AS MATERIALIZED (SELECT node FROM d12 WHERE c >= 21),
        df AS (
          SELECT e.u AS node, COUNT(*) AS c FROM e
          JOIN a12 x ON e.u = x.node
          JOIN a12 y ON e.v = y.node GROUP BY 1
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(c AS BIGINT) AS core_degree
        FROM df
    """,
    # CUSUM change point: window prefix sums + QUALIFY argmax
    "changepoint_users_events": """
        WITH c AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100.0) AS BIGINT)
                     AS cents
          FROM events
        ),
        s AS (
          SELECT user_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS i,
                 SUM(cents) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cs,
                 COUNT(*) OVER (PARTITION BY user_id) AS n,
                 SUM(cents) OVER (PARTITION BY user_id) AS t
          FROM c
        ),
        st AS (
          SELECT user_id, n, i, ABS(n * cs - i * t) AS stat
          FROM s WHERE i < n AND n >= 8
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(n AS BIGINT) AS n,
               CAST(i AS BIGINT) AS split_i,
               CAST(stat AS BIGINT) AS stat
        FROM st
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY stat DESC, i ASC) = 1
    """,
}

_LAZY: dict[str, object] = {}


def __getattr__(name: str):
    """KMEANS_SQL / IVF_SQL / ORACLE_SQL build on FIRST ACCESS: their
    builders inline kmeans init ids read from the gate corpus, and an
    eager build would make every corpus-independent constant in this
    module unimportable in environments without /root/testdata."""
    if name not in ("KMEANS_SQL", "IVF_SQL", "ORACLE_SQL"):
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    v = _LAZY.get(name)
    if v is None:
        if name == "KMEANS_SQL":
            v = _kmeans_sql()
        elif name == "IVF_SQL":
            v = _ivf_sql()
        else:
            v = dict(_ORACLE_SQL_STATIC)
            v["kmeans_embeddings"] = __getattr__("KMEANS_SQL")
            v["ivf_topk_embeddings"] = __getattr__("IVF_SQL")
            v["semdedup_embeddings"] = _semdedup_sql()
            v["ann_recall_embeddings"] = _ann_recall_sql()
        _LAZY[name] = v
    return v
