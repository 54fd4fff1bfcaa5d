import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from geodata_ray.stages.lm import (
    F_BITS,
    lm_surprisal,
    qlog2_fixed,
    surprisal_bits,
    train_bigram_counts,
)


def test_qlog2_accuracy_and_edge_values():
    c = np.array(
        [1, 2, 3, 10, 1000, 123456789, 2**52 + 12345, 2**63 + 7],
        dtype=np.uint64,
    )
    q = qlog2_fixed(c)
    for ci, qi in zip(c.tolist(), q.tolist()):
        assert abs(qi / (1 << F_BITS) - math.log2(ci)) < 2**-13
    with pytest.raises(ValueError):
        qlog2_fixed(np.array([0], dtype=np.uint64))


def test_qlog2_matches_duckdb_recursive_cte():
    """The numpy loop and the oracle's recursive CTE are the SAME
    defined algorithm — verify bit-equality on awkward values (powers
    of two, power±1, primes)."""
    import duckdb

    vals = [1, 2, 3, 5, 7, 1023, 1024, 1025, 999983, 2**31, 2**31 - 1]
    sql = """
WITH RECURSIVE it AS (
  SELECT c, CAST(length(bin(c)) - 1 AS BIGINT) AS msb,
         CAST((CAST(c AS HUGEINT) * 1073741824)
              // (CAST(CAST(1 AS BIGINT) << CAST(length(bin(c)) - 1 AS INT)
                       AS HUGEINT)) AS HUGEINT) AS m,
         CAST(0 AS BIGINT) AS frac, 0 AS k
  FROM (SELECT unnest(?) AS c)
  UNION ALL
  SELECT c, msb,
         CASE WHEN (m * m) // 1073741824 >= 2147483648
              THEN ((m * m) // 1073741824) // 2
              ELSE (m * m) // 1073741824 END,
         frac * 2 + CASE WHEN (m * m) // 1073741824 >= 2147483648
                         THEN 1 ELSE 0 END,
         k + 1
  FROM it WHERE k < 16
)
SELECT c, msb * 65536 + frac AS q FROM it WHERE k = 16 ORDER BY c
"""
    got = dict(duckdb.connect().execute(sql, [vals]).fetchall())
    exp = qlog2_fixed(np.array(sorted(vals), dtype=np.uint64))
    assert [got[v] for v in sorted(vals)] == exp.tolist()


@pytest.mark.usefixtures("ray_session")
def test_lm_surprisal_matches_bruteforce():
    import ray.data as rd

    rng = np.random.default_rng(11)
    docs = [
        "".join(
            chr(rng.integers(97, 110))
            for _ in range(int(rng.integers(0, 40)))
        )
        for _ in range(150)
    ]
    docs[3] = ""
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    out = (
        lm_surprisal(rd.from_arrow(t).repartition(6))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    cnt = Counter()
    for s in docs:
        b = s.encode()
        for j in range(len(b) - 1):
            cnt[b[j] * 256 + b[j + 1]] += 1
    n_total = sum(cnt.values())

    def q1(x):
        return int(qlog2_fixed(np.array([x], dtype=np.uint64))[0])

    qn = q1(n_total)
    exp = []
    for i, s in enumerate(docs):
        b = s.encode()
        tot = sum(
            qn - q1(cnt[b[j] * 256 + b[j + 1]]) for j in range(len(b) - 1)
        )
        exp.append([i, max(len(b) - 1, 0), tot])
    got = out[["doc_id", "n_pairs", "qbits_total"]].values.tolist()
    assert got == exp

    # float view: docs of rare chars score above docs of common chars
    bits = surprisal_bits(out["qbits_total"], out["n_pairs"])
    assert bits[out["n_pairs"] > 0].min() > 0


@pytest.mark.usefixtures("ray_session")
def test_lm_null_text_and_count_table_bound():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abab", None, "x"]),
        }
    )
    ds = rd.from_arrow(t)
    counts = train_bigram_counts(ds)
    # "abab" -> ab, ba, ab; "x" -> none; null -> none
    assert sorted(
        zip(
            counts["pair_code"].to_pylist(),
            counts["c"].to_pylist(),
        )
    ) == [(ord("a") * 256 + ord("b"), 2), (ord("b") * 256 + ord("a"), 1)]
    out = (
        lm_surprisal(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["n_pairs"].tolist() == [3, 0, 0]
    assert out["qbits_total"].tolist()[1:] == [0, 0]
