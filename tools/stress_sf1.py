"""One-order-of-magnitude stress point (VERDICT r2 item 7).

Runs the flagship at sf1 scale (60M pages, 10x the bench corpus) plus
sf1-amplified versions of the most expensive gate queries, and prints
ONE JSON line with wall seconds per pipeline.  Inputs are the driver
sf0.1 tables amplified 10x by deterministic id-offset replication —
same value distributions, 10x the rows — because no sf1 driver tables
exist in this sandbox.

The point is EVIDENCE, not a benchmark: no OOM, no single-block stage,
spill-tolerant streaming at 10x the gate scale.  Results land in
BASELINE.md "Measured (sf1)".

Usage: python tools/stress_sf1.py  (env RAY_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMP = 10  # sf0.1 -> sf1


def amplify(ds, factor: int, offsets: dict[str, int]):
    """factor copies of every batch with id columns offset per copy —
    deterministic, preserves all value distributions, multiplies group
    cardinality by ``factor``."""

    def f(batch: pa.Table) -> pa.Table:
        copies = []
        for i in range(factor):
            t = batch
            for col, off in offsets.items():
                arr = pc.add(batch[col], i * off)
                t = t.set_column(t.schema.get_field_index(col), col, arr)
            copies.append(t)
        return pa.concat_tables(copies)

    return ds.map_batches(f, batch_format="pyarrow")


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    import bench
    from geodata_ray.pipelines.flagship import enrich_pages, tile_counts
    from geodata_ray.sources.synth import polygons_table
    from geodata_ray.stages.dedup import (
        exact_dedup_normalized,
        minhash_lsh_pairs,
    )
    from geodata_ray.stages.relational import grouped_aggregate, native_join
    from geodata_ray.stages.spatial_join import spatial_join
    from geodata_ray.stages.windows import tumbling_counts

    walls: dict[str, float] = {}
    rows: dict[str, int] = {}
    only = set(sys.argv[1:])  # case-name filter: run just these

    def timed(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        n = fn()
        walls[name] = round(time.perf_counter() - t0, 2)
        rows[name] = int(n)
        print(f"[stress] {name}: {walls[name]}s ({n} rows)", file=sys.stderr)

    # --- flagship at 60M pages (cache generation untimed) ---
    if not only or "flagship_60m_pages" in only:
        pages_path = bench._pages_cache(60_000_000)
        rd.read_parquet(pages_path).count()  # untimed page-cache warm

        def flagship60m():
            pages = rd.read_parquet(pages_path)
            enriched = enrich_pages(pages)
            joined = spatial_join(enriched, polygons_table(200),
                                  mode="inner")
            return len(tile_counts(joined, res=7).to_pandas())

        timed("flagship_60m_pages", flagship60m)

    # --- q1-style grouped aggregate over 6M lineitem rows ---
    def q1_10x():
        ds = amplify(
            rd.read_parquet(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_returnflag", "l_linestatus", "l_quantity",
                         "l_extendedprice", "l_discount", "l_orderkey"],
            ),
            AMP,
            {"l_orderkey": 10_000_000},
        )
        out = grouped_aggregate(
            ds,
            ["l_returnflag", "l_linestatus"],
            [
                ("l_quantity", "sum", "sum_qty"),
                ("l_extendedprice", "sum", "sum_base"),
                ("l_quantity", "count", "n"),
            ],
        )
        return len(out.to_pandas())

    timed("q1_lineitem_6m", q1_10x)

    # --- near-dup over 50k docs, FORCED scale paths (distributed
    # collision filter + shuffle verify) with 10x duplicate density:
    # every doc has 10 exact copies, the worst case for the collision
    # filter's colliding-bucket volume ---
    def near_dup_50k():
        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )
        pairs = minhash_lsh_pairs(
            docs, k=3, num_hashes=64, bands=16, threshold=0.8,
            collision_filter="distributed", verify_mode="shuffle",
        )
        return pairs.count()

    timed("near_dup_50k_docs_scalepaths", near_dup_50k)

    # --- exact dedup over 500k docs (50k distinct texts x 10) ---
    def dedup_500k():
        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP * 10,
            {"doc_id": 10_000_000},
        )
        return exact_dedup_normalized(docs).count()

    timed("exact_dedup_500k_docs", dedup_500k)

    # --- hourly windows over 1M events ---
    def hourly_1m():
        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["event_id", "user_id", "ts"],
            ),
            AMP,
            {"event_id": 100_000_000},
        )
        return tumbling_counts(ev, key_col="user_id", ts_col="ts").count()

    timed("hourly_windows_1m_events", hourly_1m)

    # --- q3-style native hash join: 1.5M orders x 6M lineitem ---
    def q3_join_10x():
        orders = amplify(
            rd.read_parquet(
                f"{SF_DIR}/orders.parquet",
                columns=["o_orderkey", "o_custkey"],
            ),
            AMP,
            {"o_orderkey": 10_000_000},
        )
        li = amplify(
            rd.read_parquet(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice"],
            ),
            AMP,
            {"l_orderkey": 10_000_000},
        )
        j = native_join(
            li, orders, on="l_orderkey", right_on="o_orderkey",
            num_partitions=ncpu,
        )
        agg = grouped_aggregate(
            j, ["o_custkey"], [("l_extendedprice", "sum", "rev")],
            coalesce=0,
        )
        return agg.count()

    timed("q3_native_join_6m_x_1m5", q3_join_10x)

    # --- heavy hitters over 60M rows with a host-like zipf key:
    # ~1M distinct tail keys + 10 hot keys holding 20% of rows.  The
    # Misra-Gries summary is m = 2n/min_count = 120 rows/batch; the
    # candidate recount semi-joins the full 60M rows (VERDICT r3 #6) ---
    def heavy_hitters_60m():
        from geodata_ray.sources.synth import splitmix64
        from geodata_ray.stages.skew import heavy_hitters

        def keys(batch: pa.Table) -> pa.Table:
            i = batch["id"].to_numpy().astype(np.uint64)
            h = splitmix64(i)
            hot = (i % np.uint64(5)) == 0
            k = np.where(
                hot, h % np.uint64(10), h % np.uint64(1_000_000) + 10
            ).astype(np.int64)
            return pa.table({"host_key": pa.array(k)})

        ds = rd.range(60_000_000).map_batches(keys, batch_format="pyarrow")
        out = heavy_hitters(ds, "host_key", min_count=1_000_000)
        return out.count()

    timed("heavy_hitters_60m_zipf_keys", heavy_hitters_60m)

    # --- boilerplate removal over 50k docs (10x the documents table)
    # with a planted banner line in EVERY doc: line-DF two-phase count,
    # pigeonhole-bounded hot set, vectorized rejoin (VERDICT r3 #6) ---
    def boilerplate_500k():
        from geodata_ray.stages.textstats import remove_boilerplate_lines

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )

        def plant(batch: pa.Table) -> pa.Table:
            sid = pc.cast(batch["doc_id"], pa.string())
            t = pc.binary_join_element_wise(
                batch["text"],
                "Subscribe to our newsletter today!",
                pc.binary_join_element_wise("Unique tail ", sid, ""),
                "\n",
            )
            return pa.table({"doc_id": batch["doc_id"], "text": t})

        clean = remove_boilerplate_lines(
            docs.map_batches(plant, batch_format="pyarrow"),
            min_docs=10_000,
        )
        return clean.count()

    timed("boilerplate_removal_50k_docs", boilerplate_500k)

    # --- PageRank on a 100k-node / ~1.5M-edge graph (1000x the gate
    # graph's nodes): broadcast rank path, materialized edges, 5
    # iterations (round 4) ---
    def pagerank_100k_nodes():
        from geodata_ray.stages.graphcc import (
            distinct_edges_packed,
            pagerank,
        )

        def edges(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy()
            u = ids % 100_000
            us, vs = [], []
            for j in (1, 2, 3):
                us.append(u)
                vs.append((u + 1 + (ids * j) % 99_999) % 100_000)
            return pa.table(
                {"u": pa.array(np.concatenate(us)),
                 "v": pa.array(np.concatenate(vs))}
            )

        e = distinct_edges_packed(
            rd.range(500_000).map_batches(edges, batch_format="pyarrow")
        )
        return pagerank(e, iters=5).count()

    timed("pagerank_100k_nodes_5it", pagerank_100k_nodes)

    # --- full curation pipeline over 50k docs (10x) (round 4): the
    # SAME chain the gate query runs (shared curation_chain), host
    # modulus widened to 9973 for realistic per-key-head cardinality ---
    def curation_50k():
        from geodata_ray.pipelines.queries import curation_chain

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )
        return curation_chain(docs, host_mod=9973).count()

    timed("curation_pipeline_50k_docs", curation_50k)

    # --- content-defined chunking over 50k docs (10x) (round 4) ---
    def cdc_50k():
        from geodata_ray.stages.dedup import cdc_chunks

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )
        return cdc_chunks(docs).count()

    timed("cdc_chunks_50k_docs", cdc_50k)

    # --- hashed classifier scoring over 50k docs (10x) (round 4) ---
    def classifier_50k():
        from geodata_ray.stages.textstats import classifier_score_batch

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )
        return docs.map_batches(
            classifier_score_batch, batch_format="pyarrow"
        ).count()

    timed("classifier_score_50k_docs", classifier_50k)

    # --- inverted index over 50k docs (10x; df scales with copies) ---
    def invindex_50k():
        from geodata_ray.stages.textstats import inverted_index

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            AMP,
            {"doc_id": 10_000_000},
        )
        return inverted_index(docs, min_df=30).count()

    timed("inverted_index_50k_docs", invindex_50k)

    # --- trajectory stats over 10M events (10x) (round 4) ---
    def trajectory_10m():
        from geodata_ray.stages.windows import trajectory_stats

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["event_id", "ts", "user_id"],
            ),
            AMP,
            {"event_id": 100_000_000, "user_id": 1_000_000},
        )

        def grid(batch: pa.Table) -> pa.Table:
            from geodata_ray.sources.synth import GEO_A as a
            from geodata_ray.sources.synth import GEO_B as b
            from geodata_ray.sources.synth import GEO_M as m

            ids = batch["event_id"].to_numpy()
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "ts": batch["ts"],
                    "event_id": batch["event_id"],
                    "gx": pa.array((ids * a) % m * 720 // m),
                    "gy": pa.array((ids * b) % m * 360 // m),
                }
            )

        pts = ev.map_batches(grid, batch_format="pyarrow")
        return trajectory_stats(pts).count()

    timed("trajectory_stats_10m_events", trajectory_10m)

    # --- conversion funnel over 10M events (10x) (round 4) ---
    def funnel_10m():
        from geodata_ray.stages.windows import funnel

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["ts", "user_id", "event_type"],
            ),
            AMP,
            {"user_id": 1_000_000},
        )

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "ts_us": pc.cast(batch["ts"], pa.int64()),
                    "event_type": batch["event_type"],
                }
            )

        return funnel(
            ev.map_batches(prep, batch_format="pyarrow"),
            stages=("view", "click", "purchase"),
        ).count()

    timed("funnel_10m_events", funnel_10m)

    # --- BM25 retrieval over 50k docs (10x) (round 4) ---
    def bm25_50k():
        os.environ.setdefault("GRAFT_BM25_DIR", SF_DIR)
        from geodata_ray.pipelines.queries import bm25_retrieval_docs

        # amplification happens inside the corpus: run the query at
        # sf0.1 directly (its token stream is the cost driver)
        return bm25_retrieval_docs(SF_DIR).count()

    timed("bm25_retrieval_50k_docs", bm25_50k)

    # --- Z-order rank over 10M events (100x): global sort + the
    # distributed prefix-sum scan (round 4, fourth wave) ---
    def zorder_10m():
        from geodata_ray.cellmath.qcell import morton_interleave2
        from geodata_ray.pipelines.queries import (
            _derive_lat_np,
            _derive_lon_np,
        )
        from geodata_ray.stages.packing import global_prefix_sum

        ev = amplify(
            rd.read_parquet(f"{SF_DIR}/events.parquet",
                            columns=["event_id"]),
            AMP * 10,
            {"event_id": 10_000_000},
        )

        def prep(batch: pa.Table) -> pa.Table:
            ids = batch["event_id"].to_numpy()
            qy = np.floor(
                (_derive_lat_np(ids) + 90.0) / 180.0 * 32768.0
            ).astype(np.int64)
            qx = np.floor(
                (_derive_lon_np(ids) + 180.0) / 360.0 * 32768.0
            ).astype(np.int64)
            zkey = morton_interleave2(qx, qy, 15)
            return pa.table(
                {
                    "event_id": batch["event_id"],
                    "zord": pa.array(zkey * 4294967296 + ids),
                    "_one": pa.array(np.ones(len(ids), np.int64)),
                }
            )

        return global_prefix_sum(
            ev.map_batches(prep, batch_format="pyarrow"),
            order_col="zord", value_col="_one", out_col="zpos",
        ).count()

    timed("zorder_rank_10m_events", zorder_10m)

    # --- fuzzy edit-1 join over 200k DISTINCT strings + mutations
    # (round 4, fourth wave).  Distinct sides keep candidates linear —
    # the operator's documented contract (exact-dedup first) ---
    def fuzzy_200k():
        from geodata_ray.stages.dedup import fuzzy_edit1_pairs

        n = 200_000

        def mk(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy()
            s = ((ids * 2654435761) % (2**32)).astype("U10")
            return pa.table(
                {"id": batch["id"], "name": pa.array(s.tolist())}
            )

        def mk_dirty(batch: pa.Table) -> pa.Table:
            t = mk(batch)
            names = t["name"].to_pylist()
            ids = t["id"].to_numpy()
            out = []
            for i, x in zip(ids.tolist(), names):
                k = i % len(x)
                out.append(x[:k] + x[k + 1:])
            return pa.table(
                {
                    "id": pa.array(ids + 10_000_000, pa.int64()),
                    "name": pa.array(out, pa.string()),
                }
            )

        left = rd.range(n).map_batches(
            lambda b: mk(b.rename_columns(["id"])), batch_format="pyarrow"
        )
        right = rd.range(n).map_batches(
            lambda b: mk_dirty(b.rename_columns(["id"])),
            batch_format="pyarrow",
        )
        return fuzzy_edit1_pairs(
            left, right, id_col="id", str_col="name", num_partitions=16
        ).count()

    timed("fuzzy_edit1_200k_strings", fuzzy_200k)

    # --- SemDeDup over 500k vectors with the k-knob SCALED (VERDICT r4
    # #6): k = n/4000 = 125 so each cluster's pairwise prune stays
    # worker-sized — the gate query's k=8 is corpus-sized the same way
    # (2k vectors / 8 = 250 per cluster).  10% planted exact dups
    # (id%10==0 copies id-1's vector) must all be pruned ---
    def semdedup_500k():
        from geodata_ray.sources.synth import splitmix64
        from geodata_ray.stages.kmeans import semdedup_keep

        n, dim = 500_000, 32
        k = n // 4000  # the SemDeDup scale knob: n/k per-worker-sized

        # k unit-ish cluster directions (random splitmix directions:
        # pairwise cosine ~0 +- 0.2, far from tau) + per-vector noise
        # 0.2 so same-cluster NON-dups sit at cosine ~0.9 < tau while
        # planted exact dups sit at exactly 1.0
        jc = np.arange(dim, dtype=np.uint64)
        hc = splitmix64(
            (np.arange(k, dtype=np.uint64)[:, None] * np.uint64(dim))
            + jc[None, :]
        )
        centers = (hc.astype(np.float64) / 2.0**64 - 0.5).reshape(k, dim)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)

        def vecs(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy()
            base = np.where(ids % 10 == 0, np.maximum(ids - 1, 0), ids)
            j = np.arange(dim, dtype=np.uint64)
            h = splitmix64(
                (base[:, None].astype(np.uint64) * np.uint64(dim))
                + j[None, :]
                + np.uint64(0x9E3779B97F4A7C15)
            )
            noise = (h.astype(np.float64) / 2.0**64 - 0.5).reshape(
                -1, dim
            ) * 0.2
            c = (base % k).astype(np.int64)
            flat = (centers[c] + noise).astype(np.float32).ravel()
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(flat, pa.float32()), dim
                    ).cast(pa.list_(pa.float32())),
                }
            )

        # materialize: Lloyd makes one pass per iteration, and a lazy
        # input would re-run the generator kernel on every pass
        ds = rd.range(n).map_batches(
            lambda b: vecs(b.rename_columns(["id"])),
            batch_format="pyarrow",
        ).materialize()
        kept = semdedup_keep(ds, k=k, iters=4, tau=0.99)
        nk = kept.count()
        # every planted dup must be pruned (id%10==0, id>0 copies id-1)
        assert nk <= n - (n // 10 - 1), nk
        return nk

    timed("semdedup_500k_vectors_k125", semdedup_500k)

    # --- PMI collocations over 50k docs (10x token stream) ---
    def pmi_50k():
        from geodata_ray.stages.textstats import pmi_top_bigrams

        docs = amplify(
            rd.read_parquet(f"{SF_DIR}/documents.parquet",
                            columns=["doc_id", "text"]),
            AMP,
            {"doc_id": 1_000_000},
        )
        return pmi_top_bigrams(docs, k=20, min_count=50).count()

    timed("pmi_bigrams_50k_docs", pmi_50k)

    # --- integer EWMA over 10M events (100x users; wavefront depth
    # stays the per-user event count) ---
    def ewma_10m():
        from geodata_ray.stages.windows import ewma_halving

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["user_id", "ts", "event_id", "value"],
            ),
            AMP * 10,
            {"user_id": 1_000_000, "event_id": 10_000_000},
        )

        def prep(batch: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(
                    pc.cast(batch["value"], pa.float64()), 100.0)),
                pa.int64(),
            )
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "ts": batch["ts"],
                    "event_id": batch["event_id"],
                    "cents": cents,
                }
            )

        return ewma_halving(
            ev.map_batches(prep, batch_format="pyarrow"),
            num_buckets=64,
        ).count()

    timed("ewma_10m_events", ewma_10m)

    # --- fifth wave: entity resolution at 1.5M records ---
    def entity_1m5():
        from geodata_ray.stages.graphcc import resolve_entities

        cust = amplify(
            rd.read_parquet(
                f"{SF_DIR}/customer.parquet", columns=["c_custkey"]
            ),
            100,
            {"c_custkey": 1_000_000},
        )

        def keys(batch: pa.Table) -> pa.Table:
            k = pc.cast(batch["c_custkey"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            em = k // 17
            ph = k // 23
            return pa.table(
                {
                    "record_id": pa.array(k),
                    "k_email": pa.array(em, pa.int64(),
                                        mask=(k % 17 > 1)),
                    "k_phone": pa.array(ph, pa.int64(),
                                        mask=(k % 23 > 1)),
                }
            )

        return resolve_entities(
            cust.map_batches(keys, batch_format="pyarrow"),
            id_col="record_id", key_cols=["k_email", "k_phone"],
        ).count()

    timed("entity_resolution_1m5", entity_1m5)

    # --- fifth wave: exact set-similarity join, 40k docs w/ planted dups ---
    def setsim_40k():
        from geodata_ray.stages.dedup import setsim_join_pairs

        docs = amplify(
            rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ),
            4,
            {"doc_id": 1_000_000},
        )

        def plant(batch: pa.Table) -> pa.Table:
            ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            mut = pa.table(
                {
                    "doc_id": pa.array(ids + 50_000_000),
                    "text": pc.binary_join_element_wise(
                        batch["text"], " zz0 zz1 zz2", ""
                    ),
                }
            )
            return pa.concat_tables(
                [batch.select(["doc_id", "text"]), mut]
            )

        return setsim_join_pairs(
            docs.map_batches(plant, batch_format="pyarrow"),
            threshold_num=7, threshold_den=10,
        ).count()

    timed("setsim_join_40k_docs", setsim_40k)

    # --- fifth wave: per-row trailing window over 10M events ---
    def trailing_10m():
        from geodata_ray.stages.windows import trailing_window_counts

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["user_id", "event_id", "ts"],
            ),
            AMP * 10,
            {"user_id": 1_000_000, "event_id": 10_000_000},
        )
        return trailing_window_counts(
            ev, key_col="user_id", ts_col="ts", tie_col="event_id",
            window_us=3_600_000_000, num_buckets=64,
        ).count()

    timed("trailing_window_10m", trailing_10m)

    # --- round 5: winnowing fingerprints + MOSS match join over 50k
    # docs.  Amplification PERTURBS each copy's text head ("v<i> "
    # prefix) instead of replicating it byte-identical: MOSS runs
    # AFTER exact dedup in any real pipeline, so the realistic 10x is
    # more UNIQUE documents, not replicas.  (Replica amplification was
    # measured too: every fingerprint's df multiplies by the copy
    # count, the gate's max_df=20 cut drops everything -> 0 pairs;
    # with max_df raised to 200 the candidate volume is verify-bound
    # at 252 s / 89,715 pairs, no OOM — the documented worst-case
    # dup-density wall, same shape as setsim's.)  NOTE the varied-
    # text run yields 0 pairs at the gate knobs: the synthetic corpus
    # draws from a ~20-word vocabulary, so at 50k docs EVERY 8-gram
    # hash exceeds max_df=20 and the stopword cut (correctly) flags
    # the whole fingerprint space as boilerplate — real web text has
    # orders more k-gram diversity.  The row is therefore a pure
    # THROUGHPUT wall (fingerprint + dedup + bucketed expansion over
    # 50k docs). ---
    def winnow_pairs_50k():
        from geodata_ray.stages.textstats import (
            winnowing_fingerprints,
            winnowing_pair_candidates,
        )

        def amp_vary(batch: pa.Table) -> pa.Table:
            copies = []
            for i in range(AMP):
                pre = pa.array(
                    [f"v{i} "] * batch.num_rows, pa.string()
                )
                t = batch.set_column(
                    batch.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.add(batch["doc_id"], i * 10_000_000),
                )
                t = t.set_column(
                    t.schema.get_field_index("text"),
                    "text",
                    pc.binary_join_element_wise(pre, batch["text"], ""),
                )
                copies.append(t)
            return pa.concat_tables(copies)

        docs = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(amp_vary, batch_format="pyarrow")
        fps = docs.map_batches(
            winnowing_fingerprints, batch_format="pyarrow"
        )
        return winnowing_pair_candidates(
            fps, min_shared=8, max_df=20
        ).count()

    timed("winnowing_pairs_50k", winnow_pairs_50k)

    # --- round 5: k-core on a 100k-node graph (1000x the gate) ---
    def k_core_100k():
        from geodata_ray.stages.graphcc import k_core

        n_nodes = 100_000

        def edges(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy()
            u = ids % n_nodes
            us, vs = [], []
            for j in (1, 2, 3):
                us.append(u)
                vs.append((u + 1 + (ids * j) % (n_nodes - 1)) % n_nodes)
            return pa.table(
                {"u": pa.array(np.concatenate(us)),
                 "v": pa.array(np.concatenate(vs))}
            )

        e = rd.range(500_000).map_batches(
            lambda b: edges(b.rename_columns(["id"])),
            batch_format="pyarrow",
        )
        return k_core(e, k=12, max_rounds=12).count()

    timed("k_core_100k", k_core_100k)

    # --- round 5: cell compaction from res 7 over 10M derived points
    # (dense res-7 occupancy makes multi-level promotion real) ---
    def compact_10m():
        from geodata_ray.cellmath import qcell
        from geodata_ray.pipelines.queries import (
            _derive_lat_np,
            _derive_lon_np,
        )
        from geodata_ray.stages.raster import compact_cells

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet", columns=["event_id"]
            ),
            AMP * 10,
            {"event_id": 10_000_000},
        )

        def tiles(batch: pa.Table) -> pa.Table:
            ids = batch["event_id"].to_numpy()
            return pa.table(
                {"cell": pa.array(qcell.latlng_to_cell(
                    _derive_lat_np(ids), _derive_lon_np(ids), 7))}
            )

        return compact_cells(
            ev.map_batches(tiles, batch_format="pyarrow"), min_res=4
        ).count()

    timed("compact_cells_10m", compact_10m)

    # --- round 5: CUSUM change points over 10M events (100x users) ---
    def cusum_10m():
        from geodata_ray.stages.windows import cusum_changepoint

        ev = amplify(
            rd.read_parquet(
                f"{SF_DIR}/events.parquet",
                columns=["user_id", "event_id", "ts", "value"],
            ),
            AMP * 10,
            {"user_id": 1_000_000, "event_id": 10_000_000},
        )

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "ts": batch["ts"].cast(pa.timestamp("us")).cast(
                        pa.int64()
                    ),
                    "event_id": batch["event_id"],
                    "cents": pc.cast(
                        pc.round(pc.multiply(
                            pc.cast(batch["value"], pa.float64()), 100.0
                        )),
                        pa.int64(),
                    ),
                }
            )

        return cusum_changepoint(
            ev.map_batches(prep, batch_format="pyarrow"),
            min_n=8, num_buckets=64,
        ).count()

    timed("cusum_10m", cusum_10m)

    # --- continuation-session additions (waves 17-21) ---

    def _amp_events_path() -> str:
        """100x events (10M rows, 15k users — the suite's 10m-case
        convention) cached once as ONE parquet file (query entry
        points read {dir}/events.parquet) so the wave cases time the
        OPERATOR, not the amplification."""
        import os as _os

        import pyarrow.parquet as pq

        d = "/tmp/graft_stress_events100x"
        path = f"{d}/events.parquet"
        if not _os.path.exists(path):
            _os.makedirs(d, exist_ok=True)
            amped = amplify(
                rd.read_parquet(f"{SF_DIR}/events.parquet"),
                AMP * 10,
                {"event_id": 1_000_000, "user_id": 1_000},
            )
            writer = None
            for b in amped.iter_batches(batch_format="pyarrow",
                                        batch_size=262_144):
                if writer is None:
                    writer = pq.ParquetWriter(path, b.schema)
                writer.write_table(b)
            writer.close()
        return d

    def q7_sf1():
        # two chained hash joins at 60M lineitem x 15M orders
        from geodata_ray.pipelines.queries import _rev_micro_np

        li = amplify(
            rd.read_parquet(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                         "l_discount", "l_shipdate"],
            ),
            AMP, {"l_orderkey": 10_000_000},
        )
        lo = pa.scalar(np.datetime64("1996-01-01", "us"))
        hi = pa.scalar(np.datetime64("1998-01-01", "us"))

        def lprep(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                        pc.less(b["l_shipdate"], hi))
            t = b.filter(m)
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev_micro": pa.array(_rev_micro_np(t)),
            })

        orders = amplify(
            rd.read_parquet(f"{SF_DIR}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"]),
            AMP, {"o_orderkey": 10_000_000},
        )
        oj = orders.materialize()
        j = native_join(
            li.map_batches(lprep, batch_format="pyarrow"),
            oj, on="l_orderkey", right_on="o_orderkey",
            num_partitions=32,
        )
        out = grouped_aggregate(
            j.map_batches(
                lambda b: pa.table({
                    "k": pc.cast(
                        pc.bit_wise_and(b["o_custkey"], 255),
                        pa.int64()),
                    "rev_micro": b["rev_micro"],
                }),
                batch_format="pyarrow",
            ),
            ["k"], [("rev_micro", "sum", "rev")],
        )
        return out.count()

    timed("q7_join_chain_60m", q7_sf1)

    def weighted_median_60m():
        from geodata_ray.stages.packing import global_prefix_sum

        li = amplify(
            rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                            columns=["l_extendedprice", "l_quantity"]),
            AMP, {},
        )

        def prep(b: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(
                pc.cast(b["l_extendedprice"], pa.float64()), 100.0)),
                pa.int64())
            w = pc.cast(pc.round(pc.cast(b["l_quantity"],
                                         pa.float64())), pa.int64())
            return pa.table({"cents": cents, "w": w})

        hist = grouped_aggregate(
            li.map_batches(prep, batch_format="pyarrow"),
            ["cents"], [("w", "sum", "w")],
        ).materialize()
        total = int(hist.sum("w"))
        ranked = global_prefix_sum(hist, order_col="cents",
                                   value_col="w", out_col="cw")

        def pick(b: pa.Table) -> pa.Table:
            cw = b["cw"].to_numpy(zero_copy_only=False)
            w = b["w"].to_numpy(zero_copy_only=False)
            m = (2 * cw < total) & (2 * (cw + w) >= total)
            return b.filter(pa.array(m))

        return ranked.map_batches(pick,
                                  batch_format="pyarrow").count()

    timed("weighted_median_60m", weighted_median_60m)

    def hilbert_10m():
        from geodata_ray.pipelines.queries import hilbert_xy2d

        ev = rd.read_parquet(f"{_amp_events_path()}/events.parquet",
                             columns=["event_id"])

        def prep(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_numpy()
            qx = (ids * 2654435761 % 4294967296) % 32768
            qy = (ids * 2246822519 % 4294967296) % 32768
            return pa.table({
                "event_id": b["event_id"],
                "hkey": pa.array(hilbert_xy2d(
                    qx.astype(np.int64), qy.astype(np.int64), 15)),
            })

        return ev.map_batches(prep, batch_format="pyarrow").count()

    timed("hilbert_10m", hilbert_10m)

    def ntile_10m():
        from geodata_ray.stages.packing import global_prefix_sum

        ev = rd.read_parquet(f"{_amp_events_path()}/events.parquet",
                             columns=["user_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(
                pc.cast(b["value"], pa.float64()), 100.0)), pa.int64())
            return pa.table({"user_id": b["user_id"], "cents": cents})

        agg = grouped_aggregate(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"], [("cents", "sum", "cents")],
        ).materialize()

        def okey(b: pa.Table) -> pa.Table:
            c = b["cents"].to_numpy(zero_copy_only=False)
            u = b["user_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": b["user_id"],
                "__ok": pa.array(c * 4294967296 + u),
                "__one": pa.array(np.ones(c.size, np.int64)),
            })

        return global_prefix_sum(
            agg.map_batches(okey, batch_format="pyarrow"),
            order_col="__ok", value_col="__one", out_col="__rank",
        ).count()

    timed("ntile_rank_10m_events", ntile_10m)

    def forward_fill_10m():
        from geodata_ray.pipelines.queries import (
            forward_fill_user_values,
        )

        return forward_fill_user_values(_amp_events_path()).count()

    timed("forward_fill_10m", forward_fill_10m)

    # --- waves 25-29 (second continuation session) ---

    def view_click_pairs_10m():
        from geodata_ray.pipelines.queries import view_click_pairs_events

        return view_click_pairs_events(_amp_events_path()).count()

    timed("view_click_pairs_10m", view_click_pairs_10m)

    def markov_transitions_10m():
        from geodata_ray.pipelines.queries import (
            markov_transitions_events,
        )

        return markov_transitions_events(_amp_events_path()).num_rows

    timed("markov_transitions_10m", markov_transitions_10m)

    def positional_deletes_10m():
        from geodata_ray.pipelines.queries import (
            positional_deletes_events,
        )

        return positional_deletes_events(_amp_events_path()).count()

    timed("positional_deletes_10m", positional_deletes_10m)

    def session_paths_10m():
        from geodata_ray.pipelines.queries import session_paths_events

        return session_paths_events(_amp_events_path()).num_rows

    timed("session_paths_10m", session_paths_10m)

    def conversion_latency_10m():
        from geodata_ray.pipelines.queries import (
            conversion_latency_quantiles_events,
        )

        return conversion_latency_quantiles_events(
            _amp_events_path()).count()

    timed("conversion_latency_10m", conversion_latency_10m)

    def _amp_embeddings_path() -> str:
        """100x embeddings (5M vectors x 64 dims) cached once — the
        Gram-matrix compute-bound stress input."""
        import os as _os

        import pyarrow.parquet as pq

        d = "/tmp/graft_stress_emb100x"
        path = f"{d}/embeddings.parquet"
        if not _os.path.exists(path):
            _os.makedirs(d, exist_ok=True)
            amped = amplify(
                rd.read_parquet(f"{SF_DIR}/embeddings.parquet"),
                AMP * 10,
                {"vec_id": 1_000_000},
            )
            writer = None
            for b in amped.iter_batches(batch_format="pyarrow",
                                        batch_size=65_536):
                if writer is None:
                    writer = pq.ParquetWriter(path, b.schema)
                writer.write_table(b)
            writer.close()
        return d

    def gram_matrix_5m_vecs():
        from geodata_ray.pipelines.queries import gram_matrix_embeddings

        return gram_matrix_embeddings(_amp_embeddings_path()).count()

    timed("gram_matrix_5m_vecs", gram_matrix_5m_vecs)

    def _amp_parts_path() -> str:
        """100x part table (2M keys) for the subtree-rollup tree."""
        import os as _os

        import pyarrow.parquet as pq

        d = "/tmp/graft_stress_part100x"
        path = f"{d}/part.parquet"
        if not _os.path.exists(path):
            _os.makedirs(d, exist_ok=True)
            amped = amplify(
                rd.read_parquet(f"{SF_DIR}/part.parquet"),
                AMP * 10,
                {"p_partkey": 1_000_000},
            )
            writer = None
            for b in amped.iter_batches(batch_format="pyarrow",
                                        batch_size=262_144):
                if writer is None:
                    writer = pq.ParquetWriter(path, b.schema)
                writer.write_table(b)
            writer.close()
        return d

    def subtree_rollup_2m():
        from geodata_ray.pipelines.queries import subtree_rollup_parts

        return subtree_rollup_parts(_amp_parts_path()).count()

    timed("subtree_rollup_2m", subtree_rollup_2m)

    # --- waves 30-37 (second continuation session) ---

    def sliding_max_10m():
        from geodata_ray.pipelines.queries import sliding_max_user_values

        return sliding_max_user_values(_amp_events_path()).count()

    timed("sliding_max_10m", sliding_max_10m)

    def multitouch_10m():
        from geodata_ray.pipelines.queries import (
            multitouch_attribution_events,
        )

        return multitouch_attribution_events(_amp_events_path()).count()

    timed("multitouch_10m", multitouch_10m)

    def psi_10m():
        from geodata_ray.pipelines.queries import psi_value_drift_events

        return psi_value_drift_events(_amp_events_path()).num_rows

    timed("psi_10m", psi_10m)

    def _amp_customer_path() -> str:
        """100x customers (1.5M rows) for the sorted-neighborhood
        stress (a global sort + junction stitch at scale)."""
        import os as _os

        import pyarrow.parquet as pq

        d = "/tmp/graft_stress_cust100x"
        path = f"{d}/customer.parquet"
        if not _os.path.exists(path):
            _os.makedirs(d, exist_ok=True)
            amped = amplify(
                rd.read_parquet(f"{SF_DIR}/customer.parquet"),
                AMP * 10,
                {"c_custkey": 1_000_000},
            )
            writer = None
            for b in amped.iter_batches(batch_format="pyarrow",
                                        batch_size=262_144):
                if writer is None:
                    writer = pq.ParquetWriter(path, b.schema)
                writer.write_table(b)
            writer.close()
        return d

    def snm_pairs_1m5():
        from geodata_ray.pipelines.queries import snm_pairs_customers

        return snm_pairs_customers(_amp_customer_path()).num_rows

    timed("snm_pairs_1m5", snm_pairs_1m5)

    print(json.dumps({
        "metric": "sf1 stress walls (10x gate scale)",
        "unit": "sec",
        "num_cpus": ncpu,
        "pages": 60_000_000,
        "walls": walls,
        "rows": rows,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
