"""Benchmark harness: headline tiling pipeline + per-query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "rows_per_sec": ..., "tiles_per_sec": ...}

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default
/root/testdata/sf0.1), GRAFT_BENCH_PAGES (override page count).

``--scaling``: runs the benchmark twice in fresh subprocesses at 8 and
32 CPUs on the same cached input and reports throughputs + scaling
efficiency (the sandbox proxy for the north rule's N vs 4N cluster
sizes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PAGES_PER_DOC = 1200  # sf0.1: 5,000 docs -> 6M synthetic pages


def _pages_cache(n_pages: int, seed: int = 42) -> str:
    """Generate the deterministic bench page corpus once (untimed) and
    reuse it across runs/parallelism levels."""
    path = f"/tmp/graft_bench/pages_{n_pages}"
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        from geodata_ray.sources.synth import pages_dataset

        ds = pages_dataset(n_pages, seed)
        ds.write_parquet(path)
        open(done, "w").write("ok")
    return path


def run_bench(ncpu: int, sf_dir: str) -> dict:
    import ray

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
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    import pyarrow.parquet as pq

    from geodata_ray.pipelines.flagship import enrich_pages, tile_counts
    from geodata_ray.pipelines.queries import RAY_QUERIES
    from geodata_ray.sources.synth import polygons_table
    from geodata_ray.stages.spatial_join import spatial_join

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", n_docs * PAGES_PER_DOC))
    pages_path = _pages_cache(n_pages)

    # warm-up (untimed): full read primes the OS page cache; a small
    # pass through the same pipeline spawns/imports the worker
    # processes so the timed run measures compute + shuffle, not
    # process startup (same treatment at every parallelism level)
    rd.read_parquet(pages_path).count()
    from geodata_ray.sources.synth import pages_dataset

    warm = pages_dataset(2000)
    tile_counts(
        spatial_join(enrich_pages(warm), polygons_table(200), mode="inner"),
        res=7,
    ).to_pandas()

    timings: dict[str, float] = {}

    # --- headline: extract -> geocode -> encode -> PIP join -> tiles
    # best-of-2: sandbox CPU contention adds multi-second noise at high
    # parallelism; the minimum is the honest compute+shuffle time
    headline = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pages = rd.read_parquet(pages_path)
        enriched = enrich_pages(pages)
        joined = spatial_join(enriched, polygons_table(200), mode="inner")
        tiles = tile_counts(joined, res=7)
        tile_df = tiles.to_pandas()
        headline = min(headline, time.perf_counter() - t0)
    timings["flagship_tiling"] = round(headline, 3)

    n_tiles = len(tile_df)
    join_rows = int(tile_df["n_points"].sum())

    # per-stage throughput records (north-rule metric emission)
    from geodata_ray.state.lineage import stage_metrics

    stages = stage_metrics(tiles)

    # --- representative per-query timings over the sf tables
    # (skipped in the --scaling subprocesses: efficiency is measured on
    # the flagship alone, and the extra ~20s/level only adds
    # contention exposure)
    flagship_only = os.environ.get(
        "GRAFT_BENCH_FLAGSHIP_ONLY", ""
    ).lower() not in ("", "0", "false")
    # --scaling subprocesses: flagship + three extra rows (VERDICT r4
    # #7).  MEASURED FINDING (r5, see BASELINE.md "Scaling
    # decomposition"): on ONE box, exchange-bound stages do not
    # CPU-scale — a raw 2.4M-row hash exchange takes the same ~1-2 s
    # at 8 and 32 CPUs (memory-bandwidth + object-store bound), so
    # near_dup_scaled / pagerank_scaled plateau at ~0.2-0.3 "CPU
    # efficiency" REGARDLESS of data size.  A 4x NODE cluster
    # multiplies memory/network bandwidth with the cores, which the
    # single-node proxy cannot express; the rows are kept as honest
    # floor documentation.  winnow_map_scaled is the compute-dominant
    # regime the proxy CAN express (fused zero-shuffle byte kernel
    # over the full 6M-page corpus).
    if flagship_only:
        import numpy as np

        from geodata_ray.stages.dedup import minhash_lsh_pairs
        from geodata_ray.stages.graphcc import (
            distinct_edges_packed,
            pagerank,
        )

        def near_dup_scaled():
            def amp(batch):
                import pyarrow as pa
                import pyarrow.compute as pc

                copies = [
                    batch.set_column(
                        batch.schema.get_field_index("doc_id"),
                        "doc_id",
                        pc.add(batch["doc_id"], i * 10_000_000),
                    )
                    for i in range(10)
                ]
                return pa.concat_tables(copies)

            docs = rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(amp, batch_format="pyarrow")
            return minhash_lsh_pairs(
                docs, k=3, num_hashes=64, bands=16, threshold=0.8
            ).count()

        def pagerank_scaled():
            import pyarrow as pa

            def edges(batch):
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
                rd.range(500_000).map_batches(
                    lambda b: edges(b.rename_columns(["id"])),
                    batch_format="pyarrow",
                )
            )
            return pagerank(e, iters=5).count()

        def winnow_map_scaled():
            # compute-dominant zero-shuffle text kernel over the full
            # 6M-page corpus: winnowing fingerprint COUNT, reduced
            # inside the same UDF so no fingerprint row ever hits the
            # object store (the unfused variant materializes ~197M
            # rows and turns bandwidth-bound)
            import pyarrow as pa

            from geodata_ray.stages.textstats import (
                winnowing_fingerprints,
            )

            def fp_count(t):
                t = t.append_column(
                    "doc_id",
                    pa.array(np.arange(t.num_rows, dtype=np.int64)),
                )
                return pa.table(
                    {"n": pa.array(
                        [winnowing_fingerprints(t).num_rows]
                    )}
                )

            return rd.read_parquet(pages_path, columns=["text"]) \
                .map_batches(fp_count, batch_format="pyarrow").sum("n")

        for name, fn in (
            ("near_dup_scaled", near_dup_scaled),
            ("pagerank_scaled", pagerank_scaled),
            ("winnow_map_scaled", winnow_map_scaled),
        ):
            fn()  # warm (worker spawn + page cache), untimed
            best = float("inf")
            for _ in range(2):  # best-of-2: t32 is contention-sensitive
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
    query_names = () if flagship_only else (
        "q1_pricing_summary",
        "tiles_r7_events",
        "daily_user_value",
        "dedup_documents_exact",
        "customer_nation_revenue",
        "knn_events_gazetteer",
        "near_dup_pairs",
        "session_windows_users",
        "pip_boxes_events",
        "q3_shipping_native",
        "embedding_dups_lsh",
        "top_pages_per_tile",
        "raster_min_area",
        "raster_min_area_km2",
        "tfidf_top_terms_docs",
        "heavy_hitter_users",
        "stratified_sample_events",
        "streaming_dedup_docs",
        "url_canonicalize_docs",
        "boilerplate_removal_docs",
        "redact_pii_docs",
        # round 4
        "near_dup_keep_docs",
        "pack_sequences_docs",
        "global_shuffle_docs",
        "ngram_decontaminate_docs",
        "lm_surprisal_docs",
        "hll_registers_events",
        "paragraph_dedup_docs",
        "length_buckets_docs",
        "source_mixture_docs",
        "url_dedup_best_docs",
        "cms_counts_events",
        "host_quota_docs",
        "bloom_bits_events",
        "blocklist_filter_docs",
        "top_bigrams_docs",
        "jsonl_roundtrip_docs",
        "pagerank_hosts_docs",
        "curation_pipeline_docs",
        "chunk_documents_docs",
        "normalize_text_docs",
        "bloom_probe_events",
        "tfidf_retrieval_docs",
        "perplexity_buckets_docs",
        "cdc_chunks_docs",
        "cdc_dup_spans_docs",
        "pretrain_pipeline_docs",
        "classifier_score_docs",
        "crawl_diff_docs",
        "inverted_index_docs",
        "trajectory_stats_events",
        "bloom_join_lineitem",
        "zonal_stats_events",
        # fifth wave
        "outlier_events_zscore",
        "setsim_join_docs",
        "semdedup_embeddings",
        "entity_resolution_customers",
        "dq_suite_events",
        "scd2_intervals_users",
        "geohash_events",
        "trailing_window_count_events",
        "bpe_pair_counts_docs",
        "cube_daily_type_events",
        "vocab_coverage_docs",
        # sixth wave (round 5)
        "robust_outliers_events",
        "radius_join_events",
        "late_events_watermark",
        "q4_priority_exists",
        "q10_returned_revenue",
        "mutual_links_hosts",
        # seventh wave (round 5)
        "interval_coverage_users",
        "sssp_hosts",
        "seasonal_anomaly_events",
        "weighted_sample_events",
        "activity_bitmap_users",
        "apportion_crawl_budget",
        # eighth wave (round 5)
        "ohlc_candles_events",
        "gapfill_hourly_events",
        "late_shipment_priority",
        "q18_large_orders",
        "q22_idle_customers",
        "winnowing_docs",
        "k_core_hosts",
        "changepoint_users_events",
        # ninth wave (round 5)
        "compact_cells_events",
        "rfm_segments_users",
        "pr_curve_docs",
        "hits_hosts_docs",
        # tenth wave (round 5)
        "winnowing_match_pairs",
        "ab_test_events",
        "source_entropy_docs",
        "open_orders_daily",
        # eleventh wave (round 5)
        "maxsim_retrieval_embeddings",
        "sq8_quantize_embeddings",
        # twelfth wave (round 5)
        "box_cover_cells_nations",
        "k_anonymity_events",
        "kfold_split_docs",
        # thirteenth wave (round 5)
        "reorder_depth_events",
        "ann_recall_embeddings",
        # fourteenth wave (round 5)
        "avg_neighbor_degree_hosts",
        "peak_rate_events",
        "revenue_share_lineitem",
        "vocab_growth_docs",
        # fifteenth wave (round 5)
        "dau_mau_daily_events",
        # sixteenth wave (round 5)
        "activity_gini_users",
        "geo_mean_values_events",
        # seventeenth wave (round 5): TPC-H completion
        "q7_nation_volume",
        "q9_profit_by_nation_year",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q19_or_predicates_revenue",
        "q2_min_cost_supplier",
        "q8_market_share",
        "q11_important_parts",
        "q13_order_count_distribution",
        "q16_supplier_part_counts",
        "q20_qty_semijoin",
        "q21_sole_late_supplier",
        # eighteenth wave (round 5)
        "q6_forecast_revenue",
        "q12_late_lines_priority",
        "near_dup_clusters_docs",
        "association_rules_events",
        "hll_merge_types_events",
        "ntile_value_users",
        # nineteenth wave (round 5)
        "kmv_sketch_events",
        "weighted_median_lineitem",
        "range_partition_plan_events",
        "class_balance_docs",
        "interarrival_median_users",
        "string_agg_daily_types_events",
        # twentieth wave (round 5)
        "hilbert_rank_events",
        "pseudonymize_users_events",
        "selfjoin_size_lineitem",
        "audience_overlap_types_events",
        "zipf_state_docs",
        "grouped_mode_cents_events",
        # twenty-fourth wave (round 5)
        "ks_test_events",
        "mmr_rerank_embeddings",
        "dedup_canonical_docs",
        # forty-ninth wave (round 5)
        "retention_half_life_events",
        # forty-eighth wave (round 5)
        "duplicate_rows_audit_events",
        # forty-seventh wave (round 5)
        "longest_gaps_users_events",
        "markov_conditional_entropy_events",
        # forty-sixth wave (round 5)
        "lorenz_deciles_users_events",
        # forty-fifth wave (round 5)
        "user_breadth_histogram_events",
        "user_type_entropy_events",
        # forty-fourth wave (round 5)
        "fano_factor_types_events",
        # forty-third wave (round 5)
        "hash_uniformity_audit_events",
        # forty-second wave (round 5)
        "bloom_size_plan_events",
        "dedup_savings_docs",
        # forty-first wave (round 5)
        "parquet_column_stats_events",
        # fortieth wave (round 5)
        "negative_sampling_unigram_docs",
        # thirty-ninth wave (round 5)
        "residual_outlier_days_types_events",
        "zipf_slope_docs",
        # thirty-eighth wave (round 5)
        "front_coding_audit_docs",
        # thirty-seventh wave (round 5)
        "decision_stump_events",
        # thirty-sixth wave (round 5)
        "sliding_max_user_values",
        "unpivot_daily_types_events",
        # thirty-fifth wave (round 5)
        "snm_pairs_customers",
        "daily_trend_slope_types_events",
        # thirty-fourth wave (round 5)
        "dim_variance_embeddings",
        "mrr_same_label_embeddings",
        # thirty-third wave (round 5)
        "embedding_drift_labels",
        "crosscorr_daily_events",
        # thirty-second wave (round 5)
        "psi_value_drift_events",
        "histogram_intersection_types_events",
        # thirty-first wave (round 5)
        "user_lifetime_survival_events",
        "multitouch_attribution_events",
        "subtree_share_parts",
        # thirtieth wave (round 5)
        "recency_decay_types_events",
        "trending_types_daily_events",
        "mlm_mask_plan_docs",
        # twenty-ninth wave (round 5)
        "polygon_area_nations",
        "pct_cont_types_events",
        "calibration_bins_docs",
        "kendall_tau_daily_events",
        # twenty-eighth wave (round 5)
        "new_users_daily_events",
        "autocorr_daily_events",
        "edge_support_hosts",
        "clustering_depth_events",
        "triplet_mining_embeddings",
        "conversion_latency_quantiles_events",
        # twenty-seventh wave (round 5)
        "theta_intersection_types_events",
        "l2_norm_audit_embeddings",
        "term_shift_docs",
        "session_paths_events",
        "view_click_pairs_events",
        "gram_matrix_embeddings",
        # twenty-sixth wave (round 5)
        "subtree_rollup_parts",
        "eccentricity_hosts",
        "readability_docs",
        "feature_hash_collisions_docs",
        "cohens_kappa_docs",
        "reservoir_sample_per_type_events",
        # twenty-fifth wave (round 5)
        "clustering_coeff_hosts",
        "benford_audit_events",
        "daily_corr_types_events",
        "markov_transitions_events",
        "pq_assign_embeddings",
        "positional_deletes_events",
        # twenty-third wave (round 5)
        "lang_confusion_docs",
        "label_outliers_embeddings",
        "rle_runs_events",
        "session_duration_quantiles_events",
        # twenty-second wave (round 5)
        "bloom_partition_index_events",
        "rank_normalize_embeddings",
        "fold_leakage_audit_docs",
        "twap_user_values",
        "bounce_rate_daily_events",
        # twenty-first wave (round 5)
        "dbscan_labels_events",
        "phrase_query_docs",
        "merkle_tree_events",
        "label_centroids_embeddings",
        "forward_fill_user_values",
        "load_profile_events",
    )
    for name in query_names:
        t0 = time.perf_counter()
        res = RAY_QUERIES[name](sf_dir)
        res.to_pandas()
        timings[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "flagship tiling pipeline wall time (read->extract->geocode->encode->PIP join->tile agg)",
        "value": timings["flagship_tiling"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "pages": n_pages,
        "join_rows": join_rows,
        "tiles": n_tiles,
        "rows_per_sec": round(n_pages / headline, 1),
        "join_rows_per_sec": round(join_rows / headline, 1),
        "tiles_per_sec": round(n_tiles / headline, 1),
        "stages": stages,
    }


def _subprocess_value(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               GRAFT_BENCH_FLAGSHIP_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        lo = _subprocess_value(8)
        hi = _subprocess_value(32)
        eff = (lo["value"] / hi["value"]) / (32 / 8)
        out = {
            "metric": "scaling efficiency 8->32 cpus (flagship tiling)",
            "sec_8": lo["value"],
            "sec_32": hi["value"],
            "rows_per_sec_8": lo["rows_per_sec"],
            "rows_per_sec_32": hi["rows_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "sf": sf_dir,
        }
        # shuffle-heavy pipelines (VERDICT r4 #7): same two-level
        # protocol, warm-run walls from the subprocesses above, at
        # stress scale (gate scale is floor-dominated — see run_bench)
        for name in ("near_dup_scaled", "pagerank_scaled",
                     "winnow_map_scaled"):
            s8 = lo["queries"].get(name)
            s32 = hi["queries"].get(name)
            if s8 and s32:
                out[f"{name}_sec_8"] = s8
                out[f"{name}_sec_32"] = s32
                out[f"{name}_efficiency"] = round((s8 / s32) / 4.0, 3)
        print(json.dumps(out))
        return
    result = run_bench(ncpu, sf_dir)
    print(json.dumps(result))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
