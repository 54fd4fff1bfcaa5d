"""Window-contract guard (VERDICT r4, Next-round #3).

The driver's correctness gate runs the FIRST 50 entries of
``queries()``; rounds 3-5 rotate that window deliberately so every
registered query eventually earns an external driver row.  A silent
re-order (an insert in the wrong place, an alphabetizing editor, a
merge) would displace planned debuts without failing any test — this
tool pins ``list(queries())[:50]`` to the rotation recorded in
COVERAGE.md and fails loudly on any unplanned change.

Run standalone (``python tools/check_window.py``) or via the local
gate (tools/check_correctness.py imports and calls ``check()``).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The planned r5 window — 25 fifth-wave + 25 late-r4 debuts (with
# fuzzy_match_parts / skyline_orders swapped in for the two HLL/distinct
# variants whose families already hold driver rows).  Keep this list in
# lockstep with the "Round 5 window" section of COVERAGE.md.
R5_WINDOW = [
    "outlier_events_zscore",
    "rrf_fusion_docs",
    "setsim_join_docs",
    "semdedup_embeddings",
    "zonemap_pruned_scan_events",
    "bpe_pair_counts_docs",
    "entity_resolution_customers",
    "dq_suite_events",
    "scd2_intervals_users",
    "geohash_events",
    "trailing_window_count_events",
    "resize_checksum_images",
    "audio_energy_frames",
    "cube_daily_type_events",
    "scene_deltas_video",
    "vocab_coverage_docs",
    "crawl_frontier_order",
    "langid_margin_docs",
    "bot_signature_users",
    "url_templates_docs",
    "time_travel_events",
    "schema_evolution_read_events",
    "merge_upsert_events",
    "weighted_discount_lineitem",
    "daily_delta_events",
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
    "zonal_stats_events",
    "kring_smooth_raster",
    "trajectory_stats_events",
    "bloom_join_lineitem",
    "grouped_quantiles_events",
    "image_ahash_dups",
    "triangle_counts_hosts",
    "corpus_stats_docs",
    "windowed_dedup_events",
    "knn_classify_embeddings",
    "funnel_users_events",
    "bm25_retrieval_docs",
    "curriculum_pack_docs",
    "fuzzy_match_parts",
    "skyline_orders",
]


def registry_names() -> list[str]:
    """Registry key order, parsed from source (no ray import needed)."""
    src = (REPO / "geodata_ray" / "pipelines" / "queries.py").read_text()
    body = re.search(r"RAY_QUERIES = \{(.*?)\n\}", src, re.S).group(1)
    return re.findall(r'^\s+"([a-z0-9_]+)":', body, re.M)


def check() -> None:
    names = registry_names()
    window = names[:50]
    if window != R5_WINDOW:
        extra = [n for n in window if n not in R5_WINDOW]
        missing = [n for n in R5_WINDOW if n not in window]
        raise SystemExit(
            "check_window: queries()[:50] diverges from the COVERAGE.md "
            f"rotation plan.\n  unplanned in window: {extra}\n"
            f"  displaced from window: {missing}\n"
            "If the change is intentional, update tools/check_window.py "
            "AND record the rotation in COVERAGE.md."
        )
    if len(names) != len(set(names)):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise SystemExit(f"check_window: duplicate registry keys {dupes}")


if __name__ == "__main__":
    check()
    print(f"check_window: OK — window matches the r5 plan "
          f"({len(registry_names())} queries registered)")
