"""The driver's core invariant: byte-identical outputs at any
parallelism / batch split (BASELINE.json input_hint)."""

import hashlib

import pytest


def _sha(df):
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_enrichment_invariant_to_block_structure():
    from geodata_ray.pipelines.flagship import enrich_pages
    from geodata_ray.sources.synth import pages_table

    import ray.data as rd

    t = pages_table(2000)
    shas = []
    for parts, bs in [(1, 8192), (7, 512), (16, 97)]:
        ds = rd.from_arrow(t).repartition(parts)
        out = (
            enrich_pages(ds, batch_size=bs)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        assert (out.extracted_text == out.text).all()
        shas.append(_sha(out))
    assert len(set(shas)) == 1, shas


@pytest.mark.usefixtures("ray_session")
def test_tile_counts_invariant_to_block_structure():
    from geodata_ray.pipelines.flagship import enrich_pages, tile_counts
    from geodata_ray.sources.synth import pages_table

    import ray.data as rd

    t = pages_table(2000)
    shas = []
    for parts in (1, 5, 13):
        ds = rd.from_arrow(t).repartition(parts)
        out = (
            tile_counts(enrich_pages(ds), res=7)
            .to_pandas()
            .sort_values("h3_r7", ignore_index=True)
        )
        shas.append(_sha(out))
    assert len(set(shas)) == 1, shas
