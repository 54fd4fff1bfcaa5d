"""Forty-first-wave tests: independent pyarrow-footer brute force over
the sf0.001 parquet (per-column storage stats)."""

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_parquet_column_stats_vs_pyarrow():
    from geodata_ray.pipelines.queries import parquet_column_stats_events

    md = pq.ParquetFile(f"{SF_DIR}/events.parquet").metadata
    exp = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            c = rg.column(ci)
            e = exp.setdefault(c.path_in_schema, [0, 0, 0, 0])
            e[0] += 1
            e[1] += c.num_values
            e[2] += c.total_compressed_size
            e[3] += c.total_uncompressed_size
    got = parquet_column_stats_events(SF_DIR).to_pandas().set_index(
        "column_name")
    assert set(got.index) == set(exp)
    for col, (nrg, nv, cb, ub) in exp.items():
        r = got.loc[col]
        assert (int(r.n_row_groups), int(r.n_values)) == (nrg, nv)
        assert (int(r.compressed_bytes),
                int(r.uncompressed_bytes)) == (cb, ub)
        assert int(r.ratio_ppm) == cb * 1_000_000 // ub
    # every column covers every row of the table
    assert (got.n_values == md.num_rows).all()
