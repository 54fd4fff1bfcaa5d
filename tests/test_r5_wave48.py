"""Forty-eighth-wave tests: independent pandas brute force over the
sf0.001 parquet (duplicate-row multiplicity audit)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_duplicate_rows_audit_vs_pandas():
    from geodata_ray.pipelines.queries import duplicate_rows_audit_events

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    ).to_pandas()
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    g = ev.groupby(["user_id", "ts", "event_type", "cents"]).size()
    exp = g.value_counts().sort_index()
    got = (
        duplicate_rows_audit_events(SF_DIR)
        .to_pandas()
        .set_index("k_copies")
        .sort_index()
    )
    assert len(got) == len(exp)
    assert (got.n_groups.to_numpy() == exp.to_numpy()).all()
    # group-size-weighted total equals the row count
    assert int((got.index.to_numpy() * got.n_groups.to_numpy()).sum()) \
        == len(ev)
