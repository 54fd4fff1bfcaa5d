"""Zone-map (file-statistics) pruned scans.

Storage-side analogue of geodata's bbox/variable trimming at the
reader (reference: the cutout readers subset variables and coordinate
windows before any compute): a table written as value-partitioned
parquet carries real min/max statistics in every file footer, and a
range predicate can skip whole FILES — before a single byte of data
pages is read — by consulting only the footers.  Ray's own
``read_parquet(filter=...)`` prunes at row-group granularity inside the
files it is given; this layer prunes the file LIST itself, which is
the unit that matters at 100 TB (object-store listing + footer reads
are metadata-plane, data-plane I/O only touches surviving files).

The zone map is built from the parquet footers themselves (never a
side database that can drift from the data), so it is correct for any
writer.  Pruning is conservative: a file survives unless its
[min, max] provably misses the predicate; a residual filter inside
``read`` keeps semantics exact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["zonemap_stats", "pruned_range_read"]


def zonemap_stats(root: str, column: str) -> list[dict]:
    """Per-file (path, min, max, rows) for ``column``, from footers
    only.  Files whose footer lacks statistics get min=max=None and
    are never pruned (conservative)."""
    import pyarrow.parquet as pq

    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, f)
            md = pq.ParquetFile(path).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            lo = hi = None
            ok = column in idx
            for rg in range(md.num_row_groups):
                st = (
                    md.row_group(rg).column(idx[column]).statistics
                    if ok
                    else None
                )
                if st is None or not st.has_min_max:
                    lo = hi = None
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out.append(
                {"path": path, "min": lo, "max": hi, "rows": md.num_rows}
            )
    return out


def pruned_range_read(
    root: str,
    column: str,
    lo,
    hi=None,
    *,
    columns=None,
):
    """Read only the files whose zone map intersects ``[lo, hi]``
    (``hi=None`` = unbounded above), then apply the exact residual
    filter.  Returns ``(dataset, n_files_total, n_files_read)``."""
    import ray.data as rd

    stats = zonemap_stats(root, column)
    if not stats:
        raise FileNotFoundError(f"no parquet files under {root}")
    keep = []
    for s in stats:
        if s["min"] is None:
            keep.append(s["path"])  # no stats -> cannot prune
        elif (hi is None or s["min"] <= hi) and s["max"] >= lo:
            keep.append(s["path"])
    pruned_to_zero = not keep
    if pruned_to_zero:
        # nothing can match; run the residual filter over ONE (smallest)
        # file so the empty result still carries the schema (a bare
        # limit(0) loses columns through to_pandas)
        keep = [min(stats, key=lambda s: s["rows"])["path"]]
    ds = rd.read_parquet(keep, columns=columns)

    def residual(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch[column], lo)
        if hi is not None:
            m = pc.and_(m, pc.less_equal(batch[column], hi))
        return batch.filter(m)

    return (
        ds.map_batches(residual, batch_format="pyarrow"),
        len(stats),
        0 if pruned_to_zero else len(keep),
    )


def read_evolved(root: str, target: "pa.Schema"):
    """SCHEMA EVOLUTION on read: a directory written over time by
    writers with different column sets reads back as ONE dataset with
    the target schema — files missing a column contribute typed nulls
    (the lakehouse add-column contract; files are never rewritten).
    Files are grouped by their footer's column set and each group is
    one ``read_parquet`` (so pruning still works per group); a file
    with a column whose TYPE conflicts with the target raises instead
    of casting silently."""
    import pyarrow.parquet as pq
    import ray.data as rd

    groups: dict[tuple, list[str]] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, f)
            sch = pq.read_schema(path)
            names = tuple(n for n in target.names if n in sch.names)
            if not names:
                raise TypeError(
                    f"{path}: no column overlaps the target schema — "
                    "its rows would silently vanish from the unified "
                    "read (columns=[] reads zero rows)"
                )
            for n in names:
                have = sch.field(n).type
                want = target.field(n).type
                if have != want:
                    raise TypeError(
                        f"{path}: column {n!r} is {have}, target wants "
                        f"{want} — schema evolution only ADDS columns"
                    )
            groups.setdefault(names, []).append(path)
    if not groups:
        raise FileNotFoundError(f"no parquet files under {root}")

    def conform(names):
        def f(batch: pa.Table) -> pa.Table:
            cols = {}
            for fld in target:
                if fld.name in names:
                    cols[fld.name] = batch[fld.name]
                else:
                    cols[fld.name] = pa.nulls(batch.num_rows, fld.type)
            return pa.table(cols)

        return f

    parts = []
    for names, paths in sorted(groups.items()):
        ds = rd.read_parquet(paths, columns=list(names))
        parts.append(
            ds.map_batches(conform(names), batch_format="pyarrow")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
