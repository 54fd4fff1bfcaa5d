"""Per-partition lineage records + resumable partitioned writes.

North-rule requirement: every tile assignment must be resumable and
auditable.  The reference's three resume patterns (SURVEY.md §4):
cutout resumes when its files exist (``cutout.py:129-177``), Dataset
re-downloads only missing files (``dataset.py:126-274``), models
re-prepare only when source sha256s change (``model/_base.py:266-314``)
— generalized here to one mechanism:

- output is partitioned by a key column: ``out_dir/part=<key>/``, one
  directory per partition, written ATOMICALLY (tmp dir + ``os.rename``
  — the reference's temp+move idiom, ``dataset.py:389-393``);
- each completed partition appends a lineage record
  (``_manifest/<key>.json``): key, row count, order-insensitive
  content hash, stage version, input fingerprint, wall time;
- a re-run with the same manifest dir SKIPS completed partitions whose
  stage version + input fingerprint match — the write itself is a
  ``groupby(key).map_groups`` so each partition commits independently
  (a killed run resumes where it stopped).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd


def fingerprint_files(paths) -> str:
    """sha256 over file contents (the model-provenance pattern,
    reference model/_base.py:198-314)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def _content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive, deterministic content hash of a partition."""
    hs = pd.util.hash_pandas_object(
        df.reset_index(drop=True), index=False
    ).to_numpy()
    total = int(hs.astype("uint64").sum() % (1 << 64))
    return f"{total:016x}-{len(df)}"


def load_manifest(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, "_manifest")
    out = {}
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    rec = json.load(f)
                out[str(rec["key"])] = rec
    return out


def write_partitioned_resumable(
    ds,
    out_dir: str,
    key_col: str,
    *,
    stage_version: str = "v1",
    input_fingerprint: str = "",
):
    """Write one parquet dir per ``key_col`` value with per-partition
    lineage; returns the manifest DataFrame (one row per partition,
    ``skipped`` True for partitions already committed).

    Partition sizing note: ``key_col`` should be a bounded-cardinality
    shard key (e.g. ``h3_r5`` bucket or year-month), exactly like the
    reference's per-(year,month) files — NOT a high-cardinality id.
    """
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = {
        k: rec
        for k, rec in load_manifest(out_dir).items()
        if rec.get("stage_version") == stage_version
        and rec.get("input_fingerprint") == input_fingerprint
    }

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        key = g[key_col].iloc[0]
        kstr = str(key)
        t0 = time.perf_counter()
        if kstr in done:
            return pd.DataFrame(
                [{"key": kstr, "rows": len(g), "skipped": True,
                  "content_hash": done[kstr]["content_hash"]}]
            )
        g = g.sort_values(list(g.columns), ignore_index=True)
        chash = _content_hash(g)
        final = os.path.join(out_dir, f"part={kstr}")
        tmp = os.path.join(out_dir, f".tmp-{kstr}-{os.getpid()}")
        os.makedirs(tmp, exist_ok=True)
        g.to_parquet(os.path.join(tmp, "data.parquet"), index=False)
        if os.path.isdir(final):  # stale partial from a killed run
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic commit (dataset.py:389-393 idiom)
        rec = {
            "key": kstr,
            "rows": len(g),
            "content_hash": chash,
            "stage_version": stage_version,
            "input_fingerprint": input_fingerprint,
            "wall_sec": round(time.perf_counter() - t0, 4),
            "completed_at": time.time(),
        }
        mtmp = os.path.join(out_dir, "_manifest", f".{kstr}.tmp")
        with open(mtmp, "w") as f:
            json.dump(rec, f)
        os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{kstr}.json"))
        return pd.DataFrame(
            [{"key": kstr, "rows": len(g), "skipped": False,
              "content_hash": chash}]
        )

    result = ds.groupby(key_col).map_groups(write_one, batch_format="pandas")
    return result.to_pandas()


def read_partitioned_view(
    out_dir: str,
    *,
    keys=None,
    predicate=None,
):
    """Reopen a ``write_partitioned_resumable`` output restricted to a
    subset of partitions WITHOUT re-reading the rest — the analogue of
    the reference's prepared-cutout *views* (``cutout.py:129-177``,
    ``preparation.py:294-333``: reopen a prepared output restricted to
    a stored sub-slice, no recompute).

    Pruning happens at the FILE level: only ``part=<key>/`` directories
    whose manifest key passes ``keys`` (an iterable of keys) and/or
    ``predicate(key_str) -> bool`` are handed to ``read_parquet`` — the
    other partitions' bytes never leave storage.  Verify with
    ``Dataset.input_files()``.
    """
    import ray.data as rd

    manifest = load_manifest(out_dir)
    want = None if keys is None else {str(k) for k in keys}
    sel = sorted(
        k
        for k in manifest
        if (want is None or k in want)
        and (predicate is None or predicate(k))
    )
    return read_part_dirs(out_dir, sel)


def read_part_dirs(root: str, keys):
    """Dataset over ``root/part=<key>/*.parquet`` for the given keys
    only (shared by the lineage views and source manifests).

    ``partitioning=None``: the part=<key>/ path segments are lineage
    structure, not hive columns — the key is already in the data."""
    import glob as _glob

    import ray.data as rd

    paths = [
        f
        for k in keys
        for f in sorted(
            _glob.glob(os.path.join(root, f"part={k}", "*.parquet"))
        )
    ]
    if not paths:
        raise FileNotFoundError(
            f"no partitions of {root} match the selection"
        )
    return rd.read_parquet(paths, partitioning=None)


def audit_partitions(out_dir: str):
    """Self-audit of a ``write_partitioned_resumable`` output: RE-READ
    every committed partition from disk, recompute the canonical
    content hash, and compare rows+hash against the manifest record
    written at commit time.  Returns a Dataset of (key, rows,
    roundtrip_ok) — one row per partition, audited in parallel (each
    task reads only its own partition file)."""
    import ray.data as rd

    manifest = load_manifest(out_dir)
    items = [
        {
            "key": k,
            "want_hash": rec["content_hash"],
            "want_rows": int(rec["rows"]),
        }
        for k, rec in sorted(manifest.items())
    ]

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in batch.iterrows():
            part_dir = os.path.join(out_dir, f"part={row['key']}")
            files = sorted(os.listdir(part_dir))
            g = pd.concat(
                [pd.read_parquet(os.path.join(part_dir, f)) for f in files],
                ignore_index=True,
            )
            g = g.sort_values(list(g.columns), ignore_index=True)
            out.append(
                {
                    "key": row["key"],
                    "rows": len(g),
                    "roundtrip_ok": bool(
                        len(g) == row["want_rows"]
                        and _content_hash(g) == row["want_hash"]
                    ),
                }
            )
        return pd.DataFrame(out)

    return rd.from_items(items).map_batches(check, batch_format="pandas")


def stage_metrics(ds) -> list[dict]:
    """Parse ``ds.stats()`` into per-stage metric records (rows, wall
    seconds, rows/s) — the per-stage throughput emission the north rule
    asks for."""
    import re

    out = []
    stats = ds.stats()
    for m in re.finditer(
        r"Operator (\d+) (\S+?):? (\d+) tasks executed, \d+ blocks produced "
        r"in ([\d.]+)s.*?Output num rows per block: .*?, (\d+) total",
        stats,
        re.S,
    ):
        wall = float(m.group(4))
        rows = int(m.group(5))
        out.append(
            {
                "stage": m.group(2),
                "tasks": int(m.group(3)),
                "wall_sec": wall,
                "rows": rows,
                "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            }
        )
    return out


def commit_snapshot(out_dir: str) -> int:
    """Append-only TIME TRAVEL: record the current manifest (partition
    keys + content hashes) as the next numbered snapshot under
    ``_snapshots/``.  Returns the snapshot version.  Partitions are
    immutable once committed (the writer's atomic-rename contract), so
    an old snapshot is exactly "the table as of then" as long as its
    partitions still verify — reading detects rewrites and refuses
    loudly instead of serving silently wrong history."""
    sdir = os.path.join(out_dir, "_snapshots")
    os.makedirs(sdir, exist_ok=True)
    manifest = load_manifest(out_dir)
    partitions = {k: m["content_hash"] for k, m in manifest.items()}
    while True:
        existing = [
            int(fn[:-5]) for fn in os.listdir(sdir)
            if fn.endswith(".json")
        ]
        version = (max(existing) + 1) if existing else 1
        rec = {
            "version": version,
            "created_at": time.time(),
            "partitions": partitions,
        }
        # O_CREAT|O_EXCL makes version allocation atomic: two
        # concurrent committers can never clobber each other's record
        # (an os.replace would silently overwrite the loser's history)
        try:
            fd = os.open(
                os.path.join(sdir, f"{version}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(rec, f)
        return version


def read_snapshot(out_dir: str, version: int):
    """Read the table AS OF ``version``: only the partitions that
    snapshot recorded, verified against the live manifest — a
    partition rewritten since (content hash changed) raises instead of
    silently mixing histories.  Returns a ray Dataset."""
    path = os.path.join(out_dir, "_snapshots", f"{version}.json")
    with open(path) as f:
        snap = json.load(f)
    live = load_manifest(out_dir)
    files = []
    for k, h in snap["partitions"].items():
        cur = live.get(k)
        if cur is None:
            raise FileNotFoundError(
                f"snapshot v{version} partition {k!r} no longer exists"
            )
        if cur["content_hash"] != h:
            raise ValueError(
                f"snapshot v{version} partition {k!r} was rewritten "
                f"(content hash changed) — history is not recoverable"
            )
        files.append(k)
    if not files:
        raise ValueError(f"snapshot v{version} is empty")
    # read_part_dirs passes partitioning=None: the part=<key>/ path
    # segments are lineage structure, and hive inference would inject
    # a spurious 'part' column into every AS-OF read
    return read_part_dirs(out_dir, files)
