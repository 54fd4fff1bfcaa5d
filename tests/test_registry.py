"""Driver-contract registry consistency: queries() vs oracle_sql()."""


def test_every_oracle_has_a_query_and_names_are_stable():
    from geodata_ray.pipelines.queries import ORACLE_SQL, RAY_QUERIES

    # an oracle without a query would make the driver's gate KeyError
    assert set(ORACLE_SQL) <= set(RAY_QUERIES)
    # the rows-only set is small and intentional (binary decode,
    # side-effect audit, approximate sketch) — growth here is a smell
    rows_only = set(RAY_QUERIES) - set(ORACLE_SQL)
    assert rows_only == {
        # r5 converted decode_images_ppm / sample_frames_stream /
        # audio_features_wav to SQL-audited via generator pixel/sample
        # replay; these three remain the honest exceptions:
        "flagship_resumable",  # side-effect audit (writes partitions)
        "value_quantiles_events",  # approximate sketch by design
        # S2 Hilbert tokens have no bit-stable SQL replay (libm trig);
        # spec property tests carry correctness (tests/test_s2.py)
        "s2_tokens_events",
    }, rows_only


def test_oracle_constants_importable_from_queries():
    # the lazy __getattr__ re-export keeps legacy import sites working
    from geodata_ray.pipelines.queries import FINGERPRINT_SQL, SIMHASH_SQL

    assert "md5" in FINGERPRINT_SQL and "simhash" in SIMHASH_SQL


def test_driver_entry_contract_shapes():
    import __ray_entry__ as e

    qs = e.queries()
    sql = e.oracle_sql()
    assert set(sql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in sql.values())
