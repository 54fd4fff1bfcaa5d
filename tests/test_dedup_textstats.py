"""Unit tests for dedup primitives and text statistics."""

import numpy as np
import pyarrow as pa
import pytest

from geodata_ray.stages import dedup, textstats


def test_shingle_hashes_deterministic_and_set():
    a = dedup.shingle_hashes("the quick brown fox jumps", 3)
    b = dedup.shingle_hashes("the quick brown fox jumps", 3)
    assert np.array_equal(a, b)
    assert len(a) == 3  # 5 tokens -> 3 shingles
    assert np.array_equal(a, np.unique(a))


def test_minhash_jaccard_estimate():
    """MinHash signature agreement approximates true Jaccard."""
    base = "w" + " w".join(str(i) for i in range(200))
    variant = base + " extra tokens here now"
    sa = dedup.shingle_hashes(base, 3)
    sb = dedup.shingle_hashes(variant, 3)
    inter = np.intersect1d(sa, sb).size
    true_j = inter / (sa.size + sb.size - inter)
    ma = dedup.minhash_signature(sa, 64)
    mb = dedup.minhash_signature(sb, 64)
    est = (ma == mb).mean()
    assert abs(est - true_j) < 0.2
    assert true_j > 0.9


def test_simhash_near_for_similar_docs():
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta iota",
                "one two three four five six seven eight",
            ],
        }
    )
    out = dedup.simhash_batch(t)
    h = out["simhash"].to_numpy().astype(np.uint64)
    d12 = bin(int(h[0]) ^ int(h[1])).count("1")
    d13 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d12 < d13  # similar docs closer in hamming space


def test_token_stats_and_quality():
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["the cat sat on a mat", "x"],
        }
    )
    st = textstats.token_stats_batch(t)
    assert st["n_tokens"].to_pylist() == [6, 1]
    assert st["n_chars"].to_pylist() == [20, 1]
    assert st["n_stopwords"].to_pylist() == [2, 0]  # 'the', 'a'
    q = textstats.quality_score_batch(t)
    qv = q["quality"].to_pylist()
    assert qv[0] > qv[1]


def test_fingerprint_stable_and_distinct():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["same text", "same text", "other"]})
    out = textstats.fingerprint_batch(t)
    f = out["fingerprint"].to_pylist()
    assert f[0] == f[1] != f[2]


def test_langid_profiles():
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the house of a king is grand and big",
                "el rey de la casa y los perros",
                "zz yy xx ww",
            ],
        }
    )
    out = textstats.langid_batch(t)
    assert out["lang_pred"].to_pylist() == ["en", "es", "und"]


def test_hyperplane_bucket_locality():
    """Very similar vectors land in the same LSH bucket (usually)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    near = base + 1e-6
    t = pa.table(
        {
            "vec_id": list(range(100)),
            "embedding": pa.array(
                list(np.vstack([base, near])), type=pa.list_(pa.float64())
            ),
        }
    )
    from geodata_ray.stages.dedup import _as_matrix, _hyperplanes

    V = _as_matrix(t["embedding"])
    H = _hyperplanes(V.shape[1], 12)
    code = (V @ H > 0).astype(np.uint64)
    buckets = np.zeros(100, dtype=np.uint64)
    for j in range(12):
        buckets = (buckets << np.uint64(1)) | code[:, j]
    assert (buckets[:50] == buckets[50:]).mean() > 0.95


def test_simhash_unrelated_long_docs_far_apart():
    """Regression: uint64 vote underflow used to set ~every bit, so all
    long docs collapsed to tiny hamming distances."""
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "the quick brown fox jumps over a lazy dog again and again",
                "completely different words entirely unrelated vocabulary items",
            ],
        }
    )
    h = dedup.simhash_batch(t)["simhash"].to_numpy().astype(np.uint64)
    pops = [bin(int(x)).count("1") for x in h]
    assert all(10 < p < 54 for p in pops), pops  # not all-ones
    d = bin(int(h[0]) ^ int(h[1])).count("1")
    assert 20 <= d <= 44, d  # unrelated docs near 32 bits apart


def test_hash_strings_nomemo_deterministic_unmemoized():
    before = len(dedup._TOKEN_CACHE)
    a = dedup.hash_strings_nomemo(["doc-sized input " * 50, "other", "doc-sized input " * 50])
    assert a[0] == a[2] != a[1]
    assert len(dedup._TOKEN_CACHE) == before  # nothing memoized
    b = dedup.hash_strings_nomemo(["other"])
    assert b[0] == a[1]


@pytest.mark.usefixtures("ray_session")
def test_lsh_verify_modes_agree():
    """Broadcast verify and shuffle-join verify (the 10^12-doc path)
    produce identical near-dup pairs."""
    import ray.data as rd

    corpus = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "one two three four five six seven eight nine ten",
                "alpha beta gamma delta epsilon zeta eta theta iota lambda",
            ],
        }
    )
    ds = rd.from_arrow(corpus).repartition(2)
    a = (
        dedup.minhash_lsh_pairs(
            ds, k=3, bands=64, num_hashes=64, threshold=0.5,
            verify_corpus=corpus,
        )
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    b = (
        dedup.minhash_lsh_pairs(
            ds, k=3, bands=64, num_hashes=64, threshold=0.5,
            verify_mode="shuffle",
        )
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    assert a[["id_a", "id_b"]].values.tolist() == b[["id_a", "id_b"]].values.tolist()
    assert len(a) == 3  # (1,2),(1,4),(2,4)


@pytest.mark.usefixtures("ray_session")
def test_lsh_pairs_partitioning_invariant():
    """Sharded pair generation (no single-block stage) returns the
    identical pair set regardless of input block structure."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(40)]
    # plant near-dups: doc i+100 = doc i with one appended token
    ids = list(range(40)) + [i + 100 for i in range(40)]
    all_texts = texts + [t + " extra" for t in texts]
    corpus = pa.table({"doc_id": ids, "text": all_texts})

    def run(nblocks):
        ds = rd.from_arrow(corpus).repartition(nblocks)
        return (
            dedup.minhash_lsh_pairs(
                ds, k=3, bands=64, num_hashes=64, threshold=0.5,
                verify_corpus=corpus,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )

    a, b = run(1), run(9)
    assert len(a) >= 40  # every planted pair found
    assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_lsh_collision_filter_distributed_matches_broadcast():
    """The fully-distributed collision filter (native hash semi-join of
    the band rows against the n>=2 bucket counts — no driver hop)
    returns the identical pair set on a HIGH-duplicate-density corpus
    (50% dup rate), where the colliding-bucket set is largest relative
    to the corpus."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(30)]
    base = [" ".join(rng.choice(words, size=15)) for _ in range(30)]
    # 50% duplicate density: every doc has an exact twin
    corpus = pa.table(
        {
            "doc_id": list(range(30)) + [i + 500 for i in range(30)],
            "text": base + list(base),
        }
    )

    def run(mode):
        ds = rd.from_arrow(corpus).repartition(4)
        return (
            dedup.minhash_lsh_pairs(
                ds, k=3, bands=16, num_hashes=64, threshold=0.5,
                verify_corpus=corpus, collision_filter=mode,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )

    a = run("broadcast")
    b = run("distributed")
    assert len(a) >= 30  # every planted twin pair found
    assert a.values.tolist() == b.values.tolist()
    # regression: an all-unique corpus leaves ZERO colliding buckets;
    # the distributed path must not crash on the schema-less empty
    # filter result (it falls back to the empty broadcast filter)
    uniq = pa.table(
        {
            "doc_id": list(range(8)),
            "text": [
                " ".join(f"u{i}w{j}" for j in range(12)) for i in range(8)
            ],
        }
    )
    empty = (
        dedup.minhash_lsh_pairs(
            rd.from_arrow(uniq).repartition(2),
            k=3, bands=16, num_hashes=64, threshold=0.5,
            verify_corpus=uniq, collision_filter="distributed",
        )
        .to_pandas()
    )
    assert len(empty) == 0
    # auto picks broadcast below the bound and distributed above it —
    # exercise the switch both ways through the public kwarg
    ds = rd.from_arrow(corpus).repartition(4)
    c = (
        dedup.minhash_lsh_pairs(
            ds, k=3, bands=16, num_hashes=64, threshold=0.5,
            verify_corpus=corpus, collision_filter="auto",
            max_broadcast_collisions=0,  # force the distributed branch
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    assert a.values.tolist() == c.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_lsh_verify_mode_auto_switches_on_corpus_bytes(monkeypatch):
    """verify_mode='auto' picks broadcast for a small corpus and the
    shuffle join above MAX_BROADCAST_VERIFY_BYTES — same pairs."""
    import ray.data as rd

    corpus = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon zeta",
                "one two three four five six",
            ],
        }
    )

    def run():
        ds = rd.from_arrow(corpus).repartition(2)
        return (
            dedup.minhash_lsh_pairs(
                ds, k=3, bands=64, num_hashes=64, threshold=0.5,
                verify_corpus=corpus, verify_mode="auto",
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )

    small = run()  # corpus.nbytes << bound -> broadcast branch
    monkeypatch.setattr(dedup, "MAX_BROADCAST_VERIFY_BYTES", 0)
    big = run()  # forced over the bound -> shuffle branch
    assert small.values.tolist() == big.values.tolist()
    assert small[["id_a", "id_b"]].values.tolist() == [[1, 2]]


@pytest.mark.usefixtures("ray_session")
def test_embedding_dedup_auto_switches_on_rows():
    """embedding_dup_pairs_auto: broadcast-exact below the row bound,
    bucketed LSH above it — identical pairs either way."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16))
    vecs = np.vstack([base, base[:5] + rng.standard_normal((5, 16)) * 1e-4])
    ids = np.arange(25, dtype=np.int64)
    table = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(table).repartition(3)

    exact = (
        dedup.embedding_dup_pairs_auto(
            ds, threshold=0.99, ref_table=table
        )  # 25 rows << bound -> broadcast-exact branch
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    lsh = (
        dedup.embedding_dup_pairs_auto(
            rd.from_arrow(table).repartition(3),
            threshold=0.99, ref_table=None,  # no corpus -> LSH branch
            bits=8, tables=8,
        )
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    assert len(exact) == 5
    assert exact.values.tolist() == lsh.values.tolist()
    # a ref_table too large to broadcast is an ERROR (the LSH plan
    # would silently change ds-vs-ref semantics to ds-vs-ds)
    with pytest.raises(ValueError, match="broadcast bound"):
        dedup.embedding_dup_pairs_auto(
            ds, threshold=0.99, ref_table=table, max_broadcast_rows=0
        )


@pytest.mark.usefixtures("ray_session")
def test_tfidf_top_terms_matches_brute_force():
    """tfidf_top_terms equals an independent pandas TF-IDF ranking,
    including the rank-tie rule (equal score -> term ASC)."""
    import pandas as pd
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple banana apple cherry",
                "banana cherry cherry dates",
                "apple apple apple banana",
                "eel eel fig fig",  # within-doc score ties -> term ASC
            ],
        }
    )
    out = (
        textstats.tfidf_top_terms(rd.from_arrow(docs).repartition(2), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"], ignore_index=True)
    )
    rows = []
    texts = {i: t.split(" ") for i, t in zip(docs["doc_id"].to_pylist(),
                                             docs["text"].to_pylist())}
    df_count = {}
    for toks in texts.values():
        for t in set(toks):
            df_count[t] = df_count.get(t, 0) + 1
    n = len(texts)
    for did, toks in texts.items():
        tf = pd.Series(toks).value_counts()
        score = {
            t: tf[t] * np.log((n + 1.0) / (df_count[t] + 1.0)) for t in tf.index
        }
        ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for r, (t, _) in enumerate(ranked, 1):
            rows.append({"doc_id": did, "term": t, "rank": r})
    want = pd.DataFrame(rows).sort_values(
        ["doc_id", "rank"], ignore_index=True
    )
    assert out[["doc_id", "term", "rank"]].values.tolist() == want.values.tolist()


def test_vectorized_token_hash_bit_identical():
    """hash_tokens_batch / _batch_shingles reproduce the scalar
    _token_hash / shingle_hashes chains bit-for-bit."""
    toks = ["", "a", "quick", "brown", "a", "x" * 40, "zz0"]
    got = dedup.hash_tokens_batch(pa.array(toks, type=pa.string()))
    want = np.array([dedup._token_hash(t) for t in toks], dtype=np.uint64)
    assert np.array_equal(got, want)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",
        "alpha beta gamma  delta",  # double space -> empty token
        "the quick brown fox jumps over the lazy dog",
    ]
    counts, flat = dedup._batch_shingles(texts, 3)
    off = 0
    for t, c in zip(texts, counts):
        want = dedup.shingle_hashes(t, 3)
        assert c == want.size
        assert np.array_equal(flat[off : off + c], want), t
        off += c
    assert off == flat.size


@pytest.mark.usefixtures("ray_session")
def test_remove_boilerplate_lines_order_and_edge_cases():
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "keep one\nBOILER\nkeep two",   # interleaved
                "BOILER\nkeep three",            # leading
                "keep four\nBOILER",             # trailing
                "BOILER",                        # all-boilerplate
            ],
        }
    )
    out = (
        textstats.remove_boilerplate_lines(
            rd.from_arrow(docs).repartition(2), min_docs=3
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out.clean_text.tolist() == [
        "keep one\nkeep two", "keep three", "keep four", "",
    ]
    # below the threshold nothing is removed
    out2 = (
        textstats.remove_boilerplate_lines(
            rd.from_arrow(docs).repartition(2), min_docs=5
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out2.clean_text.tolist() == docs["text"].to_pylist()


def test_redact_pii_batch_cases():
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail a.b+c@ex-ample.org now",
                "call +1 (415) 555-0142 or 415.555.0142",
                "host 10.0.0.1 clean words only",
            ],
        }
    )
    out = textstats.redact_pii_batch(t)["clean_text"].to_pylist()
    assert out == [
        "mail <EMAIL> now",
        "call <PHONE> or <PHONE>",
        "host <IP> clean words only",
    ]
    # boundary guards: longer digit runs stay UNTOUCHED (no leaked
    # fragments), adjacent phones both redact, string-start works
    t2 = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "card 4111111111111111 and ts 20260817120000 stay",
                "4155550142 4155550142",
                "+1 (415) 555-0142 leads",
            ],
        }
    )
    out2 = textstats.redact_pii_batch(t2)["clean_text"].to_pylist()
    assert out2 == [
        "card 4111111111111111 and ts 20260817120000 stay",
        "<PHONE> <PHONE>",
        "<PHONE> leads",
    ]
    # SSN + IBAN positives, and the negative corpus they must NOT
    # touch: card numbers, ISO dates/timestamps, short dashed runs
    t3 = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "ssn 123-45-6789 here",
                "iban DE44BANK0000000317 and GB29NWBK60161331926819 ok",
                "date 2026-08-17 and ts 2026-08-17T12:00:00 stay; "
                "card 4111 1111 1111 1111 stays too",
                "part 123-45-678 is not an ssn; DE4 is not an iban",
            ],
        }
    )
    out3 = textstats.redact_pii_batch(t3)["clean_text"].to_pylist()
    assert out3 == [
        "ssn <SSN> here",
        "iban <IBAN> and <IBAN> ok",
        "date 2026-08-17 and ts 2026-08-17T12:00:00 stay; "
        "card 4111 1111 1111 1111 stays too",
        "part 123-45-678 is not an ssn; DE4 is not an iban",
    ]


@pytest.mark.usefixtures("ray_session")
def test_doc_term_and_tfidf_tolerate_null_text():
    """Null text = empty doc in the tokenizer (ADVICE r3: a null used
    to become INT64_MIN token counts and crash np.repeat)."""
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["apple banana", None, "apple cherry"]),
        }
    )
    tf = (
        textstats.doc_term_counts(rd.from_arrow(docs))
        .to_pandas()
        .sort_values(["doc_id", "term"], ignore_index=True)
    )
    # the null doc contributes nothing but the pipeline doesn't crash
    assert tf[tf.doc_id == 2].term.tolist() in ([], [""])
    assert set(tf[tf.doc_id == 1].term) == {"apple", "banana"}

    top = textstats.tfidf_top_terms(rd.from_arrow(docs), k=2).to_pandas()
    assert set(top[top.doc_id == 1].term) == {"apple", "banana"}


def test_repetition_stats_batch_cases():
    """Hand-checked repetition stats, incl. null text and 1-token docs."""
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b a b a c",   # top bigram (a,b)x2; runs all len 1
                "x x x y y x",   # run of 3 x; top bigram (x,x)x2
                "solo",          # 1 token: no bigrams
                None,            # null -> [''] 1 token (empty string)
            ],
        }
    )
    out = textstats.repetition_stats_batch(t).to_pandas()
    assert out.n_tokens.tolist() == [6, 6, 1, 1]
    assert out.n_distinct_tokens.tolist() == [3, 2, 1, 1]
    assert out.top_bigram_n.tolist() == [2, 2, 0, 0]
    assert out.max_token_run.tolist() == [1, 3, 1, 1]


def test_ngram_window_batch_boundaries_and_nulls():
    """Windows never straddle documents; nulls tokenize to one empty
    token; short docs produce no windows."""
    t = pa.table(
        {
            "doc_id": [10, 11, 12, 13],
            "text": [
                "A b c d",      # lowercased -> 2 windows of n=3
                "x y",          # too short for n=3
                None,           # 1 empty token
                "p q r",        # exactly 1 window
            ],
        }
    )
    ids, ngrams = textstats._ngram_window_batch(
        t, id_col="doc_id", text_col="text", n=3
    )
    got = sorted(zip(ids.tolist(), ngrams.to_pylist()))
    assert got == [
        (10, "a b c"),
        (10, "b c d"),
        (13, "p q r"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_ngram_decontaminate_distinct_hits_and_misses():
    """A doc repeating the same eval n-gram counts it ONCE; a doc with
    two different eval n-grams counts 2; clean docs are absent."""
    import ray.data as rd

    from geodata_ray.stages.textstats import ngram_decontaminate

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma filler alpha beta gamma",  # same ng x2
                "alpha beta gamma then delta eps zeta",      # two ngrams
                "totally clean text with no overlap here",
                "x alpha beta stop gamma y",                 # broken up
            ],
        }
    )
    ds = rd.from_arrow(docs).repartition(3)
    out = (
        ngram_decontaminate(
            ds, ["alpha beta gamma", "delta eps zeta"], n=3
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == [1, 2]
    assert out.hit_ngrams.tolist() == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_edit1_pairs_matches_bruteforce():
    import pandas as pd

    import ray.data as rd

    from geodata_ray.stages.dedup import fuzzy_edit1_pairs

    rng = np.random.default_rng(21)

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            for j in range(len(b) + 1):
                if i == 0:
                    m[i][j] = j
                elif j == 0:
                    m[i][j] = i
                else:
                    m[i][j] = min(
                        m[i - 1][j] + 1,
                        m[i][j - 1] + 1,
                        m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
        return m[len(a)][len(b)]

    words = [
        "".join(rng.choice(list("abcd"), rng.integers(1, 7)))
        for _ in range(60)
    ]
    left = pd.DataFrame({"id": range(60), "name": words})
    rwords = [
        "".join(rng.choice(list("abcd"), rng.integers(1, 7)))
        for _ in range(60)
    ]
    right = pd.DataFrame({"id": range(100, 160), "name": rwords})
    got = (
        fuzzy_edit1_pairs(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            id_col="id",
            str_col="name",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    exp = sorted(
        (int(li), int(ri))
        for li, a in zip(left.id, left.name)
        for ri, b in zip(right.id, right.name)
        if lev(a, b) <= 1
    )
    assert [tuple(r) for r in got.to_numpy()] == exp
    assert len(exp) > 5  # the fixture actually exercises matches


@pytest.mark.usefixtures("ray_session")
def test_pmi_top_bigrams_matches_direct():
    import pandas as pd

    import ray.data as rd

    from geodata_ray.stages.lm import qlog2_fixed
    from geodata_ray.stages.textstats import pmi_top_bigrams

    docs = [
        "strong coffee strong coffee strong coffee",
        "weak tea weak tea weak tea",
        "strong tea weak coffee strong coffee",
        "coffee strong coffee strong tea weak",
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(4), "text": docs})
    ).repartition(2)
    out = pmi_top_bigrams(ds, k=50, min_count=2).to_pandas()

    # direct reference
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in docs:
        ws = t.lower().split(" ")
        uni.update(ws)
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    n = sum(uni.values())
    exp = {}
    for g, c in bi.items():
        if c < 2:
            continue
        x, y = g.split(" ")
        exp[g] = int(
            qlog2_fixed(np.array([n * c], np.uint64))[0]
        ) - int(qlog2_fixed(np.array([uni[x] * uni[y]], np.uint64))[0])
    got = dict(zip(out.ngram, out.pmi_fp))
    assert got == exp
    # ordering: descending pmi, ngram tiebreak
    key = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(out.ngram) == [g for g, _ in key]
