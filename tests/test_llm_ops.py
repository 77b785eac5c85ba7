"""Unit tests for the LLM-data operators on constructed corpora where the
right answers are known (dup pairs planted, similarity geometry known) —
the parity suite checks engine-vs-oracle; these check engine-vs-truth."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from trembita_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from trembita_spark.operators.multimodal import (
    attach_image_payload,
    attach_payload,
    decode_headers,
    decode_image_pixels,
    extract_features,
    parse_image_header,
    synth_image,
)
from trembita_spark.operators.similarity import cosine_topk, ivf_topk
from trembita_spark.operators.text import lang_id, quality_features, tf_idf_ratio


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
    other = "completely different words about spark query engines and distributed shuffles here"
    return spark.createDataFrame(
        [(0, base, "en"), (1, base, "en"), (2, near, "en"), (3, other, "en")],
        "doc_id long, text string, lang string",
    )


def test_exact_dedup_finds_planted_dup(corpus):
    dups = {r.keep_id: r.n_copies for r in exact_dedup(corpus).collect()}
    assert dups[0] == 2  # docs 0 and 1 identical
    assert dups[2] == 1 and dups[3] == 1


def test_minhash_lsh_finds_near_dup(corpus):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(corpus, bands=8, k=3).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # 1-word-off doc shares minima
    assert (0, 3) not in pairs and (2, 3) not in pairs  # unrelated doc doesn't


def test_minhash_short_docs_skipped(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "x")], "doc_id long, text string")
    assert minhash_lsh_candidates(df).count() == 0


def test_simhash_near_dups_close(corpus):
    fp = {r.doc_id: r.simhash for r in simhash(corpus).collect()}
    assert fp[0] == fp[1]
    ham_near = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[3]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_scores(corpus):
    rows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, k=3, sample_prefix="8", min_jaccard=0.0).collect()
    }
    assert rows[(0, 1)] == 1.0
    assert 0.0 < rows[(0, 2)] < 1.0


def test_cosine_topk_known_geometry(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [1, 2, 3]
    assert out[0].cos == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5)


def test_ivf_topk_routes_to_cell(spark):
    vecs = [
        (0, 0, [1.0, 0.0]), (1, 0, [0.95, 0.05]), (2, 0, [0.9, 0.1]),
        (10, 1, [0.0, 1.0]), (11, 1, [0.05, 0.95]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, label int, embedding array<float>")
    out = ivf_topk(df, df.filter(F.col("vec_id") == 0), k=2, nprobe=1).collect()
    assert {r.cell for r in out} == {0}          # probed only its own cell
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]


def test_tfidf_rare_term_scores_higher(corpus):
    rows = tf_idf_ratio(corpus).collect()
    by = {(r.doc_id, r.token): r.tfidf for r in rows}
    # equal tf=1: 'shuffles' is unique to doc 3 (df=1), 'quick' appears
    # in three docs (df=3) → rarer term scores higher
    assert by[(3, "shuffles")] > by[(0, "quick")]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the hat of doom", "en"),
            (2, "der hund und die katze ist hier", "de"),
            (3, "zzz qqq www", "zz"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_quality_score_bounds(corpus):
    for r in quality_features(corpus).collect():
        assert 0.0 <= r.quality <= 1.0
        assert r.n_tokens > 0


def test_multimodal_features(spark, corpus):
    docs = attach_payload(corpus)
    feats = {r.doc_id: r for r in extract_features(docs).collect()}
    assert len(feats[0].features) == 8
    assert feats[0].features == [float(b) for b in "the quic".encode()]
    assert feats[0].byte_sum == sum(corpus.collect()[0].text.encode())


def test_md5_unicode_cross_engine(spark):
    # md5 operates on UTF-8 bytes identically in Spark, Python, DuckDB —
    # the property every hash-based operator (dedup, fingerprint,
    # minhash) relies on, including for non-ASCII corpora.
    import hashlib

    import duckdb

    s = "café 日本語 emoji"
    spark_h = spark.createDataFrame([(s,)], "t string").selectExpr("md5(t) AS h").collect()[0].h
    py_h = hashlib.md5(s.encode()).hexdigest()
    duck_h = duckdb.connect().execute("SELECT md5(?)", [s]).fetchall()[0][0]
    assert spark_h == py_h == duck_h


def test_connected_components_multihop_chain(spark):
    # a-b, b-c, c-d is a diameter-3 component: convergence must NOT stop
    # after one propagation round (the old sum-of-labels check did for
    # string ids, where sum() is NULL every round).
    from trembita_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {(r.node, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }, got


def test_connected_components_numeric_chain(spark):
    from trembita_spark.operators.dedup import connected_components

    # reversed chain so min-label must travel the full diameter
    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1)], "doc_a long, doc_b long"
    )
    got = {(r.node, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}, got


def test_dedup_clusters_singletons_and_groups(corpus):
    from trembita_spark.operators.dedup import dedup_clusters

    got = {(r.doc_id, r.cluster_id) for r in dedup_clusters(corpus).collect()}
    # docs 0/1 are byte-identical, 2 is a near-dup of both → one cluster
    # rooted at 0; doc 3 is unrelated → its own singleton.
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3)}, got


def test_salted_join_mode_aliases(spark):
    from trembita_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "z")], "k long, w string")
    for how in ("leftouter", "LEFT_SEMI", "leftanti", "Inner"):
        salted_join(left, right, on="k", how=how)  # must not raise
    with pytest.raises(ValueError):
        salted_join(left, right, on="k", how="full")


def test_signlsh_same_vector_same_bucket(spark):
    from trembita_spark.operators.similarity import signlsh_buckets, signlsh_candidates

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),     # identical → identical signature
        (3, [0.99, 0.01, 0.0, 0.0]),   # near-identical → same signs
        (4, [-1.0, 0.0, 0.0, 0.0]),    # antipodal → complement signature
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = {r.vec_id: (r.sig, r.bucket_n) for r in signlsh_buckets(df, planes=6).collect()}
    assert b[1] == b[2] == b[3]
    assert b[1][1] == 3
    assert b[4][0] != b[1][0]
    comp = "".join("1" if c == "0" else "0" for c in b[1][0])
    assert b[4][0] == comp
    # candidates: only same-bucket pairs scored
    pairs = {(r.vec_a, r.vec_b) for r in signlsh_candidates(df, planes=6, threshold=0.9).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_pii_scrub_redacts_and_counts(spark):
    from trembita_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a@b.co and c.d@e.org, see https://x.io/z call 555-1234 ok")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert (r.n_email, r.n_url, r.n_phone) == (2, 1, 1)
    assert "@" not in r.scrubbed and "https://" not in r.scrubbed
    assert "<EMAIL>" in r.scrubbed and "<URL>" in r.scrubbed and "<PHONE>" in r.scrubbed


def test_contamination_fractions(spark):
    from trembita_spark.operators.text import contamination

    bench = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),  # shares 5-grams
            (2, "alpha beta gamma delta epsilon zeta"),  # disjoint
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_shingles, r.n_hit) for r in contamination(corpus, bench, k=5).collect()}
    assert got[1] == (3, 2)   # 3 5-grams, 2 appear in benchmark
    assert got[2][1] == 0


def test_stratified_sample_exact_quota_and_determinism(spark):
    from trembita_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", "doc_id", 0.2)
    got = {(r.doc_id, r.lang) for r in out.collect()}
    # exact per-stratum quota: ceil(0.2 * 60)=12 en, ceil(0.2 * 30)=6 de
    by_lang = {}
    for _, lang in got:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert by_lang == {"en": 12, "de": 6}
    # deterministic under different physical partitioning (no RNG)
    got2 = {(r.doc_id, r.lang) for r in stratified_sample(df.repartition(7), "lang", "doc_id", 0.2).collect()}
    assert got == got2


def test_stratified_sample_null_stratum_kept(spark):
    # A NULL stratum (unidentified language) is a real stratum: the
    # join back to per-stratum counts must be null-safe or every
    # NULL-stratum row silently disappears.
    from trembita_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i < 40 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", "doc_id", 0.25)
    by_lang = {}
    for r in out.collect():
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # ceil(0.25*40)=10 en, ceil(0.25*20)=5 NULL
    assert by_lang == {"en": 10, None: 5}
    # output schema is clean: no helper columns leak
    assert set(out.columns) == {"doc_id", "lang"}


def test_weighted_mix_rates_and_stability(spark):
    from trembita_spark.operators.sampling import weighted_mix

    rows = [(i, f"src{i % 2}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_mix(df, "source", "doc_id", {"src0": 0}, default_rate=100)
    kept = [r.source for r in out.collect()]
    assert set(kept) == {"src1"} and len(kept) == 200  # rate 0 drops all, 100 keeps all
    # subset property: raising a rate only ADDS rows, never swaps them
    lo = {r.doc_id for r in weighted_mix(df, "source", "doc_id", {"src0": 20}).collect()}
    hi = {r.doc_id for r in weighted_mix(df, "source", "doc_id", {"src0": 60}).collect()}
    assert lo <= hi


def test_repetition_signals_known_text(spark):
    from trembita_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token repeated
            (2, "all words here are different"),  # no repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].top_token_share == 1.0
    # bigrams of doc 1: 3 total, 1 distinct -> dup fraction 2/3
    assert abs(out[1].dup_bigram_frac - 2 / 3) < 1e-12
    assert out[2].top_token_share == pytest.approx(1 / 5)
    assert out[2].dup_bigram_frac == 0.0


def test_parse_image_header_roundtrip():
    # Encode (synth_image) and decode (parse_image_header) are separate
    # code paths; round-trip across all formats and edge dimensions.
    for fmt in ("png", "jpeg", "gif", "bmp"):
        for w, h in ((1, 1), (37, 21), (65535, 1024)):
            assert parse_image_header(synth_image(fmt, w, h)) == (fmt, w, h)


def test_pixel_decode_roundtrip_all_filters():
    # synth_image_rgb cycles PNG scanline filters y % 5, so any height
    # ≥ 5 exercises None/Sub/Up/Average/Paeth reconstruction; BMP covers
    # stride padding (width % 4 != 0), BGR swap, bottom-up order.
    from trembita_spark.operators.multimodal import (
        _pixel_value,
        decode_image_pixels,
        synth_image_rgb,
    )

    for fmt in ("png", "bmp"):
        for w, h, seed in ((1, 1, 0), (9, 7, 3), (23, 19, 200), (16, 5, 255)):
            f2, w2, h2, px = decode_image_pixels(synth_image_rgb(fmt, w, h, seed))
            assert (f2, w2, h2) == (fmt, w, h)
            assert px == bytes(
                _pixel_value(x, y, c, seed)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )


def test_pixel_decode_unsupported_raises_value_error():
    # JPEG (entropy decode needs a codec) and junk raise ValueError —
    # the contract path catches it into a filterable 'unknown' row.
    for junk in (b"", b"\x89PNG", synth_image("jpeg", 5, 5), b"BM" + b"\x00" * 40):
        with pytest.raises((ValueError, struct.error)):
            decode_image_pixels(junk)


def test_parse_image_header_corrupt_is_row_not_error():
    # Corrupt/truncated/foreign payloads must yield a filterable row, not
    # raise — at scale one bad asset must not kill a task.
    for junk in (b"", b"garbage", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
                 b"BM\x00", b"GIF89a", synth_image("png", 5, 5)[:15]):
        fmt, w, h = parse_image_header(junk)
        assert fmt == "unknown" and w == -1 and h == -1


def test_decode_headers_distributed(spark, corpus):
    rows = {
        r.doc_id: r
        for r in decode_headers(attach_image_payload(corpus.select("doc_id"))).collect()
    }
    r2 = rows[2]
    assert (r2.format, r2.width, r2.height) == ("gif", 16 + 2 % 64, 16 + 2 % 48)
    assert all(r.format != "unknown" for r in rows.values())


def test_strip_markup_entity_order(spark):
    from trembita_spark.operators.text import strip_markup

    rows = [
        (1, "<p>a &amp;lt; b</p>"),       # &amp;lt; must become '&lt;' not '<'
        (2, "no <b>markup</b>&nbsp;here"),
        (3, "  <div>   spaced    out </div>  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in strip_markup(df).collect()}
    assert got[1].clean == "a &lt; b"
    assert got[1].n_tags == 2
    assert got[2].clean == "no markup here"
    assert got[3].clean == "spaced out"


def test_lsh_finds_planted_near_dups(spark):
    # LSH quality as a tested property: plant near-duplicates (perturb
    # the last token of a 20-token doc → shingle-Jaccard ≈ 0.85) and
    # require the banded minhash to surface most planted pairs while
    # keeping candidate volume far below all-pairs. Deterministic: texts
    # and perturbations are functions of the id, no RNG.
    from trembita_spark.operators.dedup import minhash_lsh_candidates

    rows = []
    for i in range(60):
        toks = [f"w{i}_{j}" for j in range(20)]
        rows.append((2 * i, " ".join(toks)))          # original
        toks2 = list(toks); toks2[-1] = "CHANGED"
        rows.append((2 * i + 1, " ".join(toks2)))     # near-dup partner
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(docs, bands=8, k=3).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(60)}
    recall = len(planted & cand) / len(planted)
    assert recall >= 0.8, (recall, len(cand))
    # distinct vocabularies per pair → no cross-pair candidates at all;
    # candidate volume must stay linear, nowhere near the 7k all-pairs.
    assert len(cand) <= 2 * len(planted), len(cand)


def test_frame_sample_short_and_empty_payloads(spark):
    # payloads shorter than one frame must yield NO rows (not an
    # inverted-sequence crash); full frames still hash correctly.
    import hashlib

    from trembita_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, b"short"), (2, b""), (3, b"x" * 33)], "doc_id long, payload binary"
    )
    rows = frame_sample(df, frame_bytes=16, stride=4).collect()
    assert {r.doc_id for r in rows} == {3}
    assert [(r.frame_id, r.frame_md5) for r in rows] == [
        (0, hashlib.md5(b"x" * 16).hexdigest())
    ]


def test_repetition_and_bigram_lm_single_token_docs(spark):
    # sequence(1, 0) generates DESCENDING [1,0] (not empty) and
    # element_at then indexes out of bounds under ANSI — single-token
    # docs crashed both bigram expressions before the guards.
    from trembita_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a a a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].dup_bigram_frac is None   # undefined for <2 tokens
    assert rows[2].dup_bigram_frac == 0.0
    assert rows[3].dup_bigram_frac == 0.5    # 'a a' twice in [a a, a a]


def test_wav_roundtrip_and_corrupt():
    from trembita_spark.operators.multimodal import decode_wav, synth_wav

    for n, seed in ((1, 0), (32, 7), (95, 508)):
        rate, m, xs = decode_wav(synth_wav(n, seed))
        assert rate == 8000 and m == n == len(xs)
    # stereo/8-bit/float fmt variants and junk must raise, not corrupt
    bad_fmt = synth_wav(4, 1)
    bad_fmt = bad_fmt.replace(struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
                              struct.pack("<HHIIHH", 3, 2, 8000, 16000, 2, 32))
    for junk in (b"", b"RIFF1234WAVE", bad_fmt, b"OggS" + b"\x00" * 40):
        with pytest.raises((ValueError, struct.error)):
            decode_wav(junk)
