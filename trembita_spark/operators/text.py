"""Text-analysis operators: tokenization, word counts, tf-idf,
language-ID heuristic, quality scoring, token counting, fingerprinting.

North-star extensions (BASELINE.json). All pure expressions — no Python
in the hot path; every operator is one or two shuffles at most and every
formula is integer/rational arithmetic so results stay bit-deterministic
(ln-based idf is available via ``idf_log`` but excluded from oracle
checks — libm; see contract/scalar_fns.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = " "
# Greedy BPE-ish chunker: ≤4-char letter runs, ≤3-digit runs, other glyphs.
BPE_ISH_PATTERN = "[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]"

# Tiny per-language marker-word profiles (language-ID heuristic — a real
# deployment ships n-gram profiles; the shape of the computation is the
# same: per-language evidence score → argmax with deterministic ties).
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), TOKEN_SPLIT)


def bigram_structs(toks: Column) -> Column:
    """Array of adjacent-pair structs (w1, w2) over a MATERIALIZED
    token-array column — a zip of two slices of the one array. Callers
    must bind ``toks`` to a projected column (not an inline split):
    higher-order lambdas are interpreted (no codegen), so an inline
    split would re-split the whole string per element — O(tokens²)
    string work per row (measured 10x on q_text_repetition)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)"))


def word_counts(df: DataFrame, text_col: str = "text", by: list[str] | None = None) -> DataFrame:
    """Corpus word counts, optionally keyed (e.g. per language)."""
    keys = by or []
    # Spread the under-split local scan so tokenize+explode+partial-agg
    # run across the session's cores, not inside the one scan task
    # (no-op at production split counts — see io.spread_scan).
    from trembita_spark.io import spread_scan

    ex = spread_scan(df.select(*keys, text_col), text_col).select(
        *keys, F.explode(tokens(text_col)).alias("token")
    )
    return ex.groupBy(*keys, "token").agg(F.count(F.lit(1)).alias("n"))


def tf_idf_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per (doc, token): tf, df, and ratio-idf tfidf = tf·(N+1)/(df+1).

    Two aggregations + one broadcast join — the classic two-pass shape;
    at 100 TB the token→df side is the small one (vocabulary), so it
    broadcasts. Rational idf keeps it oracle-exact; multiply by
    ``ln`` downstream if you need the log-scaled variant.

    No scan spread here (round-13, verdict item 7): spread_scan is a
    no-op at production split counts, so the question is local-only —
    and the quiet-box A/B has the spread neutral-to-negative (noop
    med 0.52-0.95 s with vs 0.45-0.52 s without over two 7-trial reps;
    the r12 driver line agreed at 0.982x): the corpus is small enough
    that the tf aggregate's own exchange supplies the parallelism and
    the extra exchange only adds a stage. word_counts keeps its spread
    (its explode feeds the aggregate directly in the scan stage)."""
    tf = (
        df.select(F.col(id_col).alias("doc_id"), text_col)
        .select("doc_id", F.explode(tokens(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1))
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


def lang_scores(text_col: str = "text") -> list[Column]:
    """Per-language marker-hit counts over the doc's distinct tokens."""
    vocab = F.array_distinct(tokens(text_col))
    cols = []
    for lang, markers in LANG_MARKERS.items():
        lit_arr = F.array(*[F.lit(m) for m in markers])
        cols.append(F.size(F.array_intersect(vocab, lit_arr)).alias(f"hits_{lang}"))
    return cols


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker scores, deterministic
    tie order = declaration order, 'und' (undetermined) when all zero."""
    scored = df.select(F.col(id_col).alias("doc_id"), F.col("lang").alias("lang_true"), *lang_scores(text_col))
    langs = list(LANG_MARKERS)
    greatest_all = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    # ordered CASE chain: first declared language wins score ties
    pred = None
    for lang in langs:
        cond = (F.col(f"hits_{lang}") > 0) & (F.col(f"hits_{lang}") == greatest_all)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return scored.withColumn("lang_pred", pred.otherwise(F.lit("und")))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + score in [0,1]:
    token count, char count, mean token length, distinct-token ratio,
    marker-stopword ratio; score = blend, flag = score threshold."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    all_markers = F.array(
        *[F.lit(m) for ms in LANG_MARKERS.values() for m in ms]
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), all_markers))
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_hits / F.lit(3.0), F.lit(1.0)) * 0.2
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        mean_tok_len.alias("mean_tok_len"),
        distinct_ratio.alias("distinct_ratio"),
        stop_hits.alias("stop_hits"),
        score.alias("quality"),
        (score >= 0.5).alias("keep"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens vs BPE-ish regex chunks (a cheap proxy for
    LLM-token budgeting) + chars-per-chunk."""
    ws = F.size(tokens(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length(text_col) / bpe).alias("chars_per_chunk"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (the classic 'fingerprint clustering' key), plus
    a 60-bit integer bucket for partitioned storage/joins."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    fp = F.md5(canon)
    return df.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fp_bucket"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Token-budgeted chunking with overlap — the LLM-ingest shape:
    (doc_id, chunk_id, chunk_text, n_chunk_tokens). Chunk i covers tokens
    [i*stride, i*stride + chunk_tokens); the final partial chunk is kept.
    Pure expressions (sequence + slice + explode): no Python per row.
    """
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    toks = f"split({text_col}, ' ')"
    # number of chunks: ceil(max(n - overlap, 1) / stride)
    n_chunks = f"greatest(CAST(ceil((size({toks}) - {overlap}) / {stride}.0) AS INT), 1)"
    chunks = F.expr(
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> struct(i AS chunk_id, slice({toks}, i * {stride} + 1, {chunk_tokens}) AS toks))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
            F.size("c.toks").alias("n_chunk_tokens"),
        )
    )


# PII patterns shared with the SQL oracle — RE2/Java-regex common subset
# (no backrefs, no lookaround) so both engines match identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ ]+",
    "phone": r"\b555-[0-9]{4}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Detect-and-redact PII spans (emails, URLs, phone numbers) — the
    standard pre-training scrub pass. Returns (id, n_<kind>... match
    counts, scrubbed text with each span replaced by ``<KIND>``).

    Pure ``regexp_replace``/``regexp_count`` expressions: scan-local,
    whole-stage-codegen, zero shuffles — the 100 TB cost is exactly one
    read+write pass. Patterns are applied in dict order (relevant when
    one pattern could match inside another's replacement)."""
    pats = patterns or PII_PATTERNS
    out = df
    scrubbed = F.col(text_col)
    for kind, pat in pats.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("scrubbed", scrubbed).select(
        id_col, *[f"n_{k}" for k in pats], "scrubbed"
    )


# Entity decode order matters: &amp; LAST, else '&amp;lt;' would double-
# decode ('&amp;lt;' → '&lt;' → '<' is wrong; correct answer is '&lt;').
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML/boilerplate removal — the first pass of every web-crawl
    pipeline: drop tags, decode the common entities, collapse
    whitespace. Returns (id, n_tags, clean).

    Pure ``regexp_replace``/``replace`` expressions: scan-local,
    whole-stage-codegen, zero shuffles. ``<[^>]+>`` is valid in both
    Java regex and RE2, so the op is oracle-checkable verbatim. A full
    HTML5 parser this is not (comments/scripts with embedded ``>`` need
    a real tokenizer) — it is the cheap high-recall pass run before
    quality scoring."""
    clean = F.regexp_replace(F.col(text_col), r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.select(
        id_col,
        F.regexp_count(F.col(text_col), F.lit(r"<[^>]+>")).cast("long").alias("n_tags"),
        clean.alias("clean"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the fraction of its
    word k-shingles that also appear in the ``benchmark`` set (the
    standard train/test-overlap check before training on scraped data).
    Returns (doc_id, n_shingles, n_hit, hit_frac) for every corpus doc
    with at least one shingle.

    Scale shape: the benchmark shingle set is tiny next to the corpus →
    distinct it and BROADCAST; the corpus side is one explode + one
    broadcast hash join + one re-agg by doc — corpus never shuffles by
    shingle. md5-hash the shingles first so only 32-byte keys move, not
    text."""
    from trembita_spark.operators.dedup import shingles_expr

    def doc_shingles(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), F.explode(shingles_expr(text_col, k)).alias("sh"))
            .select(id_col, F.md5("sh").alias("shash"))
            .distinct()
        )

    bench = F.broadcast(doc_shingles(benchmark).select("shash").distinct())
    corp = doc_shingles(corpus)
    hit = bench.withColumn("hit", F.lit(1))
    return (
        corp.join(hit, "shash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn("hit_frac", F.col("n_hit") / F.col("n_shingles"))
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (the Gopher/MassiveText
    family of filters): the fraction of tokens taken by the single most
    frequent token, and the fraction of 2-grams that are repeats.
    Degenerate machine-generated text scores high on both; corpus
    curation drops documents above a threshold.

    Shape: the bigram signal is a pure per-row expression (HOF over the
    token array — zero shuffle); the top-token share needs per-(doc,
    token) counts, one explode + two partial-agg groupBys on doc_id.
    Both signals are integer-ratio arithmetic → bit-deterministic.
    """
    from trembita_spark.io import spread_scan

    # Tokenize ONCE into a materialized array column. The previous
    # bigram expression re-ran split() inside an interpreted HOF lambda
    # (higher-order functions get no codegen), so every element access
    # re-split the whole string — O(tokens²) splits per document. The
    # bigram list is now a zip of two slices of the one array.
    # Spreading the under-split scan on doc_id also lets BOTH signal
    # branches and the final join reuse a single exchange: hash(doc_id)
    # satisfies groupBy(doc_id, tok), groupBy(doc_id), and the join.
    base = spread_scan(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")),
        "doc_id",
    ).select("doc_id", F.split(F.col("__text"), " ").alias("__toks"))
    n = F.size("__toks")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("__toks", F.lit(1), n - 1),
            F.slice("__toks", F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    per_row = base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(
            F.size(bigrams) > 0,
            1.0
            - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams),
        ).alias("dup_bigram_frac"),
    )
    top = (
        base.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_token_share"))
    )
    return per_row.join(top, "doc_id")


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for corpus dedup: lowercase scheme+host,
    strip a leading ``www.``, drop default ports (``:443`` https /
    ``:80`` http), drop the fragment, remove ``utm_*`` tracking params,
    and sort the surviving query params. Pure expression (whole-stage
    codegen) — the shuffle that groups identical canonical URLs is the
    only data movement a dedup over this column needs.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, r"^[^:]+://([^/]*)", 1))
    path = F.regexp_extract(base, r"^[^:]+://[^/]*(/.*)?$", 1)
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(scheme, F.lit("://"), host, path_norm, qpart)


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Adjacent token-pair frequencies — the counting step of one BPE
    merge iteration over a whitespace-tokenized corpus. Returns the
    ``top_n`` pairs as (t1, t2, n) under the unique total order
    (n DESC, t1, t2).

    Pairs come from zipping each document's token array against its
    own 1-shifted slice (pure JVM array expressions — no posexplode
    self-join, no Python). 100 TB: one explode + one hash agg with
    map-side combine + a TakeOrdered(top_n); shuffle carries only the
    distinct-pair partials, never the corpus.
    """
    toks = F.split(F.col(text_col), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice(toks, 1, n1).alias("t1"), F.slice(toks, 2, n1).alias("t2")
    )
    pairs = df.select(F.explode(z).alias("p")).select(
        F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2")
    )
    return (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2")
        .limit(top_n)
    )
