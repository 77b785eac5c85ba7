"""UDF/UDAF/UDTF contract queries (SURVEY.md §3.9).

In the reference EVERYTHING is a UDF (arbitrary Scala closures in
map/mapM/flatMap, arbitrary monoids in AggFunc, arbitrary state in FSM).
Here the contract is inverted — expressions first — and these queries
demonstrate the three Arrow-vectorized escape hatches for when Python is
genuinely needed:

- scalar ``pandas_udf`` (reference ``map(f)``),
- ``mapInPandas`` 1→N iterator (reference ``mapConcat``),
- grouped-agg ``pandas_udf`` (reference custom ``AggFunc`` monoid).

Each is written to be bit-deterministic (IEEE per-row math / exact
integer-cent sums) so even the Python paths are oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trembita_spark.contract import register, table


@register(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Vectorized scalar pandas_udf (Arrow batches, ~10-100x faster than
    # row-at-a-time udf). Same IEEE double ops as the expression → same
    # bits; in production this slot is for logic expressions CAN'T say.
    @F.pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "q_udtf_mapinpandas",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(string_split(text, ' '), (t, i) -> t))          AS token,
           unnest(list_transform(string_split(text, ' '), (t, i) -> CAST(i AS INT))) AS pos,
           unnest(list_transform(string_split(text, ' '), (t, i) -> CAST(length(t) AS INT))) AS tok_len
    FROM documents
    WHERE lang = 'fr'
    """,
)
def q_udtf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDTF-shaped 1→N: per-partition Arrow batch iterator exploding each
    # doc into (token, 1-based position, length) rows in pure Python.
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "fr")

    def explode_tokens(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, tok in enumerate(text.split(" ")):
                    out.append((doc_id, tok, i + 1, len(tok)))
            yield pd.DataFrame(out, columns=["doc_id", "token", "pos", "tok_len"])

    return docs.select("doc_id", "text").mapInPandas(
        explode_tokens, "doc_id long, token string, pos int, tok_len int"
    )


@register(
    "q_udtf_generator",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(string_split(text, ' '), (t, i) -> CAST(i - 1 AS INT))) AS pos,
           unnest(list_transform(string_split(text, ' '), (t, i) -> t)) AS tok
    FROM documents WHERE lang = 'de'
    """,
)
def q_udtf_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TRUE generator-style Python UDTF (@udtf, SURVEY §3.9 optional row):
    # a SQL-registered table function consumed via LATERAL join — the
    # declarative sibling of q_udtf_mapinpandas' iterator form. Scale
    # note: UDTF rows stream out of Python per input row (no
    # per-partition buffering), and the LATERAL join stays colocated —
    # no shuffle is introduced.
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class SplitTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield (i, t)

    spark.udtf.register("trembita_split_tokens", SplitTokens)
    view = f"udtf_docs_{uuid.uuid4().hex[:8]}"
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT doc_id, t.pos, t.tok "
        f"FROM {view}, LATERAL trembita_split_tokens(text) t"
    )


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS BIGINT) AS gross_cents,
           CAST(sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / 100 / sum(l_quantity) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Custom AggFunc monoid as a grouped-agg pandas UDF: quantity-weighted
    # mean price. Accumulates exact integer cents (order-independent in
    # f64) so the Python aggregation is still hash-checkable. NOTE: a
    # pandas UDAF loses Catalyst partial aggregation — all group rows
    # move to one task; prefer expression aggs at 100 TB (this exists for
    # reference parity of arbitrary monoids).
    @F.pandas_udf("long")
    def gross_cents_udaf(price: pd.Series, qty: pd.Series) -> int:
        return int((price * qty * 100).round().sum())

    @F.pandas_udf("double")
    def wavg_udaf(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * qty * 100).round().sum()
        return float(cents) / 100 / float(qty.sum())

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        gross_cents_udaf("l_extendedprice", "l_quantity").alias("gross_cents"),
        wavg_udaf("l_extendedprice", "l_quantity").alias("weighted_avg_price"),
    )


@register(
    "q_udtf_mapinarrow",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars
    FROM documents
    WHERE lang = 'es'
    """,
)
def q_udtf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Arrow-NATIVE per-partition path (mapInArrow): RecordBatch in,
    # RecordBatch out, no pandas materialization — the lowest-overhead
    # slot for columnar Python (e.g. handing batches to a tokenizer or
    # a GPU library). Completes the UDF matrix: scalar pandas_udf,
    # mapInPandas iterator, @udtf generator, grouped UDAF, and this.
    import pyarrow as pa

    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "es")

    def stats(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            n_tokens = pa.array(
                [len(t.split(" ")) for t in texts], type=pa.int32()
            )
            n_chars = pa.array([len(t) for t in texts], type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [doc_id, n_tokens, n_chars], ["doc_id", "n_tokens", "n_chars"]
            )

    return docs.select("doc_id", "text").mapInArrow(
        stats, "doc_id long, n_tokens int, n_chars int"
    )


@register(
    "q_udtf_table_arg",
    oracle="""
    WITH f AS (SELECT doc_id, n_chars FROM documents WHERE lang = 'fr')
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM f
    """,
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Polymorphic TABLE-argument UDTF (Spark 3.5+/4): the function is
    # invoked as my_udtf(TABLE(v)) and receives whole input ROWS — the
    # SQL-native way to hand a relation to Python (the reference's
    # "pipeline as a value" handed to a user function). This one folds
    # a running summary over its partition and emits ONE row at
    # terminate() — the partial-aggregation shape: per-partition
    # summaries stream out of Python, and the tiny final re-agg
    # combines them, so Python never sees more than its partition and
    # the shuffle carries one row per partition.
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="n_docs long, total_chars long, max_chars long")
    class DocStats:
        def __init__(self):
            self.n = 0
            self.total = 0
            self.mx = None

        def eval(self, row):
            self.n += 1
            self.total += int(row["n_chars"])
            v = int(row["n_chars"])
            self.mx = v if self.mx is None or v > self.mx else self.mx

        def terminate(self):
            if self.n:
                yield (self.n, self.total, self.mx)

    spark.udtf.register("trembita_doc_stats", DocStats)
    view = f"udtf_tablearg_{uuid.uuid4().hex[:8]}"
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "fr")
    docs.select("doc_id", "n_chars").createOrReplaceTempView(view)
    partials = spark.sql(
        f"SELECT * FROM trembita_doc_stats(TABLE(SELECT doc_id, n_chars FROM {view}))"
    )
    return partials.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("total_chars").cast("bigint").alias("total_chars"),
        F.max("max_chars").cast("bigint").alias("max_chars"),
    )
