"""trembita_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``vitaliihonta/trembita`` (a Scala lazy, typesafe
data-pipelining library with a typed aggregation query DSL), re-expressed
Spark-first: logical plans are declared with the DataFrame/SQL API and
Catalyst + Tungsten pick the physical strategy.

Public surface:

- :class:`trembita_spark.pipeline.Pipeline` — the fluent, eagerly-validated
  pipeline wrapper (the moral equivalent of trembita's ``DataPipelineT``;
  reference: kernel/src/main/scala/trembita/DataPipelineT.scala, unverified).
- :class:`trembita_spark.query.Query` — the aggregation query builder (the
  moral equivalent of trembita-ql's ``where/groupBy/aggregate/having``;
  reference: kernel/src/main/scala/trembita/ql/QueryBuilder.scala,
  unverified).
- :mod:`trembita_spark.operators` — joins (as-of/range), dedup (exact /
  MinHash-LSH / SimHash), similarity search, text analysis, FSM,
  multimodal columns.
- :mod:`trembita_spark.io` — sources and sinks.
- :mod:`trembita_spark.session` — tuned SparkSession factory.
"""

from trembita_spark.pipeline import Pipeline
from trembita_spark.query import Query
from trembita_spark.session import get_session

__all__ = ["Pipeline", "Query", "get_session"]
__version__ = "0.1.0"
