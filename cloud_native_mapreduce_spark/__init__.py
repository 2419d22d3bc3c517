"""cloud_native_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capabilities of the
reference MapReduce framework (yumski/Cloud-Native-MapReduce): the generic
map/shuffle/reduce UDF contract (Hadoop-Streaming-style pipe jobs), the
word-count workload with exact tokenizer parity, plus the relational and
LLM-data-pipeline surface (joins/aggregates/windows, dedup, similarity
search, text analysis, multimodal plumbing, structured streaming) designed
for 100 TB scale: declarative DataFrame plans, broadcast-aware joins,
map-side partial aggregation, AQE, no driver-side collects in operator
paths.
"""

__version__ = "0.1.0"

from cloud_native_mapreduce_spark.session import get_spark  # noqa: F401
