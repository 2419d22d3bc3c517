"""Dedicated value + plan tests for the round-13 operators
(registered WITH their tests in the same session — the standing
protocol-debt lesson)."""

from __future__ import annotations

import re

from cloud_native_mapreduce_spark.plans import audit as PA


class TestAnnGraphIndexed:
    def _built(self, spark, sf_dir, tmp_path):
        from cloud_native_mapreduce_spark.similarity.graph_ann_index \
            import build_knn_graph_index
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        emb = load_table(spark, sf_dir, "embeddings")
        build_knn_graph_index(emb, "cnms_gann_p", str(tmp_path / "ix"),
                              graph_k=12)

    def _drop(self, spark):
        for t in ("graph", "vectors", "entries"):
            spark.sql(f"DROP TABLE IF EXISTS cnms_gann_p_{t}")

    def test_matches_unindexed_search(self, spark, sf_dir, tmp_path):
        """Same algorithm, parameters and tie-breaks: the persisted
        index must return EXACTLY ann_graph_search's rows."""
        from cloud_native_mapreduce_spark.similarity.graph_ann import (
            ann_graph_search)
        from cloud_native_mapreduce_spark.similarity.graph_ann_index \
            import ann_graph_indexed
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        self._built(spark, sf_dir, tmp_path)
        try:
            got = [tuple(r) for r in
                   ann_graph_indexed(spark, "cnms_gann_p").collect()]
            want = [tuple(r) for r in ann_graph_search(
                load_table(spark, sf_dir, "embeddings"),
                graph_k=12).collect()]
            assert got == want
        finally:
            self._drop(spark)

    def test_query_plan_zero_exchange_pruned(self, spark, sf_dir,
                                             tmp_path):
        """The returned frame AND a frontier-expansion frame must be
        single bucket-pruned scans: zero shuffle exchanges, literal
        IN-filters firing bucket pruning on the bucketed layout."""
        from pyspark.sql import functions as F

        from cloud_native_mapreduce_spark.similarity.graph_ann_index \
            import ann_graph_indexed
        self._built(spark, sf_dir, tmp_path)
        try:
            df = ann_graph_indexed(spark, "cnms_gann_p")
            a = PA.audit(df)
            assert a.exchange_count == 0, a.text
            assert a.has_take_ordered
            assert not a.has_cartesian
            pruned = re.findall(
                r"SelectedBucketsCount: (\d+) out of (\d+)", a.text)
            assert pruned, a.text
            for sel, tot in pruned:
                assert int(sel) < int(tot), "bucket pruning missed"
            nbr = (spark.table("cnms_gann_p_graph")
                   .where(F.col("src").isin([1, 2, 3]))
                   .select("dst"))
            an = PA.audit(nbr)
            assert an.exchange_count == 0, an.text
            assert re.search(
                r"SelectedBucketsCount: \d+ out of \d+", an.text)
        finally:
            self._drop(spark)
