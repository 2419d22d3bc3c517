"""Dedicated value + plan tests for the round-12 extension-session
operators (registered WITH their tests in the same session — the
late-wave protocol-debt lesson from round 11): nb_roc_auc and the
rest of the session's wave.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.plans import audit as PA
from cloud_native_mapreduce_spark.registry import QUERIES

TS = datetime.datetime


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


class TestNbRocAuc:
    def test_hand_midranks(self, spark):
        """Four test docs (fold 0): two en positives and one de doc
        share an identical token multiset, so the class-en ranking
        has a pos/neg score tie — ascending midranks give R1 = 6,
        AUC = (6 - 2*3/2) / (2*2) = 0.75 for BOTH classes."""
        from cloud_native_mapreduce_spark.operators.ml import nb_roc_auc
        rows = [
            (0, "spark spark", "en", "s", 11),    # test, en
            (5, "spark spark", "en", "s", 11),    # test, en (tie)
            (10, "und und", "de", "s", 7),        # test, de
            (15, "spark spark", "de", "s", 11),   # test, de (ties en)
            (1, "spark spark spark", "en", "s", 17),  # train en
            (2, "und und und", "de", "s", 11),        # train de
        ]
        got = {r.lang: r for r in nb_roc_auc(_docs(spark, rows))
               .collect()}
        assert set(got) == {"en", "de"}
        assert (got["en"].n_pos, got["en"].n_neg) == (2, 2)
        assert got["en"].auc_micro == 750_000
        assert (got["de"].n_pos, got["de"].n_neg) == (2, 2)
        assert got["de"].auc_micro == 750_000

    def test_separable_is_perfect(self, spark):
        """Disjoint per-class vocabularies: every class's own docs
        outscore the rest under its model -> AUC exactly 1.0."""
        from cloud_native_mapreduce_spark.operators.ml import nb_roc_auc
        rows = [
            (0, "aa aa", "en", "s", 5), (5, "bb bb", "de", "s", 5),
            (10, "aa aa aa", "en", "s", 8),
            (1, "aa aa aa aa", "en", "s", 11),
            (2, "bb bb bb bb", "de", "s", 11),
        ]
        got = {r.lang: r.auc_micro
               for r in nb_roc_auc(_docs(spark, rows)).collect()}
        assert got == {"en": 1_000_000, "de": 1_000_000}

    def test_plan_grouped_rank_pass(self, spark, sf_dir):
        """The cumulative window must consume the per-(lang, score)
        GROUPED frame (HashAggregate below the Window), never raw
        scored documents, and no global sort / cartesian appears."""
        df = QUERIES["nb_roc_auc"].builder(spark, sf_dir)
        a = PA.audit(df)
        assert a.unpartitioned_window_count == 0
        assert a.global_sort_count == 0
        txt = a.text
        w = txt.find("Window")
        assert w >= 0
        # a HashAggregate node is planned between the scoring join
        # and the window (the grouped rank pass)
        assert "HashAggregate" in txt
