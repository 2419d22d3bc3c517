"""Distributed classical-ML operators: naive Bayes and the CART
decision stump learn real signal on separable synthetic data."""

from __future__ import annotations

from cloud_native_mapreduce_spark.operators.ml import naive_bayes_lang


def test_naive_bayes_learns_separable_vocabularies(spark):
    """With disjoint per-language vocabularies the held-out fold must
    classify perfectly — the learner learns, independently of the
    oracle agreeing."""
    vocab = {"aa": ["anna", "aalto", "arbor"],
             "bb": ["bruno", "basel", "borne"],
             "cc": ["ciara", "cadiz", "coral"]}
    rows = []
    did = 0
    for lang, words in vocab.items():
        for i in range(10):
            text = " ".join(words[(i + j) % 3] for j in range(6))
            rows.append((did, text, lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    got = naive_bayes_lang(docs).collect()
    assert all(r.actual_lang == r.predicted_lang for r in got)
    # every language appears in the held-out fold (doc_id % 5 == 0)
    assert {r.actual_lang for r in got} == set(vocab)
    assert sum(r.n_docs for r in got) == 6  # 2 held-out docs per lang


def test_naive_bayes_unknown_tokens_fall_back_to_default(spark):
    """A held-out doc made ONLY of tokens never seen in training must
    still be scored (via the per-language unknown-token default) and
    predicted as SOME language — never dropped or nulled."""
    rows = [(i, "alpha beta gamma", "xx") for i in range(1, 5)]
    rows += [(i, "delta epsilon zeta", "yy") for i in range(6, 10)]
    rows.append((0, "omega psi chi", "xx"))  # held out, unseen tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    got = naive_bayes_lang(docs).collect()
    assert sum(r.n_docs for r in got) == 1
    assert got[0].actual_lang == "xx"
    # all-unknown tokens: both classes have identical priors (4 train
    # docs each) and identical unknown-token defaults (same ctot), so
    # scores tie EXACTLY in integer micronats and the deterministic
    # lang tiebreak picks 'xx' — pinning both the fallback path and
    # the total-order argmax
    assert got[0].predicted_lang == "xx"


def test_decision_stump_finds_perfect_split(spark):
    """A hand-built table where quantity <= 2 separates the classes
    exactly: the stump must pick that split with gini_scaled == 0 and
    opposite leaf predictions."""
    from cloud_native_mapreduce_spark.operators.ml import decision_stump

    rows = []
    for i in range(20):
        q = 1 + (i % 2)            # 1 or 2  -> class R
        rows.append((float(q), 0.05, "R"))
    for i in range(30):
        q = 5 + (i % 3)            # 5..7    -> class N
        rows.append((float(q), 0.05 if i % 2 else 0.07, "N"))
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_returnflag string")
    got = decision_stump(df).collect()[0]
    assert got.feature == "quantity"
    assert got.threshold == 2.0
    assert got.gini_scaled == 0
    assert (got.n_left, got.pos_left) == (20, 20)
    assert (got.n_right, got.pos_right) == (30, 0)
    assert (got.predict_left, got.predict_right) == ("R", "not_R")


def test_decision_stump_gini_matches_python(spark):
    """On an imperfectly separable table the chosen split and its
    scaled impurity must equal a from-scratch Python CART sweep —
    semantics pinned independently of the SQL oracle."""
    from cloud_native_mapreduce_spark.operators.ml import (
        STUMP_SCALE,
        decision_stump,
    )

    rows = [(float(1 + i % 4), (i % 5) / 100.0,
             "R" if (i % 4 < 2) == (i % 7 < 4) else "N")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_returnflag string")

    best = None
    for feat, col in (("quantity", 0), ("discount", 1)):
        vals = sorted({r[col] for r in rows})
        for thr in vals:
            left = [r for r in rows if r[col] <= thr]
            right = [r for r in rows if r[col] > thr]
            if not left or not right:
                continue
            sides = []
            for side in (left, right):
                n = len(side)
                p = sum(1 for r in side if r[2] == "R")
                sides.append((n, p))
            (nl, pl), (nr, pr) = sides
            a = nl * nl - pl * pl - (nl - pl) ** 2
            b = nr * nr - pr * pr - (nr - pr) ** 2
            s = (a * nr + b * nl) * STUMP_SCALE // (nl * nr)
            key = (s, feat, thr)
            if best is None or key < best:
                best = key
    got = decision_stump(df).collect()[0]
    assert (got.gini_scaled, got.feature, got.threshold) == best


def test_nb_learning_curve_monotone_on_separable_corpus(spark):
    """On the disjoint-vocabulary corpus the full-data point must hit
    100% accuracy, n_train must grow with folds, and every point
    scores the same fixed held-out fold."""
    from cloud_native_mapreduce_spark.operators.ml import (
        nb_learning_curve)

    vocab = {"aa": ["anna", "aalto", "arbor"],
             "bb": ["bruno", "basel", "borne"],
             "cc": ["ciara", "cadiz", "coral"]}
    rows, did = [], 0
    for lang, words in vocab.items():
        for i in range(10):
            rows.append((did, " ".join(words[(i + j) % 3]
                                       for j in range(6)), lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    pts = sorted((r.n_train_folds, r.n_train, r.n_test,
                  r.accuracy_bp)
                 for r in nb_learning_curve(docs).collect())
    assert [p[0] for p in pts] == [1, 2, 4]
    assert pts[0][1] < pts[1][1] < pts[2][1]
    assert len({p[2] for p in pts}) == 1
    assert pts[2][3] == 10000
