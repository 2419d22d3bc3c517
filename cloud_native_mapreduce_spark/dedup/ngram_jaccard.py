"""Exhaustive n-gram Jaccard near-dup pairs via an inverted index.

Unlike MinHash (probabilistic recall) this computes the EXACT set of pairs
with shingle-Jaccard >= threshold, using the standard inverted-index join:
explode shingles → posting-list self-join on the shingle → count shared
shingles per pair → Jaccard from |A∩B| and |A|+|B|. Deterministic and
SQL-expressible, so it gets a DuckDB oracle.

Physical shape (measured at sf0.1):
  * postings carry 64-bit shingle HASHES — fixed 8-byte join keys;
  * the shingle-hash table is persisted: columns referenced beside an
    explode re-evaluate their producing expression per EMITTED row, so
    without the barrier the tokenize+shingle+hash tree runs ~|shingles|
    times instead of |docs| times (6.7 s vs 0.6 s);
  * pair counting is a codegen'd shuffled hash self-join + hash
    aggregate (2.6 s) — the higher-order-function bucket-explosion
    alternative is interpreted per emitted struct and ran 7 s;
  * the Jaccard denominators attach at the END via two broadcast joins
    of the tiny (doc_id, n_sh) table against the already-aggregated
    pair set.

Scale posture: join cost is Σ |posting list|² over shingles, dominated
by common shingles — drop shingles with document frequency above
`max_df` (boilerplate cannot define near-dup identity anyway); that
turns the worst-case quadratic into a bounded cost of max_df² pairs per
shingle. The registry queries run with max_df=128, which is a no-op on
the test corpora (max observed df: 7 at sf0.01, 25 at sf0.1) so the
DuckDB oracle — which mirrors the identical cap — still hash-matches
exactly, while any boilerplate-heavy real corpus stays bounded. The
Jaccard denominators are the UNCAPPED shingle-set sizes on both sides
(capping only prunes the candidate join, never redefines similarity).
The (doc_id, n_sh) side outgrows a broadcast at extreme doc counts —
switch those two joins to shuffle joins then; the pair set is already
small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.dedup.minhash import doc_shingle_hashes


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    threshold: float = 0.5,
                    max_df: int | None = None,
                    dedup_identical: bool | str = "auto") -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with exact Jaccard >= threshold
    among pairs sharing >= 1 (non-capped) shingle.

    `dedup_identical`: canonicalize byte-identical texts BEFORE any
    shingle work. Jaccard is a pure function of text, so the
    posting-list self-join — the Σ df² cost center — runs on one
    representative per distinct text, and member pairs are expanded
    back afterwards through the duplicate groups. On a corpus where
    every doc has D exact copies this cuts pair-join work by D²
    (measured in the round-7 sf1 soak: 10× duplication sent the naive
    plan 415 s; canonicalized it tracks the DISTINCT corpus size).
    The df cap keeps its doc-level meaning: each representative's
    postings are weighted by its group size, so "df > max_df over
    DOCUMENTS" is computed without exploding duplicate postings, and
    identical-pair emission requires the representative to hold at
    least one non-capped shingle — byte-for-byte the naive semantics,
    which is why the unchanged DuckDB oracle still hash-matches.
    The default "auto" pays for canonicalization only when it wins:
    one cheap pre-aggregate of the membership-weighted duplication
    factor Σ gsz²/n (canonical.resolve) turns the machinery
    on at canonical.AUTO_RATIO, so a
    duplicate-free corpus runs the direct plan at zero premium while
    a duplicate-heavy one keeps the sf1 soak's quadratic immunity
    (both paths produce identical results for this exact operator —
    pinned by the differential test in tests/test_properties.py).
    NOTE: "auto" runs the gate's pre-aggregate as ONE eager Spark job
    at plan-construction time; the projected input is persisted first,
    so that job doubles as the cache materialization every downstream
    leg reuses — no second scan of an expensive upstream plan.
    """
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.dedup import canonical

    if dedup_identical == "auto":
        docs = (docs.select("doc_id", F.col(text_col))
                .persist(StorageLevel.MEMORY_AND_DISK))
    dedup_identical = canonical.resolve(
        docs, F.col(text_col), dedup_identical)
    if dedup_identical:
        # content identity = md5(text), the same convention exact dedup
        # ships on (dedup/exact.py). Hash AGGREGATE, not a window: no
        # sort over long text keys, map-side combine collapses
        # duplicates before the shuffle, and the representative corpus
        # falls out of the aggregate itself (first() over equal texts)
        keyed = docs.select("doc_id", F.col(text_col),
                            F.md5(F.col(text_col)).alias("_ckey"))
        groups = (keyed.groupBy("_ckey")
                  .agg(F.min("doc_id").alias("rep_id"),
                       F.count("*").alias("gsz"),
                       F.first(text_col).alias(text_col))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        rep_docs = groups.select(F.col("rep_id").alias("doc_id"),
                                 text_col)
        # members feeds FOUR join legs (cross a/b, intra a/b) — persist
        # or each leg recomputes the scan+agg+join pipeline
        members = (keyed.select("doc_id", "_ckey")
                   .join(groups.select("_ckey", "rep_id"), "_ckey")
                   .select("doc_id", "rep_id")
                   .persist(StorageLevel.MEMORY_AND_DISK))
        gsz = groups.select("rep_id", "gsz")
    else:
        rep_docs = docs.select("doc_id", F.col(text_col))
        members = gsz = None

    sh = (doc_shingle_hashes(rep_docs, text_col)
          .persist(StorageLevel.MEMORY_AND_DISK))
    posting = sh.select("doc_id", F.explode("sh_h").alias("shingle"))
    if max_df is not None:
        if dedup_identical:
            # document-level df = Σ group sizes over reps holding the
            # shingle — the cap keeps its corpus meaning without
            # exploding duplicate postings
            # keyed join (AQE broadcasts it at test scale; at corpus
            # scale the group-size side is |distinct texts| rows and
            # shuffles on the rep key like any dimension)
            dfs = (posting
                   .join(gsz, posting.doc_id == gsz.rep_id)
                   .groupBy("shingle").agg(F.sum("gsz").alias("df")))
        else:
            dfs = (posting.groupBy("shingle")
                   .agg(F.count("*").alias("df")))
        hot = dfs.where(F.col("df") > max_df).select("shingle")
        posting = posting.join(F.broadcast(hot), "shingle", "left_anti")
    a = posting.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = posting.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (a.join(b, "shingle")
              .where(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("n_shared")))
    sizes = sh.select("doc_id", F.size("sh_h").alias("n_sh"))
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"),
                        F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"),
                        F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    rep_pairs = (shared
                 .join(F.broadcast(sz_a), "doc_a")
                 .join(F.broadcast(sz_b), "doc_b")
                 .select("doc_a", "doc_b",
                         F.round(jac, 4).alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))
    if not dedup_identical:
        return rep_pairs

    memb = members.select("doc_id", "rep_id")
    # cross-group expansion: every member pair inherits its reps'
    # jaccard (identical shingle sets); keyed joins on rep ids
    ma = memb.select(F.col("rep_id").alias("doc_a"),
                     F.col("doc_id").alias("da"))
    mb = memb.select(F.col("rep_id").alias("doc_b"),
                     F.col("doc_id").alias("db"))
    cross = (rep_pairs.join(ma, "doc_a").join(mb, "doc_b")
             .select(F.least("da", "db").alias("doc_a"),
                     F.greatest("da", "db").alias("doc_b"),
                     "jaccard"))
    # intra-group pairs are byte-identical texts, but their jaccard is
    # NOT automatically 1.0 under a df cap: the naive plan counts only
    # surviving (non-capped) shared shingles c against UNCAPPED set
    # sizes n, so J = c / (2n - c) — 1.0 exactly iff nothing was capped
    # (caught by the differential test; a J=1.0 shortcut diverges the
    # moment any of the pair's shingles crosses max_df)
    cold = posting.groupBy("doc_id").agg(F.count("*").alias("c"))
    rep_intra = (cold.join(sizes, "doc_id")
                 .select(F.col("doc_id").alias("rep_id"),
                         F.round(F.col("c")
                                 / (2 * F.col("n_sh") - F.col("c")), 4)
                         .alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))
    dup_groups = memb.join(rep_intra, "rep_id")
    ia = dup_groups.select("rep_id", "jaccard",
                           F.col("doc_id").alias("da"))
    ib = dup_groups.select("rep_id", F.col("doc_id").alias("db"))
    intra = (ia.join(ib, "rep_id")
             .where(F.col("da") < F.col("db"))
             .select(F.col("da").alias("doc_a"),
                     F.col("db").alias("doc_b"),
                     "jaccard"))
    return cross.unionByName(intra)


def containment_pairs(docs: DataFrame, text_col: str = "text",
                      threshold: float = 0.8,
                      max_df: int | None = None,
                      dedup_identical: bool | str = "auto") -> DataFrame:
    """ORDERED pairs (doc_src, doc_tgt, containment) with shingle
    containment C(src→tgt) = |S_src ∩ S_tgt| / |S_src| >= threshold.

    Containment is the asymmetric cousin of Jaccard: a short document
    quoted wholesale inside a long one scores C ≈ 1 while Jaccard stays
    low — the sub-document duplication / quotation-detection signal
    (Broder's original resemblance-vs-containment pair). Same inverted-
    index shape and df cap as `near_duplicates`; both directions of
    each unordered candidate are scored, so every pair costs one join
    row, not two. The same round-7 duplication-immunity rule applies:
    identical texts are canonicalized first and member pairs expand
    back (intra-group containment is c/n over surviving shingles — the
    capped-shingle analogue of the jaccard c/(2n−c) lesson), gated
    adaptively like `near_duplicates`: "auto" canonicalizes only at
    duplication factor >= canonical.AUTO_RATIO (one eager gate job at
    plan-construction time over the persisted projected input — the
    same amortization note as `near_duplicates`).
    """
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.dedup import canonical

    if dedup_identical == "auto":
        docs = (docs.select("doc_id", F.col(text_col))
                .persist(StorageLevel.MEMORY_AND_DISK))
    dedup_identical = canonical.resolve(
        docs, F.col(text_col), dedup_identical)
    if dedup_identical:
        keyed = docs.select("doc_id", F.col(text_col),
                            F.md5(F.col(text_col)).alias("_ckey"))
        groups = (keyed.groupBy("_ckey")
                  .agg(F.min("doc_id").alias("rep_id"),
                       F.count("*").alias("gsz"),
                       F.first(text_col).alias(text_col))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        rep_docs = groups.select(F.col("rep_id").alias("doc_id"),
                                 text_col)
        members = (keyed.select("doc_id", "_ckey")
                   .join(groups.select("_ckey", "rep_id"), "_ckey")
                   .select("doc_id", "rep_id")
                   .persist(StorageLevel.MEMORY_AND_DISK))
        gsz = groups.select("rep_id", "gsz")
    else:
        rep_docs = docs.select("doc_id", F.col(text_col))
        members = gsz = None

    sh = (doc_shingle_hashes(rep_docs, text_col)
          .persist(StorageLevel.MEMORY_AND_DISK))
    posting = sh.select("doc_id", F.explode("sh_h").alias("shingle"))
    if max_df is not None:
        if dedup_identical:
            dfs = (posting
                   .join(gsz, posting.doc_id == gsz.rep_id)
                   .groupBy("shingle").agg(F.sum("gsz").alias("df")))
        else:
            dfs = (posting.groupBy("shingle")
                   .agg(F.count("*").alias("df")))
        hot = dfs.where(F.col("df") > max_df).select("shingle")
        posting = posting.join(F.broadcast(hot), "shingle", "left_anti")
    a = posting.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = posting.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (a.join(b, "shingle")
              .where(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("n_shared")))
    sizes = sh.select("doc_id", F.size("sh_h").alias("n_sh"))
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"),
                        F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"),
                        F.col("n_sh").alias("n_b"))
    both = (shared
            .join(F.broadcast(sz_a), "doc_a")
            .join(F.broadcast(sz_b), "doc_b"))
    # score both directions from the one unordered candidate row
    fwd = both.select(F.col("doc_a").alias("doc_src"),
                      F.col("doc_b").alias("doc_tgt"),
                      F.round(F.col("n_shared") / F.col("n_a"), 4)
                      .alias("containment"))
    rev = both.select(F.col("doc_b").alias("doc_src"),
                      F.col("doc_a").alias("doc_tgt"),
                      F.round(F.col("n_shared") / F.col("n_b"), 4)
                      .alias("containment"))
    rep_pairs = (fwd.unionByName(rev)
                 .where(F.col("containment") >= threshold))
    if not dedup_identical:
        return rep_pairs

    memb = members.select("doc_id", "rep_id")
    ma = memb.select(F.col("rep_id").alias("doc_src"),
                     F.col("doc_id").alias("ids"))
    mb = memb.select(F.col("rep_id").alias("doc_tgt"),
                     F.col("doc_id").alias("idt"))
    cross = (rep_pairs.join(ma, "doc_src").join(mb, "doc_tgt")
             .select(F.col("ids").alias("doc_src"),
                     F.col("idt").alias("doc_tgt"),
                     "containment"))
    # intra-group: identical sets, containment = c/n over surviving
    # shingles (NOT a 1.0 shortcut — same capped-shingle lesson as
    # near_duplicates' c/(2n−c))
    cold = posting.groupBy("doc_id").agg(F.count("*").alias("c"))
    rep_intra = (cold.join(sizes, "doc_id")
                 .select(F.col("doc_id").alias("rep_id"),
                         F.round(F.col("c") / F.col("n_sh"), 4)
                         .alias("containment"))
                 .where(F.col("containment") >= threshold))
    dup = memb.join(rep_intra, "rep_id")
    ia = dup.select("rep_id", "containment",
                    F.col("doc_id").alias("ids"))
    ib = dup.select("rep_id", F.col("doc_id").alias("idt"))
    intra = (ia.join(ib, "rep_id")
             .where(F.col("ids") != F.col("idt"))
             .select(F.col("ids").alias("doc_src"),
                     F.col("idt").alias("doc_tgt"),
                     "containment"))
    return cross.unionByName(intra)
