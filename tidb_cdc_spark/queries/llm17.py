"""Seventeenth wave: the composed near-dup-collapse → winnow
pipeline — the documented mitigation for winnowing's inherent
quadratic pair output on large near-dup families, shipped as a
declared, measured operator.

Background (NOTES.md r8 scaling curve): ``winnow_overlap`` emits a
pair row for EVERY co-fingerprinted document pair — on a ~100-member
near-dup family that is ~5,000 rows per family by the w+k−1
guarantee itself (27.2M pair rows at the 100× rehearsal). The
guarantee is the point of winnowing (Schleimer et al. SIGMOD'03), so
the fix is not a cap but ORDER OF OPERATIONS: collapse near-dup
families FIRST (star-LSH pairs → connected components → min-id
representatives — all linear in family size), then winnow only the
representatives. Cross-family local overlap (boilerplate, quotes,
licence headers) is preserved — within-family overlap was redundant
by construction.

Oracle strategy (queries/audits.py conventions): MinHash banding is
xxhash64-based, not SQL-expressible, so the raw composed output is
rows-only; ``winnow_repr_audit`` is the hash-green driver row — it
plants exact copies and emits per-doc booleans TRUE by algorithm
structure, each computed from the pipeline's actual output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import clusters as C
from tidb_cdc_spark.functions import dedup as D
from tidb_cdc_spark.functions.winnow import winnow_overlap
from tidb_cdc_spark.queries.audits import _N_DOCS, _docs_with_copies
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.queries.llm3 import _md5_bucket_sql

# Winnow shingle tokens / window. k=4 (guarantee on w+k−1 = 7-token
# shared runs) rather than llm14's k=8: after family collapse the
# op's signal is CROSS-family boilerplate, which is shorter than the
# within-family overlap the k=8 pair query targets — at sf0.01, k=8
# leaves 0 cross-family pairs (vacuous output) while k=4 surfaces 97.
_WK, _WW = 4, 4


def _repr_docs(d: DataFrame, max_bucket_size: int | None = None) -> DataFrame:
    """Collapse near-dup families to their min-id representative and
    return the representative documents only.

    Every stage is linear in family size: star pairs emit b−1 rows
    per b-sized band bucket (functions/dedup.py), connected
    components is the hash-min/path-halving loop (functions/
    clusters.py — O(log d) rounds, per-round checkpoint truncation),
    and the representative filter is a projection of the CC output.
    The join back to documents is an equi-join on doc_id; text never
    shuffles through the LSH/CC stages (ids-only slim tables).

    ``max_bucket_size`` defaults to None (uncapped) — the clique
    form's cap exists to bound its QUADRATIC per-bucket emission,
    but star pairs are linear per bucket, and a cap here would
    silently skip collapsing exactly the >cap-member families this
    pipeline exists to collapse, handing the quadratic blowup back
    to the winnow stage (review catch).

    r14 note: an anti-join formulation (docs LEFT ANTI the CC rows
    with id ≠ cluster_id) produces the IDENTICAL survivor set with
    one join fewer, but measured consistently SLOWER here (8.6 s vs
    6.8–7.4 s interleaved at sf0.1) — the inner join against the
    slim representative-id frame lets AQE broadcast the small side
    and reuse the fan-out layout cleanly, so the original shape is
    kept deliberately."""
    reps = _collapse_reps(d, max_bucket_size)
    return d.join(
        reps.filter(F.col("is_representative")).select("doc_id"), "doc_id"
    )


def _collapse_reps(
    d: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """The ONE copy of the family-collapse recipe (star-LSH pairs →
    connected components → per-doc labels with is_representative):
    both the declared pipelines (via ``_repr_docs``) and their
    audits (via ``_collapse_audit_parts``) build representatives
    through this function, so a recipe change (LSH params, capping,
    normalization) cannot leave the audits certifying a
    representative set the real pipelines no longer produce
    (review catch — there were briefly three hand-kept copies)."""
    pairs = D.minhash_lsh_star_pairs(
        d, max_bucket_size=max_bucket_size, with_jaccard=False
    )
    return C.cluster_representatives(d, pairs)


def winnow_repr_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed local-overlap pairs over near-dup-collapsed
    representatives: star-LSH → connected components → min-id
    representative per family → ``winnow_overlap`` on the survivors.

    The composed op keeps winnowing's w+k−1 structural guarantee for
    CROSS-family overlap while removing the within-family quadratic
    pair output the r8 100× curve measured (27.2M rows → the star/CC
    stages are linear and the winnow self-join no longer sees
    families). Rows-only (MinHash banding is not SQL-expressible);
    the driver-green contract is ``winnow_repr_audit`` and the
    synthetic-corpus equivalence test in tests/test_winnow_repr.py.
    """
    return winnow_overlap(
        _repr_docs(_docs(spark, sf_dir)), k=_WK, w=_WW, min_shared=1
    ).orderBy("id_a", "id_b")


def _collapse_audit_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[int, DataFrame, DataFrame]:
    """Shared machinery of the composed-pipeline audits
    (``winnow_repr_audit``, ``containment_repr_audit`` — review
    catch: two hand-kept copies of this block WILL diverge):
    ``(off, rep_docs, copies)`` where ``rep_docs`` is the actual
    representative-document set the downstream op runs over — built
    through the SAME ``_collapse_reps`` recipe the declared
    pipelines use (uncapped star banding so the copy-collapses-
    deterministically precondition holds at any scale factor) — and
    ``copies`` the per-planted-copy boolean frame
    (doc_id, collapsed, rep_is_original)."""
    d, off = _docs_with_copies(spark, sf_dir)
    reps = _collapse_reps(d, max_bucket_size=None)
    rep_docs = d.join(
        reps.filter(F.col("is_representative")).select("doc_id"), "doc_id"
    )
    copies = reps.filter(
        (F.col("doc_id") >= F.lit(off))
        & (F.col("doc_id") < F.lit(off) + _N_DOCS)
    ).select(
        (F.col("doc_id") - F.lit(off)).alias("doc_id"),
        (~F.col("is_representative")).alias("collapsed"),
        (F.col("cluster_id") < F.lit(off)).alias("rep_is_original"),
    )
    return off, rep_docs, copies


def _exclusion_flag(
    copies: DataFrame, pair_ids: DataFrame, off: int, flag_name: str
) -> DataFrame:
    """Append ``flag_name`` to the copy booleans: TRUE iff the copy's
    id appears in NO row of ``pair_ids`` (one ``_id`` column — the
    distinct ids touched by the downstream op's actual output)."""
    hits = pair_ids.select(
        (F.col("_id") - F.lit(off)).alias("doc_id"),
        F.lit(True).alias("_in"),
    ).filter(F.col("doc_id") >= 0)
    return copies.join(hits, "doc_id", "left").select(
        "doc_id",
        "collapsed",
        "rep_is_original",
        F.coalesce(~F.col("_in"), F.lit(True)).alias(flag_name),
    )


def _pair_ids(pairs: DataFrame) -> DataFrame:
    """Distinct ids appearing on either side of a pair output."""
    return (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
    )


def winnow_repr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy contract for the composed pipeline, one row per
    planted original, three booleans TRUE by construction:

    - ``collapsed`` — the exact copy is NOT a representative: it
      shares every band bucket with its original, so some hub
      h < copy emits a star pair and CC assigns the copy a label
      ≤ h < copy (uncapped banding — ``max_bucket_size=None`` — so
      the precondition of ``dedup_minhash_star_audit`` holds at any
      scale factor);
    - ``rep_is_original`` — the copy's cluster label is an ORIGINAL
      id: every bucket holding a copy also holds its original
      (identical signature), so bucket minima — and hence CC labels,
      which are minima over bucket minima — are always < off;
    - ``excluded_from_winnow`` — the copy's id appears in NO pair of
      the downstream winnow output (computed from the actual
      ``winnow_overlap`` run over the representatives, not assumed
      from ``collapsed``)."""
    off, rep_docs, copies = _collapse_audit_parts(spark, sf_dir)
    w = winnow_overlap(rep_docs, k=_WK, w=_WW, min_shared=1)
    return _exclusion_flag(
        copies, _pair_ids(w), off, "excluded_from_winnow"
    ).orderBy("doc_id")


_REPR_AUDIT_SQL = f"""
SELECT doc_id, TRUE AS collapsed, TRUE AS rep_is_original,
       TRUE AS excluded_from_winnow
FROM documents WHERE doc_id < {_N_DOCS} ORDER BY doc_id
"""


# ------------------------------------ stupid-backoff LM scoring


def corpus_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based perplexity filtering, engine-native: train a
    trigram LM with stupid backoff (Brants et al. EMNLP 2007) on the
    even-doc_id half of the corpus, score the held-out odd half in
    exact whole bits (functions/lm.py::stupid_backoff_score — α=1/4
    so every backoff level is exactly 2 bits and the score stays
    integral/hash-exact). The held-out split makes the backoff path
    REAL: unseen trigrams/bigrams/OOV all occur. High mean_mbits =
    improbable under the trusted slice — the CCNet/quality-filter
    ranking signal, with no external model artifact."""
    from tidb_cdc_spark.functions.lm import stupid_backoff_score

    d = _docs(spark, sf_dir)
    return stupid_backoff_score(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
    ).orderBy("doc_id")


_SB_SQL = r"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, l, len(l) AS n FROM tl),
c1 AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(l) AS w FROM tln WHERE doc_id % 2 = 0) GROUP BY w
),
ntot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1),
c2 AS (
  SELECT w1, w2, COUNT(*) AS c
  FROM (
    SELECT l[i] AS w1, l[i + 1] AS w2
    FROM (SELECT l, unnest(range(1, n)) AS i
          FROM tln WHERE doc_id % 2 = 0 AND n >= 2)
  ) GROUP BY 1, 2
),
c3 AS (
  SELECT w1, w2, w3, COUNT(*) AS c
  FROM (
    SELECT l[i] AS w1, l[i + 1] AS w2, l[i + 2] AS w3
    FROM (SELECT l, unnest(range(1, n - 1)) AS i
          FROM tln WHERE doc_id % 2 = 0 AND n >= 3)
  ) GROUP BY 1, 2, 3
),
sc AS (
  SELECT doc_id, w1, w2, w3, COUNT(*) AS tf
  FROM (
    SELECT doc_id, l[i] AS w1, l[i + 1] AS w2, l[i + 2] AS w3
    FROM (SELECT doc_id, l, unnest(range(1, n - 1)) AS i
          FROM tln WHERE doc_id % 2 = 1 AND n >= 3)
  ) GROUP BY 1, 2, 3, 4
),
b AS (
  SELECT sc.doc_id, sc.tf,
    CASE
      WHEN c3.c IS NOT NULL
        THEN length(bin(c2a.c)) - length(bin(c3.c))
      WHEN c2b.c IS NOT NULL
        THEN 2 + length(bin(c1b.c)) - length(bin(c2b.c))
      WHEN c1c.c IS NOT NULL
        THEN 4 + length(bin(ntot.n)) - length(bin(c1c.c))
      ELSE 4 + length(bin(ntot.n)) - 1
    END AS bits
  FROM sc
  LEFT JOIN c3 ON c3.w1 = sc.w1 AND c3.w2 = sc.w2 AND c3.w3 = sc.w3
  LEFT JOIN c2 c2a ON c2a.w1 = sc.w1 AND c2a.w2 = sc.w2
  LEFT JOIN c2 c2b ON c2b.w1 = sc.w2 AND c2b.w2 = sc.w3
  LEFT JOIN c1 c1b ON c1b.w = sc.w2
  LEFT JOIN c1 c1c ON c1c.w = sc.w3
  CROSS JOIN ntot
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_trigrams,
       CAST(SUM(tf * bits) AS BIGINT) AS sum_bits,
       CAST((SUM(tf * bits) * 1000000) // SUM(tf) AS BIGINT) AS mean_mbits
FROM b GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------- n-gram containment pairs


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed subset/quotation detection over distinct 5-gram sets
    (functions/dedup.py::ngram_containment_pairs — Broder 1997's
    asymmetric companion to Jaccard): pairs where ≥90% of one doc's
    shingles appear in the other. md5-keyed shingles make this the
    fuzzy family's one RAW pair op with a full value-level DuckDB
    oracle (the xxhash64 ops are audit-gated instead)."""
    from tidb_cdc_spark.functions.dedup import ngram_containment_pairs

    return ngram_containment_pairs(_docs(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


_CONTAIN_K = 5
#: shared CTE prefix: tokenize → shingle md5s → viral cap → per-doc
#: set sizes (ends with the ``sized`` CTE — append more CTEs with a
#: leading comma)
_SHINGLE_CTE = rf"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, l, len(l) AS n FROM tl),
sh AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(l[i : i + {_CONTAIN_K} - 1], ' ')) AS g
  FROM (
    SELECT doc_id, l, unnest(range(1, n - {_CONTAIN_K} + 2)) AS i
    FROM tln WHERE n >= {_CONTAIN_K}
  )
  UNION
  -- 0 <= n < k: ONE whole-doc shingle, incl. the empty-string
  -- sentinel for n = 0 (family convention: empty docs pair)
  SELECT DISTINCT doc_id, md5(array_to_string(l, ' ')) AS g
  FROM tln WHERE n < {_CONTAIN_K}
),
freq AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
kept AS (SELECT sh.* FROM sh JOIN freq USING (g) WHERE df <= 1000),
sized AS (
  SELECT doc_id, g, COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM kept
)"""

_CONTAIN_SQL = _SHINGLE_CTE + """,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM sized a JOIN sized b USING (g)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT id_a, id_b, n_a, n_b, common,
         ROUND(CAST(common AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
           AS cont_a_in_b,
         ROUND(CAST(common AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
           AS cont_b_in_a
  FROM pairs
)
SELECT id_a, id_b, n_a, n_b, common, cont_a_in_b, cont_b_in_a
FROM scored
WHERE cont_a_in_b >= 0.9 OR cont_b_in_a >= 0.9
ORDER BY id_a, id_b
"""


# --------------------------- containment-based decontamination


def contamination_containment_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval-set decontamination by CONTAINMENT (the refinement of
    ``contamination_eval_overlap``'s raw n-gram counts, over the
    IDENTICAL eval set — the md5-bucket 10% slice with salt 'eval',
    llm4's contract; a %-of-id slice would screen a different eval
    set than the one the overlap op audits — review catch): report
    every (eval_doc, train_doc) pair where ≥80% of the eval doc's
    distinct 5-gram shingles appear in the train doc — the decision
    rule that catches an eval item pasted into a longer training
    document, which symmetric overlap ratios dilute.

    Scale (review catch #2): the join is DIRECTED from the start —
    only the ~10% eval side self-joins against the train side, so
    the inverted-index join emits no train×train or eval×eval rows
    (~81% of the symmetric op's output, discarded post-hoc in the
    first formulation). The viral-shingle cap and set sizes stay
    corpus-wide, so the containment values equal the symmetric op's
    for the same pairs."""
    from tidb_cdc_spark.functions.sampling import hash_bucket
    from tidb_cdc_spark.functions.text import shingle_string_rows
    from tidb_cdc_spark.session import materialize

    d = _docs(spark, sf_dir)
    dist = (
        shingle_string_rows(d, "doc_id", "text", k=_CONTAIN_K)
        .select("_id", F.md5("_sh").alias("_g"))
        .dropDuplicates(["_id", "_g"])
    )
    viral = (
        dist.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > 1000)
        .select("_g")
    )
    from pyspark.sql import Window

    sized = materialize(
        dist.join(F.broadcast(viral), "_g", "left_anti").select(
            "_id",
            F.count(F.lit(1)).over(Window.partitionBy("_id")).alias("_n"),
            "_g",
        )
    )
    is_eval = hash_bucket(F.col("_id"), "eval") < int(0.10 * 4294967296)
    ev = sized.filter(is_eval).select(
        F.col("_id").alias("eval_id"), F.col("_n").alias("_ne"), "_g"
    )
    tr = sized.filter(~is_eval).select(F.col("_id").alias("train_id"), "_g")
    j = (
        ev.join(tr, "_g")
        .groupBy("eval_id", "train_id", "_ne")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    cont = F.round(
        F.col("_common").cast("double") / F.col("_ne").cast("double"), 6
    )
    return (
        j.select("eval_id", "train_id", cont.alias("containment"))
        .filter(F.col("containment") >= 0.8)
        .orderBy("eval_id", "train_id")
    )


_DECONTAM_SQL = _SHINGLE_CTE + f""",
ev AS (
  SELECT doc_id AS eval_id, n AS n_eval, g FROM sized
  WHERE {_md5_bucket_sql("doc_id", "eval")} < {int(0.10 * 4294967296)}
),
tr AS (
  SELECT doc_id AS train_id, g FROM sized
  WHERE NOT ({_md5_bucket_sql("doc_id", "eval")} < {int(0.10 * 4294967296)})
),
j AS (
  SELECT eval_id, train_id, CAST(n_eval AS BIGINT) AS n_eval,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM ev JOIN tr USING (g)
  GROUP BY 1, 2, 3
)
SELECT eval_id, train_id,
       ROUND(CAST(common AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
         AS containment
FROM j
WHERE ROUND(CAST(common AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) >= 0.8
ORDER BY eval_id, train_id
"""


# --------------------- LM-scored head/middle/tail buckets (r10)


def corpus_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's ACTUAL pipeline shape (Wenzek et al. 2020), composed
    from two existing operators: train the trusted-slice LM and
    score the held-out half (``stupid_backoff_score`` — even docs
    train, odd docs score, exactly ``corpus_lm_stupid_backoff``'s
    split), then rank the scored docs and cut head/middle/tail
    (``rank_buckets`` — the banded two-level prefix scan extracted
    from ``surprisal_buckets``). Head = lowest surprisal under the
    trusted model = the slice a pretraining mix up-weights;
    ``corpus_perplexity_buckets`` is the self-scored bigram variant,
    this is the MODEL-BASED one (real backoff paths: unseen
    trigrams, OOV).

    Whole-bit integral scores + integral rank/bucket formula ⇒ the
    whole composition stays hash-exact. Plan shape: the scorer's
    output is materialized ONCE inside ``rank_buckets`` — the
    min/max/count aggregate and the ranked output read that single
    pass, so the 3-join corpus-scale scoring never runs twice
    (pinned in tests/test_plans.py)."""
    from tidb_cdc_spark.functions.lm import rank_buckets, stupid_backoff_score

    d = _docs(spark, sf_dir)
    scored = stupid_backoff_score(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
    ).select("doc_id", "mean_mbits")
    return (
        rank_buckets(scored, n_buckets=3)
        .select(
            "doc_id",
            "mean_mbits",
            "rank",
            "bucket",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("bucket") + 1,
            ).alias("band"),
        )
        .orderBy("rank")
    )


_LM_BUCKETS_SQL = f"""
WITH base AS ({_SB_SQL}),
r AS (
  SELECT doc_id, mean_mbits,
         CAST(ROW_NUMBER() OVER (ORDER BY mean_mbits, doc_id)
              AS BIGINT) AS rank,
         COUNT(*) OVER () AS n
  FROM base
)
SELECT doc_id, mean_mbits, rank,
       CAST(((rank - 1) * 3) // n AS INTEGER) AS bucket,
       CASE CAST(((rank - 1) * 3) // n AS INTEGER)
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
       END AS band
FROM r ORDER BY rank
"""


# ------------------------- containment over representatives (r10)


def dedup_containment_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs over near-dup-collapsed representatives —
    the composed mitigation ``ngram_containment_pairs``' docstring
    prescribes (functions/dedup.py), shipped as a declared operator
    exactly like ``winnow_repr_pipeline``: star-LSH → connected
    components → min-id representative per family → containment on
    the survivors.

    Why: containment, like every raw pair op here, inherently emits
    ~s·b(b−1)/2 join rows on a b-member near-dup family (the r9 100×
    rehearsal measured 1.7 s → 4.4 s → memory pressure). Family
    members are mutual near-supersets, so their containment pairs
    are redundant by construction; the relation that MATTERS at
    corpus scale — a doc quoted inside an unrelated wrapper — is
    CROSS-family and survives the collapse (pinned by
    tests/test_containment_repr.py on a synthetic corpus where the
    expected answer is computable exactly). Rows-only (MinHash
    banding is not SQL-expressible); the driver-green contract is
    ``containment_repr_audit``.

    MEASURED at sf0.001/sf0.01: output is correctly EMPTY — every
    raw containment pair in the testdata (28 / 25 rows) is within a
    near-dup family the collapse removes, and the residual
    cross-representative containment tops out at 0.27 even at
    shingle_k=3 (0.14 at k=4). An empty result is the operator
    working: after dedup, this corpus has no subset/quotation
    relations left to report. The thresholds stay IDENTICAL to
    ``dedup_containment_pairs`` (same op, collapsed input) rather
    than being lowered until rows appear; the audit and the
    synthetic-corpus tests carry the non-vacuous evidence."""
    from tidb_cdc_spark.functions.dedup import ngram_containment_pairs

    # r15 (guide §2.3): this composed pipeline is ROWS-ONLY (the
    # oracle twin is ``containment_repr_audit``), and containment
    # output depends only on shingle-set identity — so it rides the
    # 8-byte xxhash64 shingle keys instead of 32-byte md5 hex
    # strings. The value-oracled ``dedup_containment_pairs`` keeps
    # md5 (the documented DuckDB-mirroring contract). Row-identity
    # of the two keyings is pinned in tests/test_containment.py.
    return ngram_containment_pairs(
        _repr_docs(_docs(spark, sf_dir)), shingle_key="xxh64"
    ).orderBy("id_a", "id_b")


#: subset-probe spine needs ceil(n/2) ≥ k so the half-doc subset
#: still has regular k-gram shingles (all ⊆ the original's)
_SUBSET_MIN_TOKENS = 2 * _CONTAIN_K


def containment_repr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted contract for the composed containment pipeline — one
    row per probe doc (doc_id < ``_N_DOCS`` with ≥ ``2k`` tokens, a
    spine both engines compute identically), four booleans TRUE by
    construction:

    - ``collapsed`` / ``rep_is_original`` — identical guarantees to
      ``winnow_repr_audit`` (exact copy shares every band bucket ⇒
      star pair ⇒ CC label < copy id, and bucket minima are always
      original ids);
    - ``excluded_from_containment`` — the copy's id appears in NO
      pair of the downstream composed containment output (computed
      from the actual run over the representatives: non-
      representatives are filtered before the op by construction);
    - ``subset_pair_exact`` — the asymmetric-detection semantics the
      op exists for: a planted HALF-DOC (first ⌈n/2⌉ tokens, so its
      distinct shingles are a strict subset of the original's) is
      found by the RAW op at ``cont_b_in_a`` exactly 1.0. Run with
      ``max_doc_freq=None`` over just probes ∪ subsets: with no
      pruning, kept(S) ⊆ kept(O) unconditionally, so the ratio is
      1.0 by set algebra, not by luck (pruning behavior is already
      value-oracled by ``dedup_containment_pairs``)."""
    from tidb_cdc_spark.functions.dedup import ngram_containment_pairs
    from tidb_cdc_spark.functions.text import token_count, tokens

    spine = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < _N_DOCS)
        .withColumn("_n", token_count(F.lower(F.col("text"))))
        .filter(F.col("_n") >= _SUBSET_MIN_TOKENS)
    )

    # composed-pipeline booleans over the full corpus + exact copies
    # (same xxh64 shingle keying as the declared pipeline it audits)
    off, rep_docs, copies = _collapse_audit_parts(spark, sf_dir)
    cont = ngram_containment_pairs(rep_docs, shingle_key="xxh64")
    composed = _exclusion_flag(
        copies, _pair_ids(cont), off, "excluded_from_containment"
    )

    # raw-op subset probe: probes ∪ their half-doc subsets, no cap
    toks = tokens(F.lower(F.col("text")))
    subsets = spine.select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, ((F.col("_n") + 1) / 2).cast("int"))
        ).alias("text"),
    )
    probe_corpus = spine.select("doc_id", "text").unionByName(subsets)
    raw = ngram_containment_pairs(probe_corpus, max_doc_freq=None)
    subset_hit = (
        raw.filter(F.col("id_b") == F.col("id_a") + F.lit(off))
        .filter(F.col("cont_b_in_a") == 1.0)
        .select(F.col("id_a").alias("doc_id"), F.lit(True).alias("_sub"))
    )

    return (
        spine.select("doc_id")
        .join(composed, "doc_id", "left")
        .join(subset_hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("collapsed", F.lit(False)).alias("collapsed"),
            F.coalesce("rep_is_original", F.lit(False)).alias(
                "rep_is_original"
            ),
            F.coalesce("excluded_from_containment", F.lit(False)).alias(
                "excluded_from_containment"
            ),
            F.coalesce("_sub", F.lit(False)).alias("subset_pair_exact"),
        )
        .orderBy("doc_id")
    )


_CONTAIN_REPR_AUDIT_SQL = rf"""
SELECT doc_id, TRUE AS collapsed, TRUE AS rep_is_original,
       TRUE AS excluded_from_containment, TRUE AS subset_pair_exact
FROM documents
WHERE doc_id < {_N_DOCS}
  AND len(list_filter(string_split_regex(lower(text), '\s+'),
                      x -> x <> '')) >= {_SUBSET_MIN_TOKENS}
ORDER BY doc_id
"""


QUERIES = {
    "winnow_repr_pipeline": winnow_repr_pipeline,
    "winnow_repr_audit": winnow_repr_audit,
    "corpus_lm_stupid_backoff": corpus_lm_stupid_backoff,
    "dedup_containment_pairs": dedup_containment_pairs,
    "contamination_containment_screen": contamination_containment_screen,
    "dedup_containment_repr": dedup_containment_repr,
    "containment_repr_audit": containment_repr_audit,
    "corpus_lm_quality_buckets": corpus_lm_quality_buckets,
}

ORACLE = {
    "winnow_repr_audit": _REPR_AUDIT_SQL,
    "corpus_lm_stupid_backoff": _SB_SQL,
    "dedup_containment_pairs": _CONTAIN_SQL,
    "contamination_containment_screen": _DECONTAM_SQL,
    "containment_repr_audit": _CONTAIN_REPR_AUDIT_SQL,
    "corpus_lm_quality_buckets": _LM_BUCKETS_SQL,
}
