"""Linear quality/source classifier over hashed text features — the
fastText/CCNet-style filter archetype: train a cheap linear model to
distinguish a curated source from the crawl, score every document,
keep the ones that look curated (Brown et al. 2020 §A.2 describe
exactly this shape for GPT-3's quality filter; public literature).

Spark-first: features are the engine's feature-hashed TF vectors
(functions/feature_hash.py — no vocabulary, no model), training is
MLlib LogisticRegression (distributed LBFGS), the split is the
repo's deterministic md5 hash split (functions/sampling.py) so
train/eval membership is reproducible in any engine. Scoring is one
MLlib transform — a broadcast coefficient matrix over the scan.

Rows-only at the driver (iterative LBFGS is not SQL-expressible);
correctness is pinned by tests: separable planted data reaches ~1.0
accuracy, and held-out accuracy must beat the majority-class
baseline on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.functions.feature_hash import hashed_tf_dense
from tidb_cdc_spark.functions.sampling import hash_bucket

_TRAIN_FRACTION = 0.8


def source_classifier_eval(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    seed: int = 7,
) -> DataFrame:
    """Train a multinomial logistic regression to predict
    ``label_col`` from hashed-TF features on a deterministic 80%
    split; return per-label held-out metrics plus the overall row:
    (label, n_eval, n_correct, accuracy_ppm) with label='__all__'
    aggregating everything — integral counts, ppm accuracy.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.functions import array_to_vector

    from tidb_cdc_spark.session import materialize

    feats = hashed_tf_dense(docs, dim, id_col, text_col).join(
        docs.select(id_col, label_col), id_col
    )
    # materialized: the indexer fit, the LBFGS iterations, and the
    # held-out transform would each re-execute the tokenize+hash+
    # densify pipeline otherwise
    feats = materialize(
        feats.withColumn("_fv", array_to_vector(F.col("embedding")))
    )
    idx = StringIndexer(
        inputCol=label_col, outputCol="_y", stringOrderType="alphabetAsc"
    ).fit(feats)
    feats = idx.transform(feats)
    is_train = hash_bucket(F.col(id_col)) < int(_TRAIN_FRACTION * (1 << 32))
    train, test = feats.filter(is_train), feats.filter(~is_train)
    # an empty side would make lr.fit raise opaquely (train) or the
    # '__all__' row read 0 div 0 = NULL (eval) — fail loudly instead;
    # feats is materialized, so these counts reread cached blocks
    if train.isEmpty() or test.isEmpty():
        raise ValueError(
            "source_classifier_eval: the deterministic hash split left "
            "the train or eval side empty — corpus too small for an "
            "80/20 split"
        )
    lr = LogisticRegression(
        featuresCol="_fv", labelCol="_y", maxIter=20, regParam=0.01
    )
    model = lr.fit(train)
    pred = model.transform(test).select(
        label_col,
        (F.col("prediction") == F.col("_y")).cast("int").alias("_ok"),
    )
    per_label = pred.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("_ok").cast("long").alias("n_correct"),
    )
    overall = pred.agg(
        F.lit("__all__").alias("label"),
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("_ok").cast("long").alias("n_correct"),
    )
    return per_label.unionByName(overall).select(
        "label",
        "n_eval",
        "n_correct",
        F.expr("n_correct * 1000000 div n_eval").alias("accuracy_ppm"),
    )
