"""Learned quality filtering — the fasttext-style classifier gate
(GPT-3/LLaMA pretraining: train a linear classifier to distinguish a
high-quality reference slice from random web text, keep documents the
classifier scores highly).

Spark-first shape: features are a hashed bag-of-words (HashingTF — no
vocabulary state, deterministic, map-side) and training is
``pyspark.ml`` LogisticRegression over a labeled union of the two
slices.  Scoring broadcasts the coefficient vector inside the ml
transform, so classifying the 100 TB corpus is a single map-side pass
— no shuffle, no Python in the scoring path (ml transforms run
JVM-side).

Training typically runs on a bounded sample (reference slice +
equal-size random negative sample), so its iterative cost is O(sample),
not O(corpus).
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF, Tokenizer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 15


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="features", numFeatures=N_FEATURES)
    return tf.transform(tok.transform(df))


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> LogisticRegressionModel:
    """Fit the gate: ``positive`` is the high-quality reference slice,
    ``negative`` the random-corpus sample.  Both are bounded samples;
    pass equal-ish sizes or reweight downstream."""
    labeled = positive.select(
        F.col(text_col), F.lit(1.0).alias("label")
    ).unionByName(negative.select(F.col(text_col), F.lit(0.0).alias("label")))
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    return lr.fit(_featurize(labeled, text_col))


def score_quality(
    df: DataFrame,
    model: LogisticRegressionModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob): P(high quality) per document.  Map-side only
    — tokenize, hash, dot with the broadcast coefficient vector."""
    scored = model.transform(_featurize(df, text_col))
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )


def classifier_filter(
    df: DataFrame,
    model: LogisticRegressionModel,
    min_prob: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents with P(high quality) >= min_prob.  The common
    production variant keeps a *stochastic* tail instead of a hard cut
    (np.random.pareto in the GPT-3 recipe); a deterministic engine
    exposes the hard threshold and leaves resampling to the
    hash-coin samplers (operators/sampling.py), which compose:
    ``bernoulli_sample(classifier_filter(...), frac)``."""
    keep = score_quality(df, model, text_col, id_col).filter(
        F.col("quality_prob") >= min_prob
    )
    return df.join(keep.select(id_col), id_col, "left_semi")
