"""Topic modeling — Spark ML re-expression of the reference's gensim LDA
stage (``airflow/plugins/nlp_tasks/topic_modeling.py``; SURVEY M1–M5).

Mapping (SURVEY §2.9):
  gensim Dictionary + filter_extremes  →  CountVectorizer(minDF/maxDF/vocabSize)
  LdaModel(num_topics, passes, ...)    →  pyspark.ml.clustering.LDA (online, seed)
  show_topic / topic words table       →  describeTopics + posexplode + vocab lookup
  get_document_topics argmax           →  topicDistribution → vector_to_array → argmax
  CoherenceModel(c_v)                  →  UMass coherence, DataFrame-native
                                          (c_v sliding-window parity is §7.4.1's
                                          known-hard item; UMass needs only
                                          doc-level co-occurrence, which is exact
                                          and distributed here)

Numerical parity with gensim is impossible across engines (SURVEY §7.4.2);
tests assert invariants (topic count, vocab containment, separable-corpus
cluster purity) instead of exact values.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.feature import CountVectorizer, CountVectorizerModel, RegexTokenizer, StopWordsRemover
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..nlp.stopwords import EN_STOPWORDS


@dataclass
class TopicModelBundle:
    """Fitted artifacts of one LDA run (reference persists these as files,
    topic_modeling.py:223-228; here they are Spark ML models with
    .save/.load)."""

    k: int
    cv_model: CountVectorizerModel
    lda_model: LDAModel
    tokens_df: DataFrame  # (id, tokens) — reused for coherence


def tokenize(
    df: DataFrame, text_col: str, id_col: str, max_tokens: int | None = None
) -> DataFrame:
    """Tokenize + stopword-filter (reference topic_modeling.py:129-133,
    with the stopword wiring FIXED per SURVEY §2.13). ``max_tokens``
    reproduces the reference's first-5000-words truncation (SURVEY T6,
    stats_visualization.py:428) via ``slice`` — a bound on per-row work
    that also caps skew from pathological documents."""
    tok = RegexTokenizer(inputCol=text_col, outputCol="_raw_tokens", pattern=r"\s+")
    remover = StopWordsRemover(
        inputCol="_raw_tokens", outputCol="tokens", stopWords=list(EN_STOPWORDS)
    )
    out = remover.transform(tok.transform(df))
    tokens = F.slice("tokens", 1, max_tokens) if max_tokens else F.col("tokens")
    return out.select(F.col(id_col), tokens.alias("tokens"))


def fit_lda(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    *,
    max_iter: int = 10,
    vocab_size: int = 50_000,
    min_df: float = 5.0,
    max_df: float = 0.5,
    seed: int = 42,
) -> TopicModelBundle:
    """Train LDA with the reference's dictionary bounds
    (topic_modeling.py:137: no_below=5, no_above=0.5, keep_n=50000) and
    deterministic seed (topic_modeling.py:204: random_state=42).

    Online optimizer ≈ gensim's chunked variational updates
    (chunksize=2000, topic_modeling.py:203) but distributed: each
    mini-batch is a sample of partitions, no driver bottleneck.
    """
    tokens = tokenize(df, text_col, id_col).cache()
    cv = CountVectorizer(
        inputCol="tokens", outputCol="features", vocabSize=vocab_size, minDF=min_df, maxDF=max_df
    )
    cv_model = cv.fit(tokens)
    if not cv_model.vocabulary:
        raise ValueError(
            "CountVectorizer produced an empty vocabulary — every term was "
            f"filtered by minDF={min_df}/maxDF={max_df}. Note Spark treats "
            "values >= 1.0 as absolute document counts (maxDF=1.0 means "
            "'in at most ONE document'), unlike gensim's no_above fraction."
        )
    bow = cv_model.transform(tokens)
    lda = LDA(k=k, maxIter=max_iter, seed=seed, optimizer="online", featuresCol="features")
    lda_model = lda.fit(bow)
    return TopicModelBundle(k=k, cv_model=cv_model, lda_model=lda_model, tokens_df=tokens)


def topic_words(bundle: TopicModelBundle, topn: int = 10) -> DataFrame:
    """(topic_id, rank, word, weight) — the reference's topic_words_df
    shape (topic_modeling.py:34-40) via describeTopics + posexplode +
    vocabulary lookup (a tiny broadcast array literal)."""
    vocab = F.array(*[F.lit(w) for w in bundle.cv_model.vocabulary])
    desc = bundle.lda_model.describeTopics(topn)
    return (
        desc.select(
            F.col("topic").alias("topic_id"),
            F.posexplode(F.arrays_zip("termIndices", "termWeights")).alias("pos", "tw"),
        )
        .select(
            "topic_id",
            (F.col("pos") + 1).alias("rank"),
            F.element_at(vocab, F.col("tw.termIndices") + 1).alias("word"),
            F.col("tw.termWeights").cast("double").alias("weight"),
        )
    )


def dominant_topic(bundle: TopicModelBundle, id_col: str) -> DataFrame:
    """(id, main_topic, main_topic_prob) — argmax of the per-doc topic
    mixture (reference topic_modeling.py:251-254), via vector_to_array +
    array_position(array_max) — no UDF."""
    bow = bundle.cv_model.transform(bundle.tokens_df)
    scored = bundle.lda_model.transform(bow).select(
        F.col(id_col), vector_to_array("topicDistribution").alias("dist")
    )
    return scored.select(
        F.col(id_col),
        (F.array_position(F.col("dist"), F.array_max("dist")) - 1).cast("int").alias("main_topic"),
        F.round(F.array_max("dist"), 6).alias("main_topic_prob"),
    )


def umass_coherence(bundle: TopicModelBundle, topn: int = 10) -> DataFrame:
    """Per-topic UMass coherence, fully distributed.

    C_UMass(t) = Σ_{i<j} log( (D(w_i, w_j) + 1) / D(w_j) ) over the
    top-n topic words ordered by weight — doc-level co-occurrence counts
    from one explode + self-join on doc id, restricted to the (tiny)
    topic vocabulary so the join is broadcast-sized.
    """
    words = topic_words(bundle, topn)
    vocab_words = words.select("word").distinct()
    id_col = bundle.tokens_df.columns[0]
    presence = bundle.tokens_df.select(
        F.col(id_col).alias("_doc"), F.explode(F.array_distinct("tokens")).alias("word")
    ).join(F.broadcast(vocab_words), "word")
    docfreq = presence.groupBy("word").agg(F.countDistinct("_doc").alias("d"))
    a, b = presence.alias("a"), presence.alias("b")
    cooc = (
        a.join(b, F.col("a._doc") == F.col("b._doc"))
        .filter(F.col("a.word") != F.col("b.word"))
        .groupBy(F.col("a.word").alias("w_i"), F.col("b.word").alias("w_j"))
        .agg(F.countDistinct("a._doc").alias("d_ij"))
    )
    pairs = (
        words.alias("wi")
        .join(words.alias("wj"), F.col("wi.topic_id") == F.col("wj.topic_id"))
        .filter(F.col("wi.rank") < F.col("wj.rank"))
        .select(
            F.col("wi.topic_id").alias("topic_id"),
            F.col("wi.word").alias("w_i"),
            F.col("wj.word").alias("w_j"),
        )
    )
    scored = (
        pairs.join(cooc, ["w_i", "w_j"], "left")
        .na.fill({"d_ij": 0})
        .join(docfreq.withColumnRenamed("word", "w_j").withColumnRenamed("d", "d_j"), "w_j")
        .withColumn("term", F.log((F.col("d_ij") + 1.0) / F.col("d_j")))
    )
    return scored.groupBy("topic_id").agg(F.round(F.sum("term"), 6).alias("umass_coherence"))


def auto_tune(
    df: DataFrame, text_col: str, id_col: str, ks: list[int], *, scan_iter: int = 2, seed: int = 42
) -> DataFrame:
    """Hyperparameter scan over k (reference M2, topic_modeling.py:152-191:
    cheap scan passes, coherence per candidate, pick best). Returns
    (k, mean_coherence) — caller re-fits the winner at full effort,
    mirroring the reference's scan/final two-phase design."""
    rows = []
    for k in ks:
        bundle = fit_lda(df, text_col, id_col, k, max_iter=scan_iter, seed=seed)
        mean_c = umass_coherence(bundle).agg(F.avg("umass_coherence")).collect()[0][0]
        rows.append((k, float(mean_c if mean_c is not None else float("-inf"))))
    spark = df.sparkSession
    return spark.createDataFrame(rows, "k int, mean_coherence double")
