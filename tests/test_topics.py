"""LDA invariants on a separable synthetic corpus (SURVEY §5.2.4/§7.4.2:
cross-engine numeric parity is impossible; assert structure instead)."""

import random

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.topics import (
    dominant_topic,
    fit_lda,
    topic_words,
    umass_coherence,
)

THEME_A = ["football", "goal", "match", "league", "striker", "stadium", "referee"]
THEME_B = ["election", "vote", "parliament", "minister", "policy", "ballot", "senate"]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(42)
    rows = []
    for i in range(60):
        theme = THEME_A if i % 2 == 0 else THEME_B
        words = [rng.choice(theme) for _ in range(30)]
        rows.append((f"doc{i:03d}", " ".join(words)))
    return spark.createDataFrame(rows, "url string, text string")


@pytest.fixture(scope="module")
def bundle(corpus):
    # max_df >= 1.0 is an ABSOLUTE doc count in Spark: 60.0 = "keep terms
    # appearing in up to all 60 docs" (no upper filtering)
    return fit_lda(corpus, "text", "url", k=2, max_iter=20, min_df=1.0, max_df=60.0)


def test_topic_words_shape(bundle):
    tw = topic_words(bundle, topn=5)
    rows = tw.collect()
    assert {r.topic_id for r in rows} == {0, 1}
    assert all(1 <= r.rank <= 5 for r in rows)
    vocab = set(THEME_A) | set(THEME_B)
    assert all(r.word in vocab for r in rows)  # vocab containment
    assert all(r.weight > 0 for r in rows)


def test_dominant_topic_separates_themes(corpus, bundle):
    assigned = dominant_topic(bundle, "url").collect()
    by_theme = {0: [], 1: []}
    for r in assigned:
        doc_idx = int(r.url[3:])
        by_theme[doc_idx % 2].append(r.main_topic)
    # docs of one theme overwhelmingly share a topic id, and the two
    # themes land on different ids (cluster purity, not id identity)
    majority = [max(set(v), key=v.count) for v in by_theme.values()]
    purity = [v.count(m) / len(v) for v, m in zip(by_theme.values(), majority)]
    assert majority[0] != majority[1]
    assert min(purity) > 0.9


def test_assignment_stable_up_to_relabeling(corpus):
    """Same seed + same data → the same document CLUSTERING. Topic ids may
    swap between fits (CountVectorizer breaks equal-count vocabulary ties
    by shuffle arrival order, permuting term indices — SURVEY §7.4.2:
    'seed-stable per partitioning, not bitwise-equal'), so compare the
    induced partition of documents, not raw labels."""
    a = fit_lda(corpus, "text", "url", k=2, max_iter=10, min_df=1.0, max_df=60.0)
    b = fit_lda(corpus, "text", "url", k=2, max_iter=10, min_df=1.0, max_df=60.0)
    da = {r.url: r.main_topic for r in dominant_topic(a, "url").collect()}
    db = {r.url: r.main_topic for r in dominant_topic(b, "url").collect()}

    def partition(assign):
        groups = {}
        for url, t in assign.items():
            groups.setdefault(t, set()).add(url)
        return {frozenset(v) for v in groups.values()}

    assert partition(da) == partition(db)


def test_umass_coherence_range(bundle):
    rows = umass_coherence(bundle, topn=5).collect()
    assert {r.topic_id for r in rows} == {0, 1}
    # UMass is a sum of log conditional probabilities: finite, <= 0-ish
    assert all(r.umass_coherence <= 1.0 for r in rows)
    assert all(r.umass_coherence > -100.0 for r in rows)


def test_tokenize_max_tokens_truncation(spark):
    """T6: first-N-tokens truncation (stats_visualization.py:428)."""
    from bbc_news_data_pipeline_spark.operators.topics import tokenize

    df = spark.createDataFrame(
        [(1, " ".join(f"zzqword{i}" for i in range(100)))], "id long, text string"
    )
    out = tokenize(df, "text", "id", max_tokens=10).collect()[0]
    assert len(out.tokens) == 10
    full = tokenize(df, "text", "id").collect()[0]
    assert len(full.tokens) == 100


def test_auto_tune_scan(corpus):
    """M2: the k-scan returns one coherence row per candidate and the
    caller can pick a best k (reference topic_modeling.py:152-191)."""
    from bbc_news_data_pipeline_spark.operators.topics import auto_tune

    scan = auto_tune(corpus, "text", "url", ks=[2, 3], scan_iter=2)
    rows = {r.k: r.mean_coherence for r in scan.collect()}
    assert set(rows) == {2, 3}
    assert all(c == c and c > -100.0 for c in rows.values())  # finite, sane
