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
    caller can pick a best k (reference topic_modeling.py:152-191).
    Default metric is c_v — what the reference's CoherenceModel scores."""
    from bbc_news_data_pipeline_spark.operators.topics import auto_tune

    scan = auto_tune(corpus, "text", "url", ks=[2, 3], scan_iter=2)
    rows = {r.k: r.mean_coherence for r in scan.collect()}
    assert set(rows) == {2, 3}
    assert all(c == c and -1.0 <= c <= 1.0 for c in rows.values())  # cosine range

    umass = auto_tune(corpus, "text", "url", ks=[2], scan_iter=2, metric="umass")
    assert umass.collect()[0].k == 2
    with pytest.raises(ValueError):
        auto_tune(corpus, "text", "url", ks=[2], metric="nope")


def _cv_numpy_replica(docs, topics, window=110, eps=1e-12):
    """Independent NumPy implementation of c_v (Röder et al. 2015 / the
    gensim pipeline): boolean sliding windows -> NPMI (gamma=1, diagonal
    included) -> one-set segmentation -> indirect cosine."""
    import numpy as np

    vocab = sorted({w for ws in topics.values() for w in ws})
    widx = {w: i for i, w in enumerate(vocab)}
    win_rows = []
    for toks in docs:
        n_win = max(1, len(toks) - window + 1)
        for s in range(n_win):
            seen = set(toks[s : s + window]) if len(toks) > window else set(toks)
            win_rows.append({widx[w] for w in seen if w in widx})
    T = len(win_rows)
    nv = len(vocab)
    n_w = np.zeros(nv)
    n_ij = np.zeros((nv, nv))
    for seen in win_rows:
        for i in seen:
            n_w[i] += 1
            for j in seen:
                n_ij[i, j] += 1
    out = {}
    for t, ws in topics.items():
        idx = [widx[w] for w in ws]
        m = len(idx)
        v = np.zeros((m, m))
        for a, i in enumerate(idx):
            for b, j in enumerate(idx):
                p_ij = n_ij[i, j] / T
                p_i, p_j = n_w[i] / T, n_w[j] / T
                v[a, b] = np.log((p_ij + eps) / (p_i * p_j)) / -np.log(p_ij + eps)
        vw = v.sum(axis=0)
        cosines = [
            float(v[a] @ vw / (np.linalg.norm(v[a]) * np.linalg.norm(vw)))
            for a in range(m)
        ]
        out[t] = float(np.mean(cosines))
    return out


def test_cv_coherence_matches_numpy_replica(spark):
    """The Spark c_v assembly must agree with an independent row-by-row
    NumPy implementation of the same measure — windows shorter AND longer
    than the sliding window size, words that never co-occur, and a
    diagonal-dominant topic all covered."""
    from bbc_news_data_pipeline_spark.operators.topics import cv_coherence_for_words

    rng = random.Random(7)
    docs = []
    for i in range(40):
        theme = THEME_A if i % 2 == 0 else THEME_B
        # lengths straddle the window size (8) incl. empty-ish docs
        ln = rng.choice([3, 6, 12, 25])
        docs.append([rng.choice(theme + ["filler", "noise"]) for _ in range(ln)])
    topics = {0: THEME_A[:5], 1: THEME_B[:5], 2: [*THEME_A[:2], *THEME_B[:2]]}

    expected = _cv_numpy_replica(docs, topics, window=8)

    tokens_df = spark.createDataFrame(
        [(f"d{i}", toks) for i, toks in enumerate(docs)], "id string, tokens array<string>"
    )
    words_df = spark.createDataFrame(
        [(t, r + 1, w, 1.0) for t, ws in topics.items() for r, w in enumerate(ws)],
        "topic_id int, rank int, word string, weight double",
    )
    got = {
        r.topic_id: r.cv_coherence
        for r in cv_coherence_for_words(tokens_df, words_df, window=8).collect()
    }
    assert set(got) == set(expected)
    for t in expected:
        assert abs(got[t] - expected[t]) < 1e-4, (t, got[t], expected[t])


def test_cv_coherence_prefers_coherent_topic(bundle):
    """On the separable corpus, every LDA topic's c_v lands in [-1, 1] and
    a deliberately mixed word set scores LOWER than the pure themes."""
    from bbc_news_data_pipeline_spark.operators.topics import (
        cv_coherence,
        cv_coherence_for_words,
    )

    rows = cv_coherence(bundle, topn=5, window=10).collect()
    assert {r.topic_id for r in rows} == {0, 1}
    assert all(-1.0 <= r.cv_coherence <= 1.0 for r in rows)

    words_df = bundle.tokens_df.sparkSession.createDataFrame(
        [(0, r + 1, w, 1.0) for r, w in enumerate(THEME_A[:4])]
        + [(1, r + 1, w, 1.0) for r, w in enumerate([*THEME_A[:2], *THEME_B[:2]])],
        "topic_id int, rank int, word string, weight double",
    )
    scored = {
        r.topic_id: r.cv_coherence
        for r in cv_coherence_for_words(bundle.tokens_df, words_df, window=10).collect()
    }
    assert scored[0] > scored[1], scored


def test_cv_coherence_gensim_parity(corpus, bundle):
    """Skipif-guarded exact-pipeline parity: when gensim is installed, our
    c_v must match CoherenceModel(coherence='c_v') within a small epsilon
    on the same texts and topic word lists."""
    gensim = pytest.importorskip("gensim")
    from gensim.corpora import Dictionary
    from gensim.models.coherencemodel import CoherenceModel

    from bbc_news_data_pipeline_spark.operators.topics import cv_coherence_for_words

    texts = [r.tokens for r in bundle.tokens_df.collect()]
    tw = topic_words(bundle, topn=5)
    by_topic = {}
    for r in tw.collect():
        by_topic.setdefault(r.topic_id, []).append((r.rank, r.word))
    topics = {t: [w for _, w in sorted(ws)] for t, ws in by_topic.items()}

    cm = CoherenceModel(
        topics=[topics[t] for t in sorted(topics)],
        texts=texts,
        dictionary=Dictionary(texts),
        coherence="c_v",
        processes=1,
    )
    expected = cm.get_coherence_per_topic()

    words_df = corpus.sparkSession.createDataFrame(
        [(t, r + 1, w, 1.0) for t, ws in topics.items() for r, w in enumerate(ws)],
        "topic_id int, rank int, word string, weight double",
    )
    got = {
        r.topic_id: r.cv_coherence
        for r in cv_coherence_for_words(bundle.tokens_df, words_df).collect()
    }
    for i, t in enumerate(sorted(topics)):
        assert abs(got[t] - expected[i]) < 1e-3, (t, got[t], expected[i])


def test_umass_coherence_hand_computed(spark):
    """UMass pinned to a hand-computed value on explicit doc sets:
    C = sum over rank-ordered pairs (i<j) of log((D(wi,wj)+1)/D(wj)).
    Docs: {a,b} x3, {a} x2, {b,c} x1 -> D(a)=5, D(b)=4, D(c)=1,
    D(a,b)=3, D(a,c)=0, D(b,c)=1. Topic words ranked [a, b, c]:
    C = log(4/4) + log(1/1) + log(2/1) = log(2)."""
    import math

    from bbc_news_data_pipeline_spark.operators.topics import (
        umass_coherence_for_words,
    )

    docs = [["a", "b"], ["a", "b"], ["a", "b"], ["a"], ["a"], ["b", "c"]]
    tokens_df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(docs)], "id string, tokens array<string>"
    )
    words_df = spark.createDataFrame(
        [(0, 1, "a", 1.0), (0, 2, "b", 0.9), (0, 3, "c", 0.8)],
        "topic_id int, rank int, word string, weight double",
    )
    rows = umass_coherence_for_words(tokens_df, words_df).collect()
    assert len(rows) == 1
    assert abs(rows[0].umass_coherence - round(math.log(2.0), 6)) < 1e-9


def test_save_topic_report_html(bundle, tmp_path):
    """S14 sink: the dependency-free report renders every topic with its
    word table and doc counts, self-contained (no external assets)."""
    from bbc_news_data_pipeline_spark.pipeline.report import save_topic_report

    path = save_topic_report(bundle, str(tmp_path / "report.html"), id_col="url")
    text = open(path, encoding="utf-8").read()
    assert text.startswith("<!DOCTYPE html>") and text.endswith("</html>")
    assert "Topic 0" in text and "Topic 1" in text
    assert "docs" in text  # dominant-topic counts wired in
    assert "http" not in text  # self-contained: no external assets
    # every top word of every topic appears
    for r in topic_words(bundle, topn=10).collect():
        assert r.word in text


def test_prepare_pyldavis_data_contract(bundle):
    """The pyLDAvis recipe's arrays are shape-consistent and normalized
    (what pyLDAvis.prepare validates before rendering)."""
    from bbc_news_data_pipeline_spark.pipeline.report import prepare_pyldavis_data

    data = prepare_pyldavis_data(bundle, id_col="url")
    k, v = bundle.k, len(data["vocab"])
    assert len(data["topic_term_dists"]) == k
    assert all(len(row) == v for row in data["topic_term_dists"])
    assert all(abs(sum(row) - 1.0) < 1e-6 for row in data["topic_term_dists"])
    n_docs = len(data["doc_topic_dists"])
    assert n_docs == 60 == len(data["doc_lengths"])
    assert all(abs(sum(d) - 1.0) < 1e-6 for d in data["doc_topic_dists"])
    assert all(l > 0 for l in data["doc_lengths"])
    assert len(data["term_frequency"]) == v and sum(data["term_frequency"]) > 0
