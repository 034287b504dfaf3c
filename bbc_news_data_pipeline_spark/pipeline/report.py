"""HTML topic-report sink (SURVEY S14) — the migration recipe for the
reference's pyLDAvis artifact (``topic_modeling.py:230-241``).

The engine's contract is to produce the SMALL topic tables (topic words,
per-topic coherence, per-topic document counts) as DataFrames; rendering
is a driver-side concern over those collected aggregates (SURVEY §2.1
S14 "out-of-engine"). This module closes the recipe gap for a reference
user migrating their report:

1. Dependency-free path (works in any environment, used by tests):
   :func:`render_topic_report_html` collects the tables (thousands of
   rows at most — k topics × topn words) and emits one self-contained
   HTML file with weight bars, no JS, no external assets.

2. pyLDAvis path (when the package is installed) — the reference's
   artifact, verbatim recipe::

       import pyLDAvis
       data = prepare_pyldavis_data(bundle)
       vis = pyLDAvis.prepare(**data, mds="mmds")
       pyLDAvis.save_html(vis, "lda_vis.html")

   :func:`prepare_pyldavis_data` assembles pyLDAvis's five required
   arrays from the Spark model — topic-term distributions, doc-topic
   mixtures, doc lengths, vocabulary, term frequencies — each collected
   from a DataFrame aggregate, so the heavy passes stay distributed and
   only O(k·vocab) matrices reach the driver. The reference's
   complex→real dtype fixup (topic_modeling.py:233-240, SURVEY U9) is a
   pyLDAvis-internals workaround for its PCoA output and belongs after
   ``prepare`` exactly as the reference does it.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topics import TopicModelBundle, dominant_topic, topic_words

_CSS = """
body { font-family: sans-serif; margin: 2em; color: #222; }
h1 { font-size: 1.4em; } h2 { font-size: 1.1em; margin-top: 1.5em; }
table { border-collapse: collapse; margin: 0.5em 0; }
td, th { padding: 2px 10px; text-align: left; font-size: 0.9em; }
th { border-bottom: 1px solid #999; }
.bar { display: inline-block; height: 0.8em; background: #4878a8; }
.muted { color: #777; font-size: 0.85em; }
"""


def render_topic_report_html(
    words_df: DataFrame,
    coherence_df: DataFrame | None = None,
    doc_counts_df: DataFrame | None = None,
    title: str = "Topic model report",
) -> str:
    """Self-contained HTML for the collected topic tables.

    ``words_df``: (topic_id, rank, word, weight) — :func:`topic_words`'s
    shape. ``coherence_df``: (topic_id, coherence). ``doc_counts_df``:
    (main_topic, n_docs). All are k-topic-sized driver collects.
    """
    words = sorted(
        words_df.collect(), key=lambda r: (r["topic_id"], r["rank"])
    )
    coh = (
        {r["topic_id"]: r["coherence"] for r in coherence_df.collect()}
        if coherence_df is not None
        else {}
    )
    counts = (
        {r["main_topic"]: r["n_docs"] for r in doc_counts_df.collect()}
        if doc_counts_df is not None
        else {}
    )
    by_topic: dict[int, list] = {}
    for r in words:
        by_topic.setdefault(r["topic_id"], []).append(r)

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{_html.escape(title)}</h1>",
        f"<p class='muted'>{len(by_topic)} topics</p>",
    ]
    for tid in sorted(by_topic):
        rows = by_topic[tid]
        meta = []
        if tid in counts:
            meta.append(f"{counts[tid]} docs")
        if tid in coh:
            meta.append(f"coherence {coh[tid]:.4f}")
        suffix = f" <span class='muted'>({', '.join(meta)})</span>" if meta else ""
        parts.append(f"<h2>Topic {tid}{suffix}</h2>")
        parts.append("<table><tr><th>rank</th><th>word</th><th>weight</th></tr>")
        max_w = max(r["weight"] for r in rows) or 1.0
        for r in rows:
            bar = int(200 * r["weight"] / max_w)
            parts.append(
                f"<tr><td>{r['rank']}</td><td>{_html.escape(str(r['word']))}</td>"
                f"<td><span class='bar' style='width:{bar}px'></span> "
                f"{r['weight']:.5f}</td></tr>"
            )
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def save_topic_report(
    bundle: TopicModelBundle,
    path: str,
    id_col: str = "doc_id",
    topn: int = 10,
    coherence_df: DataFrame | None = None,
) -> str:
    """Render and write the report for a fitted bundle (the S14 sink).

    Mirrors what the reference persists per run (topic_modeling.py:
    223-241: model files + HTML artifact): callers persist the bundle via
    its Spark ML ``.save`` and this HTML next to it.
    """
    counts = (
        dominant_topic(bundle, id_col)
        .groupBy("main_topic")
        .agg(F.count("*").alias("n_docs"))
    )
    html_text = render_topic_report_html(
        topic_words(bundle, topn), coherence_df, counts,
        title=f"Topic model report (k={bundle.k})",
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(html_text)
    return path


def prepare_pyldavis_data(
    bundle: TopicModelBundle, id_col: str = "doc_id", max_docs: int | None = 50_000
) -> dict:
    """The five arrays ``pyLDAvis.prepare`` needs, from Spark aggregates.

    Heavy passes (doc lengths, term frequencies, doc-topic mixtures) run
    distributed; only O(k·vocab + min(docs, max_docs)·k) results reach
    the driver. pyLDAvis uses the doc-topic matrix solely for marginal
    topic proportions, so a deterministic hash-ordered sample of
    ``max_docs`` documents (None = all) keeps the artifact faithful at
    corpus scale instead of collecting billions of mixture rows. Keys
    match pyLDAvis's keyword arguments. Import-free: returns plain
    lists, so this module never requires pyLDAvis itself.
    """
    from pyspark.ml.functions import vector_to_array

    vocab = list(bundle.cv_model.vocabulary)
    # topic-term matrix: k rows, normalized over the vocabulary
    tm = bundle.lda_model.topicsMatrix()  # vocab x k (dense, driver-side)
    k = bundle.k
    topic_term = []
    for t in range(k):
        col = [tm[i, t] for i in range(len(vocab))]
        s = sum(col) or 1.0
        topic_term.append([v / s for v in col])

    bow = bundle.cv_model.transform(bundle.tokens_df)
    scored = bundle.lda_model.transform(bow).select(
        F.col(id_col),
        vector_to_array("topicDistribution").alias("dist"),
        F.size("tokens").alias("doc_len"),
    )
    if max_docs is not None:
        # deterministic: md5-ordered top-N is stable across runs/cluster
        # layouts, unlike .limit() over an unordered frame
        scored = (
            scored.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(max_docs)
        )
    rows = scored.collect()
    doc_topic = [list(r["dist"]) for r in rows]
    doc_lengths = [int(r["doc_len"]) for r in rows]

    tf_rows = (
        bundle.tokens_df.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    tf_map = {r["w"]: int(r["n"]) for r in tf_rows}
    term_frequency = [tf_map.get(w, 0) for w in vocab]
    # pyLDAvis divides by term frequencies; a vocab word absent from
    # tokens_df (mismatched bundle) would poison the artifact downstream
    # with no error at prepare() time — fail here instead.
    missing = [w for w, n in zip(vocab, term_frequency) if n == 0]
    if missing:
        raise ValueError(
            f"{len(missing)} vocabulary words have zero frequency in "
            f"tokens_df (first: {missing[:5]}) — bundle/tokens mismatch"
        )
    return {
        "topic_term_dists": topic_term,
        "doc_topic_dists": doc_topic,
        "doc_lengths": doc_lengths,
        "vocab": vocab,
        "term_frequency": term_frequency,
    }
