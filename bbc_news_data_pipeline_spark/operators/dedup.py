"""Deduplication operators for a large-scale training-data pipeline.

The reference deduplicates only by exact key (unique ``url`` index,
``pipelines.py:33``; Mongo ``$group`` dup sweep, ``bbc_news_dag.py:27-43``
— SURVEY A1/W1/S9). This module generalizes that to the dedup family a
100 TB text corpus needs:

  exact        — fingerprint groupBy (hash partition ≡ one shuffle)
  first_wins   — keyed keep-one via row_number (the reference's semantics)
  minhash      — shingle → K independent min-hashes → band buckets → join
  simhash      — 64-bit weighted-majority fingerprint, Hamming-bucket join
  ngram_jaccard— exact Jaccard over shingle sets via inverted-index join

Scale notes: every operator is expressed as DataFrame ops whose only wide
stages are hash-partitioned groupBy/join on content-derived keys, so skew
is bounded by shingle frequency; the minhash banding join is the standard
LSH trick that avoids the O(n²) pair space. All hashing uses md5 (stable,
engine-portable, seed-prefixed) — NOT Spark's ``hash()``, whose values
would not be reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprint(col: Column | str, *, normalize: bool = True) -> Column:
    """Stable content fingerprint (md5 of normalized text)."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.trim(c))
    return F.md5(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per identical (normalized) text.

    One shuffle on the 128-bit fingerprint → perfectly uniform partitioning
    regardless of content skew.
    """
    fp = fingerprint(text_col)
    keep = (
        df.select(F.col(id_col), fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def first_wins(df: DataFrame, key_cols: list[str], order_cols: list[Column]) -> DataFrame:
    """Reference semantics (bbc_news_dag.py:39-43): keep one row per key,
    deterministic winner by ``order_cols``."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def shingles_expr(text_col: str, k: int = 5) -> Column:
    """k-gram word shingles as an array column — pure array algebra,
    no explode until the operator that needs one. Docs shorter than k
    tokens yield an empty array (guard needed: Spark's ``sequence`` would
    otherwise count DOWN for a negative span, and ANSI mode rejects
    element_at(0))."""
    toks = F.split(F.col(text_col), " ")

    def gram(i: Column) -> Column:
        # element_at is 1-based; i ranges over 0..size-k.
        return F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])

    return F.when(
        F.size(toks) >= k,
        F.transform(F.sequence(F.lit(0), F.size(toks) - k), gram),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_md5_min(shingles: Column, seed: int) -> Column:
    prefix = F.lit(f"{seed}:")

    def h(s: Column) -> Column:
        return F.md5(F.concat(prefix, s))

    return F.array_min(F.transform(shingles, h))


def minhash_signature(text_col: str, n_hashes: int = 8, k: int = 5) -> list[Column]:
    """n independent min-hash columns: min over shingles of md5(seed||shingle).

    md5 with a seed prefix gives n independent uniform hash families;
    array_min avoids any explode — the signature is computed row-local.
    """
    sh = shingles_expr(text_col, k)
    return [_seeded_md5_min(sh, seed).alias(f"sig_{seed}") for seed in range(n_hashes)]


def minhash_candidates(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, bands: int = 4, k: int = 5
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Returns (id_a, id_b) with id_a < id_b.

    Scale: the only wide op is a groupBy/join on band keys; band-key
    frequency is the knob that bounds the pair blow-up.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sigs = minhash_signature(text_col, n_hashes, k)
    with_sig = df.select(F.col(id_col), *sigs)
    band_cols = [
        F.md5(F.concat_ws("|", F.lit(str(b)), *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)])).alias(
            "band_key"
        )
        for b in range(bands)
    ]
    banded = with_sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band_key")
    ).dropDuplicates([id_col, "band_key"])
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, (F.col("l.band_key") == F.col("r.band_key")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash64(text_col: str) -> Column:
    """64-bit SimHash over word tokens (weighted by term frequency via
    token multiplicity). Row-local: md5 → 64-bit lanes → per-bit majority.

    Implementation: for each of 64 bits, sum (+1/-1) over tokens of bit b
    of md5(token); sign → bit. Expressed with aggregate() over the token
    array — no UDF, no shuffle.
    """
    toks = f"split({text_col}, ' ')"
    # 64-bit unsigned value from the first 16 hex chars of md5(token).
    h = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"  # 60 bits, sign-safe
    bit_terms = []
    for b in range(60):
        bit_terms.append(
            f"aggregate({toks}, 0L, (acc, t) -> acc + CASE WHEN ({h} >> {b}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
    # pack sign bits into a 60-bit long
    packed = " + ".join(
        f"(CASE WHEN ({term}) > 0 THEN {1 << b}L ELSE 0L END)" for b, term in enumerate(bit_terms)
    )
    return F.expr(packed)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, min_jaccard: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found via an inverted
    index (explode distinct shingles → self-join). Returns
    (id_a, id_b, jaccard) with jaccard rounded to 4dp.

    Scale: pair space is bounded by shared-shingle frequency, not n²;
    for adversarial corpora cap posting-list length (hot shingles carry
    no discriminative signal anyway).
    """
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles_expr(text_col, k)).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sizes = sh.select(F.col(id_col), F.size("shingles").cast("long").alias("n_sh"))
    posting = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
