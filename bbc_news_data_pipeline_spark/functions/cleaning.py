"""Text-cleaning expression chain — native Catalyst, no UDFs.

Re-expresses the reference's ``clean_text`` regex chain
(``airflow/plugins/nlp_tasks/data_preparation.py:61-96``) in its EXACT
order, preserving the documented quirks (SURVEY.md §2.13):

  * the ``\\b(\\d+\\d)\\b`` pattern only removes tokens of ≥2 digits,
    single digits survive;
  * the reference's ``str.translate`` punctuation strip
    (data_preparation.py:77) is a no-op because step 4 already replaced
    punctuation with spaces — we therefore omit it, yielding identical
    output;
  * the literal ``http|https|www`` substring removal runs AFTER the URL
    regex, as in the reference.

Because every step is a ``regexp_replace``/``lower``/``trim`` Column
expression, the whole chain stays inside WholeStageCodegen — this is the
100× win over the reference's row-at-a-time ``df[col].apply`` and it
scales to 100 TB with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in reference order; Java and RE2 agree on all of
# these constructs (\S, \b, lazy .*?), so the same patterns serve the
# DuckDB oracle (with the 'g' flag).
CLEAN_STEPS: tuple[tuple[str, str], ...] = (
    (r"http\S+", ""),  # F2: URLs
    (r"<.*?>", ""),  # F3: HTML tags
    (r"[^ 0-9a-z]", " "),  # F4: keep space/digit/lowercase
    (r"\b(\d+\d)\b", ""),  # F5: multi-digit tokens (quirk: >=2 digits)
    (r"http|https|www", ""),  # F6: literal leftovers
    # F7: single-char tokens. Reference (data_preparation.py:73) replaces
    # with "" — we use " ", which is output-EQUIVALENT: F8 collapses any
    # space run to one and the final trim drops edges, and since F4 already
    # replaced every non-[ 0-9a-z] with a space, a \b[a-z]\b match is always
    # space/edge-delimited — "" would fuse nothing that " " keeps apart.
    (r"\b[a-z]\b", " "),
    (r" +", " "),  # F8: collapse runs of spaces
)


def clean_text_expr(col: Column | str) -> Column:
    """F1–F8 chain: lower+trim, then the reference's replace sequence."""
    out = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    for pattern, replacement in CLEAN_STEPS:
        out = F.regexp_replace(out, pattern, replacement)
    return F.trim(out)


def clean_text_sql(col_sql: str) -> str:
    """The same chain as DuckDB SQL (oracle twin; 'g' = replace-all)."""
    out = f"lower(trim({col_sql}))"
    for pattern, replacement in CLEAN_STEPS:
        # DuckDB string literals keep backslashes verbatim; only quotes escape.
        pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{replacement}', 'g')"
    return f"trim({out})"


def tokens_expr(col: Column | str, min_len: int = 0) -> Column:
    """Whitespace tokenization (F10) with optional length filter (F11)."""
    toks = F.split(F.col(col) if isinstance(col, str) else col, " ")
    if min_len > 0:
        toks = F.filter(toks, lambda t: F.length(t) > min_len)
    return toks
