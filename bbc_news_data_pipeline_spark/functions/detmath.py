"""Engine-independent (bit-deterministic) transcendental surrogates.

Why this exists: the Spark↔DuckDB oracle gate hashes exact values, and
the two engines' ``ln``/``exp``/``pow`` implementations (JVM ``Math.log``
vs libm) may disagree in the last ulp. Whenever a query must EMIT a
log-derived float (rather than use it as an ordering-only key, the q76
pattern), a last-ulp disagreement can flip a ``floor``/``round`` grid
cell — the exact failure class of the round-8 driver reds (q276/q279).

The fix is to compute the logarithm from operations that IEEE 754
*requires* to be correctly rounded — ``+ - * /`` and ``sqrt`` — which
both the JVM (all-strictfp since Java 17) and libm implement
bit-identically. ``det_ln`` evaluates

    ln(x) ≈ 2^K · (t − t²/2 + t³/3),   t = x^(1/2^K) − 1,  K = 20

as a fixed chain of 20 ``sqrt`` calls plus a cubic series. Because every
step is a single correctly-rounded IEEE op applied in the same order,
Spark and DuckDB produce the *same double, bit for bit* — the truncation
error vs true ln(x) (≈5e-11 relative, dominated by sqrt-chain rounding;
series truncation adds only ~1e-13 absolute for |ln x| ≤ 30) is shared
by both engines and therefore invisible to the hash gate. The surrogate
is the spec: oracles and twin tests compute the same formula.

Domain: x > 0 (x = 0 yields t = −1, a finite garbage value — callers
must guard zero inputs with CASE/when exactly as they would for ln).
Accuracy degrades (t grows) once |ln x| ≫ 30, i.e. x outside
[1e-13, 1e13]; assert-guard callers that can exceed that.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sqrt-chain depth: t = x^(1/2^K) − 1 ≤ |ln x|/2^K ≈ 3e-5 for |ln x| ≤ 30.
DET_LN_K = 20
_SCALE = float(2**DET_LN_K)  # 1048576.0, exact in double


def det_ln(x: Column) -> Column:
    """Bit-deterministic natural log of a positive double column."""
    s = x
    for _ in range(DET_LN_K):
        s = F.sqrt(s)
    t = s - F.lit(1.0)
    # ((t − (t·t)/2) + ((t·t)·t)/3) · 2^K — shape must match det_ln_sql.
    return (t - t * t / F.lit(2.0) + t * t * t / F.lit(3.0)) * F.lit(_SCALE)


def det_ln_sql(expr: str, binder: str = "t") -> tuple[str, str]:
    """SQL building blocks mirroring :func:`det_ln` op-for-op.

    Returns ``(t_expr, series_expr)``: bind ``t_expr`` to a column named
    ``binder`` in one CTE stage (so the sqrt chain is evaluated once),
    then use ``series_expr`` (which references ``binder``) in the next
    stage. Two stages keep the oracle readable and stop DuckDB from
    re-evaluating the 20-deep sqrt chain per series term.
    """
    s = expr
    for _ in range(DET_LN_K):
        s = f"sqrt({s})"
    t_expr = f"({s} - 1.0)"
    series = (
        f"(({binder} - {binder}*{binder}/2.0 "
        f"+ {binder}*{binder}*{binder}/3.0) * {_SCALE!r})"
    )
    return t_expr, series


#: Taylor degree for det_exp_small: |x| ≤ 1 ⟹ truncation ≤ 1/14! ≈ 1.1e-11.
_EXP_DEG = 13
#: Horner coefficients 1/13!, 1/12!, …, 1/1!, 1/0! as exact double literals.
_EXP_COEFFS = [1.0 / math.factorial(k) for k in range(_EXP_DEG, -1, -1)]


def det_exp_small(x: Column) -> Column:
    """Bit-deterministic exp for |x| ≤ 1 (e.g. bounded sigmoid logits).

    Fixed-shape Horner evaluation of the degree-13 Taylor polynomial with
    shared double literals — every step a correctly-rounded IEEE op, so
    Spark and DuckDB agree bit-for-bit (engine ``exp`` does not). Callers
    must bound the argument: |x| ≤ 1 keeps truncation ≤ 1.1e-11 relative
    (deterministic either way, but past ~|x|=2 the value stops being a
    faithful exp).
    """
    e: Column = F.lit(_EXP_COEFFS[0])
    for c in _EXP_COEFFS[1:]:
        e = e * x + F.lit(c)
    return e


def det_exp_small_sql(binder: str) -> str:
    """SQL twin of :func:`det_exp_small`; ``binder`` must name a column
    already bound to the argument (it is referenced 13 times)."""
    e = repr(_EXP_COEFFS[0])
    for c in _EXP_COEFFS[1:]:
        e = f"({e} * {binder} + {c!r})"
    return e
