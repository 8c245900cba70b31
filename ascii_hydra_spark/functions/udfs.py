"""Pandas UDF definitions (SURVEY.md C29-C30).

NOTE: no `from __future__ import annotations` here — pandas_udf infers the
UDF eval type from *runtime* type hints, and PEP-563 stringified annotations
break that inference for grouped-agg signatures.

UDFs are the engine's slow path: everything here is Arrow-batched
(never row-at-a-time), and each UDF has a pure-SQL equivalent in the
verification registry proving the fast path could replace it.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def charge_milli_cents(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    """Per-row charge in exact integer 'milli-cents':
    round(ep*100) * (100 - round(disc*100)) * (100 + round(tax*100)).

    Integer-domain arithmetic so the result is bit-identical to the SQL
    formulation regardless of engine or accumulation order.
    """
    ep_c = (ep * 100).round().astype("int64")
    disc_c = (disc * 100).round().astype("int64")
    tax_c = (tax * 100).round().astype("int64")
    return ep_c * (100 - disc_c) * (100 + tax_c)


@pandas_udf("double")
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg pandas UDF: sum(v*w)/sum(w) (custom UDAF surface)."""
    return float((values * weights).sum() / weights.sum())


@pandas_udf("double")
def dot_product(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized dot product over two array<double> columns.

    The scoring hot path for LSH candidate pairs: numpy crunches an Arrow
    batch of vectors at C speed, where the equivalent zip_with+aggregate
    expression evaluates interpreted per element. Used only in approximate
    arms — exact oracle-matched arms keep the deterministic left-fold.
    """
    import numpy as np

    va = np.stack(a.to_numpy())
    vb = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", va, vb))
