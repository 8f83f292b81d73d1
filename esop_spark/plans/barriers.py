"""Optimizer barriers — plan-shape pins for expensive intermediate columns.

Spark's CollapseProject merges adjacent Project nodes and INLINES the parent's
expressions into every child consumer; it performs no common-subexpression
elimination inside higher-order-function lambdas. A projection that
materializes an expensive array once and then feeds N consumers (the MinHash
signature families: one hashed-element array → num_hashes ``array_min`` folds)
is therefore silently rewritten into N copies of the construction — measured
18× slower on the 200-hash weighted-signature family (and 86 s → 4.8 s on the
streaming twin drain at sf0.1).

:func:`pin_projection_barrier` is the sanctioned workaround: a Generate node
(``explode`` of a 1-element array wrapping the expensive column) between the
construction and its consumers. CollapseProject cannot collapse across a
Generate, the explode of a literal 1-element array is row-preserving (the
wrapped value may itself be NULL or empty — the outer array still has exactly
one slot), and the per-row cost of the Generate is one array allocation.

Version coupling: this leans on two optimizer behaviors — (a) CollapseProject
not crossing Generate, (b) no lambda CSE that would make the barrier
unnecessary. Both are pinned by optimized-plan contract tests
(tests/test_weighted_stream.py::test_signature_projection_keeps_generate_barrier,
tests/test_plan_contracts.py) so a Spark upgrade that changes either side
fails loudly. Grep for ``pin_projection_barrier`` to find every user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin_projection_barrier(
    df: DataFrame, expensive: Column, alias: str, *keep: str
) -> DataFrame:
    """Materialize ``expensive`` once per row as ``alias``, pinned behind a
    Generate barrier so downstream multi-consumer projections cannot be
    collapsed into N copies of the construction (see module docstring).

    Returns ``df`` projected to ``(*keep, alias)`` — row-for-row identical
    to ``df.select(*keep, expensive.alias(alias))``, with the barrier as
    the only plan difference."""
    tmp = f"__pin_{alias}"
    return (
        df.withColumn(tmp, expensive)
        .select(*[F.col(c) for c in keep], F.explode(F.array(tmp)).alias(alias))
    )
