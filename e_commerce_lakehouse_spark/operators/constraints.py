"""Table CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT`
semantics on the snapshot log).

A constraint is a SQL boolean expression stored as table metadata and
enforced IN-PLAN on every subsequent write: each output row evaluates
the condition inside an expression the write consumes, so a violating
row fails the write job itself (raise_error) before any manifest
commit — never a post-hoc scan that a pruned column could skip, and
never a second pass over the data. SQL-standard semantics: a NULL
condition SATISFIES the constraint (only FALSE violates), matching
Delta/ANSI CHECK.

Scale: the guard is a scalar CASE fused into the first projected
column — zero extra scans, zero shuffles, codegen-friendly; cost is
one boolean expression per row per constraint.

Reference parity: the reference loads CSVs with no row validation
(SURVEY §2.1); this is the write-side contract a multi-writer
lakehouse table needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def guard_constraints(df: DataFrame, constraints: dict[str, str | Column]) -> DataFrame:
    """Return ``df`` with every row checked against every constraint
    in-plan. The guards are fused into the FIRST output column (an
    expression every writer consumes), so Catalyst cannot prune them
    away; `tests/test_snapshots.py` pins that the guard actually fires
    (the round-6 DID-NOT-RAISE lesson: a guard on a dropped helper
    column never runs)."""
    if not constraints:
        return df
    if not df.columns:
        raise ValueError("cannot guard a zero-column frame")
    first = df.columns[0]
    guarded = F.col(first)
    for name in sorted(constraints):
        cond = constraints[name]
        cond = F.expr(cond) if isinstance(cond, str) else cond
        # NULL satisfies (ANSI CHECK): violation iff cond IS FALSE
        violated = ~F.coalesce(cond, F.lit(True))
        guarded = F.when(
            violated,
            F.raise_error(
                F.concat(
                    F.lit(f"constraint '{name}' violated by row: "),
                    F.coalesce(
                        F.to_json(F.struct(*[F.col(c) for c in df.columns])),
                        F.lit("<row>"),
                    ),
                )
            ).cast(df.schema[first].dataType.simpleString()),
        ).otherwise(guarded)
    return df.withColumn(first, guarded)
