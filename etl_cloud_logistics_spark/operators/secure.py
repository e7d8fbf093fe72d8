"""Role-parameterized secure views (P9 — row- and column-level security).

The reference grants per-role access to masked views
(``scripts/04_dimensional_model.sql:196-236``: ``v_sales_deliveries``
filters rows by customer type and ``GRANT SELECT ... TO ROLE sales_role``).
Spark has no GRANT statement, so the engine-native form is a *view factory*:
a policy per role describing the row filter and the per-column mask set,
applied as plain projections/predicates — which means the row filter pushes
into the parquet scan and masking costs nothing (projection-time
expressions, whole-stage codegen).

Banding uses ``floor`` (not ``round``): ``round`` of a small negative
balance yields IEEE ``-0.0``, which equals ``0.0`` under ``==`` but has
different bytes — a representation-level trap for any byte/string hash of
the result.  ``floor`` always returns an integral value with no signed
zero, identically in every engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_name(col: str, keep: int = 8) -> Column:
    """Show the first ``keep`` chars, mask the rest."""
    return F.concat(F.substring(col, 1, keep), F.lit("***"))


def band_balance(col: str, width: int = 1000) -> Column:
    """Coarsen a balance to a band of ``width`` (floor — no signed zero)."""
    return (F.floor(F.col(col) / width) * width).cast("double")


@dataclass(frozen=True)
class RolePolicy:
    """Row filter + column masks for one role."""

    row_filter: Column
    columns: dict[str, Column]  # output name -> expression


def customer_policies() -> dict[str, RolePolicy]:
    """The customer-table policy set mirroring the reference's two view
    families (04:196-236): analysts see every segment but masked identity;
    the sales role sees only its segment with identity in the clear but the
    balance fully redacted."""
    return {
        "analyst": RolePolicy(
            row_filter=F.col("c_mktsegment") != "BUILDING",
            columns={
                "c_custkey": F.col("c_custkey"),
                "name_out": mask_name("c_name"),
                "c_mktsegment": F.col("c_mktsegment"),
                "acctbal_band": band_balance("c_acctbal"),
            },
        ),
        "sales": RolePolicy(
            row_filter=F.col("c_mktsegment") == "BUILDING",
            columns={
                "c_custkey": F.col("c_custkey"),
                "name_out": F.col("c_name"),
                "c_mktsegment": F.col("c_mktsegment"),
                "acctbal_band": F.lit(None).cast("double"),
            },
        ),
    }


def secure_view(df: DataFrame, role: str, policies: dict[str, RolePolicy] | None = None) -> DataFrame:
    """The view a given role is allowed to read: row filter + masked
    projection, tagged with the role name."""
    pol = (policies or customer_policies())[role]
    return df.filter(pol.row_filter).select(
        F.lit(role).alias("role"), *[expr.alias(name) for name, expr in pol.columns.items()]
    )
