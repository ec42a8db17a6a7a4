"""Privacy-threshold (clean-room) aggregation layer.

Re-implements the reference's BigQuery *aggregation threshold policy*
(/root/reference/sql/sp_demo_cleanroom.sql:51-57: privacy_unit_column
= customer_id, threshold = 2) as a DataFrame rewrite: any aggregate
over a policy-protected view is gated with
``HAVING count(DISTINCT unit) >= threshold``, and row-level access is
refused. Threshold gating only — no differential-privacy noise (the
reference policy doesn't add noise either).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GATE_COL = "__privacy_unit_count"


def threshold_gated_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: list[Column],
    privacy_unit_col: str,
    threshold: int = 2,
) -> DataFrame:
    """Grouped aggregate that only answers for groups where at least
    ``threshold`` distinct privacy units contribute.

    The gate count is folded into the same aggregation pass (one
    shuffle), then dropped from the output.
    """
    gated = (
        df.groupBy(*group_cols)
        .agg(*agg_exprs, F.countDistinct(privacy_unit_col).alias(_GATE_COL))
        .filter(F.col(_GATE_COL) >= threshold)
        .drop(_GATE_COL)
    )
    return gated


@dataclass
class PrivacyPolicy:
    """Aggregation-threshold policy attached to a protected view."""

    privacy_unit_col: str
    threshold: int = 2


class ProtectedView:
    """A DataFrame wrapper that only exposes threshold-gated aggregates.

    Mirrors the reference's clean-room view: consumers can call
    :meth:`agg`, but any attempt at row-level access raises.
    """

    def __init__(self, df: DataFrame, policy: PrivacyPolicy):
        self._df = df
        self.policy = policy

    def agg(self, group_cols: list[str], agg_exprs: list[Column]) -> DataFrame:
        return threshold_gated_agg(
            self._df,
            group_cols=group_cols,
            agg_exprs=agg_exprs,
            privacy_unit_col=self.policy.privacy_unit_col,
            threshold=self.policy.threshold,
        )

    def select(self, *_cols):  # row-level access denied, like the reference view
        raise PermissionError(
            "row-level access to an aggregation-threshold protected view is denied; "
            "use .agg(group_cols, agg_exprs)"
        )

    collect = select
    toPandas = select
