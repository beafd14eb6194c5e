"""A/B experiment readout with CUPED variance reduction (Deng, Xu,
Kohavi & Walker 2013, "Improving the Sensitivity of Online Controlled
Experiments", public literature).

CUPED adjusts each user's experiment-period metric y by their
PRE-period covariate x:  y' = y − θ·(x − x̄),  θ = cov(x,y)/var(x) —
removing variance the pre-period already explains, which shrinks
confidence intervals without biasing the treatment effect (x predates
assignment).

Engine-exactness design: every statistic derives from FIVE integer
sums (n, Σx, Σy, Σxy, Σx²) over unit-quantized per-user totals —
associative, partition-order-independent. θ is one integer-ratio
division; per-variant adjusted means use the algebraic identity
mean(y′) = ȳ_v − θ·(x̄_v − x̄)   (never a per-row float sum, whose
value would depend on partition merge order). The only float ops are
divisions/multiplications of integer-derived doubles in a fixed
association order, so any engine reproduces the doubles bit-exactly.

Shape at 100 TB: two conditional aggregations per user (one corpus
shuffle on user), a 1-row global-moments relation broadcast into the
2-row variant aggregate. Driver state: none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: experiment split: pre-period covariate window ends here
SPLIT_TS = "2024-01-16 00:00:00"


def cuped_readout(events: DataFrame,
                  split_ts: str = SPLIT_TS) -> DataFrame:
    """Per-variant (user_id % 2) CUPED-adjusted mean of post-period
    value, covariate = pre-period value. Returns one row per variant:
    (variant, n_users, xbar, ybar, theta, adjusted)."""
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < F.lit(split_ts).cast("timestamp"),
                       F.round("value").cast("long")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts") >= F.lit(split_ts).cast("timestamp"),
                       F.round("value").cast("long")).otherwise(0)
            ).alias("y"),
        )
        .withColumn("variant", F.pmod("user_id", F.lit(2)))
    )
    moments = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         .cast("double")
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
         .cast("double")).alias("theta"),
        (F.col("sx").cast("double") / F.col("n").cast("double"))
        .alias("xbar_all"),
    )
    variants = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("vx"),
        F.sum("y").alias("vy"),
    )
    return (
        variants.crossJoin(F.broadcast(moments))
        .select(
            "variant",
            "n_users",
            (F.col("vx").cast("double") / F.col("n_users").cast("double"))
            .alias("xbar"),
            (F.col("vy").cast("double") / F.col("n_users").cast("double"))
            .alias("ybar"),
            "theta",
            (
                F.col("vy").cast("double") / F.col("n_users").cast("double")
                - F.col("theta")
                * (F.col("vx").cast("double")
                   / F.col("n_users").cast("double")
                   - F.col("xbar_all"))
            ).alias("adjusted"),
        )
        .orderBy("variant")
    )
