"""Market-basket co-occurrence: frequent item pairs + association rules.

"Users who trigger event A also trigger B", "parts ordered together",
"tokens that co-occur across domains" — the level-2 apriori slice
(Agrawal & Srikant 1994), which in practice answers most basket
questions without the full lattice:

    support(a,b) = n_ab / N       confidence(a→b) = n_ab / n_a
    lift(a,b)    = N · n_ab / (n_a · n_b)

Scale shape, in order:

1. basket-item grain dedup — ONE partial-aggregable distinct.
2. **level-1 apriori prune**: items below ``min_support_count``
   can't be in any frequent pair (anti-monotonicity), so the pair
   stage only ever sees frequent items. This is the lever that keeps
   the self-join candidate space polynomial in the FREQUENT item
   count, not the raw vocabulary.
3. ``max_basket_items`` guard: a basket with m items emits m(m−1)/2
   pairs, so one degenerate basket (a crawler session touching every
   page) is quadratic on its own. Oversized baskets are DROPPED with
   the same documented-group-size-guard policy as the dedup tiers —
   standard basket-analysis practice, and the count of dropped
   baskets is exposed so the caller sees the truncation (no silent
   cap).
4. pair counts via basket-key self-join with ``item_a < item_b``
   (hash exchange on basket id, never a cartesian), then one
   map-side-combinable pair groupBy.

N (basket count) and nothing else is collected — one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support_count: int = 2,
    max_basket_items: int | None = 1000,
) -> DataFrame:
    """Frequent item pairs with support / confidence / lift.

    Output grain: one row per unordered frequent pair (item_a <
    item_b) with ``n_pair, n_a, n_b, support, conf_a_to_b,
    conf_b_to_a, lift``; plus every row carries ``n_baskets`` and
    ``n_dropped_baskets`` so the truncation guard is visible in the
    result, not just a log line.

    A pair is emitted when BOTH items clear ``min_support_count``
    (level-1 prune) and the pair itself co-occurs at least once;
    filter on ``n_pair``/``support`` downstream for level-2 support.
    """
    if min_support_count < 1:
        raise ValueError("min_support_count must be >= 1")
    bi = (
        df.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
        .distinct()
    )
    sizes = bi.groupBy("basket").agg(F.count(F.lit(1)).alias("__m"))
    if max_basket_items is not None:
        keep = sizes.where(F.col("__m") <= max_basket_items)
        n_dropped = sizes.where(F.col("__m") > max_basket_items).count()
        bi = bi.join(keep.select("basket"), "basket")
    else:
        n_dropped = 0
    n_baskets = bi.select("basket").distinct().count()
    if n_baskets == 0:
        raise ValueError("frequent_pairs: no usable baskets")

    item_counts = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    frequent = item_counts.where(F.col("n_item") >= min_support_count)
    fbi = bi.join(frequent, "item").select("basket", "item", "n_item")

    left = fbi.select(
        "basket", F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    right = fbi.select(
        "basket", F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    pairs = (
        left.join(right, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("n_pair"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    N = float(n_baskets)
    # 2x2 contingency chi-square (1 df) for pair independence — the
    # significance column lift alone lacks (a lift of 3 on n_pair=2 is
    # noise; on n_pair=2000 it is structure). a=n_pair, b=n_a-a,
    # c=n_b-a, d=N-n_a-n_b+a; chi2 = N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)).
    # Pure column algebra; 3.84 ~ alpha=0.05, feed operators/
    # experiment.fdr_correct for family-wise control over many pairs.
    a = F.col("n_pair").cast("double")
    b = F.col("n_a") - a
    c = F.col("n_b") - a
    d = F.lit(N) - F.col("n_a") - F.col("n_b") + a
    det = a * d - b * c
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = F.when(denom > 0, F.lit(N) * det * det / denom).otherwise(F.lit(0.0))
    return pairs.select(
        "item_a",
        "item_b",
        "n_pair",
        "n_a",
        "n_b",
        (F.col("n_pair") / F.lit(N)).alias("support"),
        (F.col("n_pair") / F.col("n_a")).alias("conf_a_to_b"),
        (F.col("n_pair") / F.col("n_b")).alias("conf_b_to_a"),
        (F.lit(N) * F.col("n_pair") / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        chi2.alias("chi2"),
        F.lit(n_baskets).alias("n_baskets"),
        F.lit(n_dropped).alias("n_dropped_baskets"),
    )
