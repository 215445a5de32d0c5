"""Item-item collaborative filtering: sparse cosine neighborhoods +
neighborhood recommendation (Sarwar et al., WWW 2001; the Amazon
"customers who bought X also bought Y" primitive — Linden 2003).

Where ``operators/als.py`` factorizes the interaction matrix, this is
the memory-based complement: item i's similarity to item j is the
cosine over their binary user-incidence vectors,

    sim(i, j) = |U_i ∩ U_j| / sqrt(|U_i| · |U_j|)

computed SPARSELY by inverting the interaction table — a self-join on
the USER (each user's item list is the inverted-index posting), one
(i, j)-grain groupBy counting co-occurrences, then one scan joining
the two item degree tables. Related to ``basket.frequent_pairs``
(support/confidence/lift at basket grain) but normalized for ranking
and finished with the per-item top-k window.

Scale shape
-----------
A user with m items emits m(m−1)/2 pairs — the identical hot-hub
regime as wedge counting (X206), handled the same way:
``max_user_items`` caps how many items a user may WITNESS (the
cheapest deterministic subset — lowest item hash — so retries agree),
while item degrees |U_i| always count the FULL table; heavy users are
the least informative co-occurrence evidence (they co-occur with
everything), so the dropped mass biases least. Degree joins are
item-grain (broadcastable when the catalog is; AQE decides).
``min_cooccur`` prunes the long noise tail before the window.
``item_item_recommend`` then scores a user's unseen items by summing
similarities from their seen items: one join interactions ⋈ topk on
the seen item + one (user, candidate) groupBy + left-anti on owned
items + per-user top-k window — never a user × catalog product.

Oracle: the full uncapped pipeline is plain relational algebra —
DuckDB runs it verbatim (tests/test_itemcf.py → OPCHECK
``item_item_topk`` / ``item_item_recommend``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["item_item_topk", "item_item_recommend"]


def _incidence(
    df: DataFrame, user_col: str, item_col: str
) -> DataFrame:
    return (
        df.where(F.col(user_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .distinct()
    )


def item_item_topk(
    df: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 10,
    max_user_items: int | None = 200,
    min_cooccur: int = 2,
) -> DataFrame:
    """Each item's ``k`` most-cosine-similar items.

    Output: ``item, neighbor, n_co, n_item, n_neighbor, cosine, rank``
    with ``rank`` 1..k by (cosine desc, neighbor asc) — deterministic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_cooccur < 1:
        raise ValueError(f"min_cooccur must be >= 1, got {min_cooccur}")
    ui = _incidence(df, user_col, item_col)
    # item degrees on the FULL incidence — the cap below only limits
    # who may witness a co-occurrence, not what |U_i| means
    deg = ui.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    if max_user_items is not None:
        # hot/cold split (r11, guide §2.5): the cap only ever REMOVES
        # rows from users holding more than max_user_items items, so
        # only those users need the rank window — a per-user count
        # (map-side combinable) finds them, everyone else passes
        # through untouched, and the per-user sort runs over the HOT
        # SLICE only instead of the whole incidence table (hot users
        # are few by the hub-cap premise; AQE broadcasts the probe).
        # Selection rule unchanged: lowest xxhash64, test-pinned.
        hot = (
            ui.groupBy("u")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_user_items)
            .select("u")
        )
        w = Window.partitionBy("u").orderBy(F.xxhash64("i"), F.col("i"))
        hot_wit = (
            ui.join(hot, "u", "left_semi")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_user_items)
            .drop("__rn")
        )
        wit = ui.join(hot, "u", "left_anti").unionByName(hot_wit)
    else:
        wit = ui
    a = wit.select(F.col("u"), F.col("i").alias("ia"))
    b = wit.select(F.col("u"), F.col("i").alias("ib"))
    co = (
        a.join(b, "u")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= min_cooccur)
    )
    # symmetrize so every item ranks its own neighbor list
    sym = co.union(
        co.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "n_co"
        )
    )
    scored = (
        sym.join(deg.select(F.col("i").alias("ia"),
                            F.col("n").alias("n_item")), "ia")
        .join(deg.select(F.col("i").alias("ib"),
                         F.col("n").alias("n_neighbor")), "ib")
        .withColumn(
            "cosine",
            F.col("n_co")
            / F.sqrt(F.col("n_item").cast("double") * F.col("n_neighbor")),
        )
    )
    wr = Window.partitionBy("ia").orderBy(
        F.col("cosine").desc(), F.col("ib").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            "n_co", "n_item", "n_neighbor", "cosine", "rank",
        )
    )


def item_item_recommend(
    df: DataFrame,
    sims: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` unseen items per user by summed neighbor cosine.

    ``sims`` is ``item_item_topk`` output (or any ``item, neighbor,
    cosine`` frame). Output: ``user, item, score, rank``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ui = _incidence(df, user_col, item_col)
    # ONE hash(u) exchange serves all three user-keyed steps (r11,
    # guide §2.4 "two operations keyed the same way share one
    # exchange"): hash(u) satisfies the (u, cand) aggregate's
    # clustering (subset), the owned-items anti join co-partitions on
    # u, and the rank window below needs u — the composed plan
    # re-shuffled the ~|interactions|·k candidate stream twice more
    # (hash(u,cand) for the anti, hash(u) for the window). Trade-off:
    # the exchange carries PRE-aggregate candidate rows; measured on
    # the co-purchase shape the (u, cand) aggregate removes ~1 % of
    # rows (2.99 M → 2.96 M), so map-side partials bought nothing.
    cand = (
        ui.join(
            sims.select(
                F.col("item").alias("i"),
                F.col("neighbor").alias("cand"),
                "cosine",
            ),
            "i",
        )
        .repartition("u")
        .groupBy("u", "cand")
        .agg(F.sum("cosine").alias("score"))
        .join(
            ui.select("u", F.col("i").alias("cand")),
            ["u", "cand"],
            "left_anti",
        )
    )
    w = Window.partitionBy("u").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("u").alias("user"),
            F.col("cand").alias("item"),
            "score",
            "rank",
        )
    )
