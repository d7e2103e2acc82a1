"""kNN: k nearest footprints per page (SURVEY §2.3 kNN / §2.5 W4).

Two strategies:

- :func:`knn_bruteforce` — broadcast the (tiny) footprint-center catalog,
  score every (page, footprint) pair map-side, take top-k per page with a
  window. Right whenever the footprint catalog broadcasts; the cross
  product never materialises a shuffle of the pages side — only the
  window's partition-by-url exchange.
- :func:`knn_kring` — the scale path for large catalogs: candidates come
  from an equi-join of the page's cell k-ring against the footprint-cell
  index, so each page only scores footprints in its neighborhood; falls
  back to ring expansion radius ``k_ring`` (must be chosen >= catalog
  spacing so that >= k true neighbors are inside the ring — verified
  against brute force in tests).

Determinism: rank orders by (dist_sq, filename) so equal distances break
ties stably across engines and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .. import grid


def _dist_sq(cx: str = "cx", cy: str = "cy") -> Column:
    return (F.col("px") - F.col(cx)) * (F.col("px") - F.col(cx)) + (
        F.col("py") - F.col(cy)
    ) * (F.col("py") - F.col(cy))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("url").orderBy(F.col("dist_sq"), F.col("filename"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def knn_bruteforce(pages_cells: DataFrame, summary: DataFrame, k: int = 3) -> DataFrame:
    """Broadcast cross-score + window top-k."""
    cand = pages_cells.select("url", "px", "py").join(
        F.broadcast(summary.select("filename", "cx", "cy"))
    )
    return _topk(cand.withColumn("dist_sq", _dist_sq()), k)


def knn_kring(
    pages_cells: DataFrame,
    footprint_cells: DataFrame,
    summary: DataFrame,
    k: int = 3,
    ring: int = 8,
    max_broadcast_rows: int = 4_000_000,
    n_index_cells: int | None = None,
) -> DataFrame:
    """Cell k-ring candidate join + window top-k (the 10^12-page plan).

    Ring expansion happens on the *footprint* side (tiny): each footprint
    covering-cell is replicated to its k-ring, so the pages side joins on
    its own cell with zero blow-up and no shuffle when the expanded index
    still broadcasts.

    Size guard: the expansion is (2*ring+1)^2 rows per covering cell;
    when the estimate exceeds ``max_broadcast_rows`` (~100 MB of packed
    longs at the default), broadcasting it would stress the driver, so
    the explicit broadcast hint is withheld and Spark plans the cell
    equi-join itself (shuffle-hash/SMJ for a genuinely large index).
    Pass ``n_index_cells`` (e.g. from catalog stats) to avoid the
    guard's one count() job over ``footprint_cells``.
    """
    # decode (res, ix, iy), wrap ix around the antimeridian (mod 2^res) and
    # drop out-of-range iy — mirrors grid.k_ring exactly, so neighborhoods
    # crossing the +-180 lon seam or the lat poles stay correct
    expanded = (
        footprint_cells.select("filename", "cell")
        .withColumn("res", F.expr("shiftright(cell, 52)"))
        .withColumn(
            "ix", F.expr(f"shiftright(cell, 26) & {grid.IX_FACTOR - 1}")
        )
        .withColumn("iy", F.expr(f"cell & {grid.IX_FACTOR - 1}"))
        .withColumn(
            "n", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(res AS INT))")
        )
        .withColumn(
            "d", F.expr(f"explode(sequence(CAST(-{ring} AS BIGINT), {ring}))")
        )
        .withColumn(
            "d2", F.expr(f"explode(sequence(CAST(-{ring} AS BIGINT), {ring}))")
        )
        .where(
            (F.col("iy") + F.col("d2") >= 0) & (F.col("iy") + F.col("d2") < F.col("n"))
        )
        .select(
            "filename",
            (
                F.col("res") * F.lit(grid.RES_FACTOR).cast("long")
                + F.pmod(F.col("ix") + F.col("d"), F.col("n"))
                * F.lit(grid.IX_FACTOR).cast("long")
                + F.col("iy")
                + F.col("d2")
            ).alias("cell"),
        )
        .distinct()
    )
    # no distinct needed: the expanded index is distinct on
    # (filename, cell) and each page carries exactly one cell, so a
    # (url, filename) pair can appear at most once — a distinct here
    # would shuffle the full candidate set for nothing
    if n_index_cells is None:
        n_index_cells = footprint_cells.count()
    est_rows = n_index_cells * (2 * ring + 1) ** 2
    if est_rows <= max_broadcast_rows:
        expanded = F.broadcast(expanded)
    else:
        import warnings

        warnings.warn(
            f"knn_kring: expanded cell index ~{est_rows} rows exceeds the "
            f"broadcast guard ({max_broadcast_rows}); withholding the "
            "broadcast hint and letting Spark plan the cell equi-join "
            "(raise max_broadcast_rows or lower ring to force the "
            "broadcast plan)",
            stacklevel=2,
        )
    cand = (
        pages_cells.select("url", "px", "py", "cell")
        .join(expanded, "cell")
        .join(F.broadcast(summary.select("filename", "cx", "cy")), "filename")
        .select("url", "px", "py", "filename", "cx", "cy")
    )
    return _topk(cand.withColumn("dist_sq", _dist_sq()), k)
