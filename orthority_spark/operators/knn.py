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


#: literal-catalog ceiling for the map-side rank plan: past this the
#: unrolled O(n^2) comparison expressions bloat codegen, so the window
#: plan takes over (a catalog this big should use knn_kring anyway).
MAX_LITERAL_CATALOG = 256


def _topk_literal(
    pages: DataFrame, cat: list, k: int, masked: bool = False
) -> DataFrame:
    """Top-k per page with the catalog UNROLLED into codegen'd column
    expressions (r6 plan): per-candidate dist_sq columns, rank computed
    as 1 + count of strictly-smaller (dist_sq, filename) candidates —
    the exact row_number ordering incl. NULLS FIRST and NaN-largest —
    then one Generate + filter emits the <= k rows. Zero shuffles, zero
    interpreted lambdas (transform/array_sort are per-element
    interpreted; at 8M pages the lambda plan measured 2.6x slower).

    ``masked``: pages additionally carry int columns ``_m0.._m{n-1}``
    (1 = candidate j applies to this page); rank counts only masked
    candidates and only masked rows are emitted (the k-ring cell path).
    """
    from ..oracle import dlit

    proj = pages.select(
        "*",
        *[
            F.expr(
                f"((px - {dlit(r.cx)}) * (px - {dlit(r.cx)})"
                f" + (py - {dlit(r.cy)}) * (py - {dlit(r.cy)}))"
            ).alias(f"_d{i}")
            for i, r in enumerate(cat)
        ],
    )
    structs = []
    for i, ri in enumerate(cat):
        terms = []
        for j, rj in enumerate(cat):
            if i == j:
                continue
            lt = (
                f"(_d{j} < _d{i}) OR (_d{j} IS NULL AND _d{i} IS NOT NULL) "
                f"OR ((_d{j} <=> _d{i}) AND '{rj.filename}' < '{ri.filename}')"
            )
            if masked:
                lt = f"(_m{j} = 1) AND ({lt})"
            terms.append(f"CAST(({lt}) AS INT)")
        rank = f"(1 + {' + '.join(terms)})" if terms else "1"
        structs.append(
            f"struct({rank} AS rank, '{ri.filename}' AS filename, "
            f"{dlit(ri.cx)} AS cx, {dlit(ri.cy)} AS cy, _d{i} AS dist_sq"
            + (f", _m{i} AS m" if masked else ", 1 AS m")
            + ")"
        )
    out = (
        proj.select(
            "url", "px", "py",
            F.explode(F.expr(f"array({', '.join(structs)})")).alias("_s"),
        )
        .where((F.col("_s.rank") <= k) & (F.col("_s.m") == 1))
        .select(
            "url", "px", "py",
            F.col("_s.filename").alias("filename"),
            F.col("_s.cx").alias("cx"),
            F.col("_s.cy").alias("cy"),
            F.col("_s.dist_sq").alias("dist_sq"),
            F.col("_s.rank").alias("rank"),
        )
    )
    return out


def knn_bruteforce(pages_cells: DataFrame, summary: DataFrame, k: int = 3) -> DataFrame:
    """Catalog-unrolled map-side top-k (r6 plan): the tiny center catalog
    is collected once and inlined as codegen'd expressions; ranking
    happens inside the scan stage. The r5 plan exchanged + sorted every
    (page x footprint) candidate row on url for the window; this one has
    zero shuffles and the identical output. Catalogs past
    MAX_LITERAL_CATALOG entries fall back to the window plan."""
    cat = summary.select("filename", "cx", "cy").take(MAX_LITERAL_CATALOG + 1)
    if len(cat) <= MAX_LITERAL_CATALOG:
        return _topk_literal(pages_cells.select("url", "px", "py"), cat, k)
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
    cat = summary.select("filename", "cx", "cy").take(MAX_LITERAL_CATALOG + 1)
    if est_rows <= max_broadcast_rows and len(cat) <= MAX_LITERAL_CATALOG:
        # r6 plan: pivot the expanded index to per-cell MEMBERSHIP MASKS
        # over the literal catalog (tiny-side groupBy, broadcast), join
        # pages on their own cell (broadcast hash join) and rank map-side
        # with the codegen'd unrolled comparisons — zero pages-side
        # shuffles. The candidate set per page is identical to the r5
        # join+window plan (mask j = 1 iff candidate j's ring covers the
        # page's cell).
        names = {r.filename: i for i, r in enumerate(cat)}
        masks = (
            expanded.where(F.col("filename").isin(list(names)))
            .groupBy("cell")
            .agg(
                *[
                    F.max(
                        F.when(F.col("filename") == n, 1).otherwise(0)
                    ).alias(f"_m{i}")
                    for n, i in names.items()
                ]
            )
        )
        cand = pages_cells.select("url", "px", "py", "cell").join(
            F.broadcast(masks), "cell"
        )
        return _topk_literal(cand.drop("cell"), cat, k, masked=True)
    if est_rows <= max_broadcast_rows:
        # catalog too wide for the literal unroll but the expanded index
        # still broadcasts: the r5 broadcast join + window plan
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
