"""Physical-plan regression tests: the scale properties the engine is
designed around must survive refactors — broadcast joins on the footprint
side, column pruning into the scan, partial aggregation before exchanges,
and zero shuffle of the pages side in the flagship join."""

from __future__ import annotations

import re

import pytest

from orthority_spark.queries_geo import (
    pages_cells,
    q_pip_join,
    q_tile_checksums,
)
from orthority_spark.queries_rel import q_revenue_by_nation

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_is_broadcast_only(spark):
    plan = _plan(q_pip_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the ONLY exchanges allowed are broadcast exchanges — the pages side
    # must never shuffle in the flagship join
    shuffle_exchanges = re.findall(r"Exchange (?!SinglePartition)hash", plan)
    assert not shuffle_exchanges, plan


def test_scan_prunes_to_key_column(spark):
    """Derived pages read ONLY o_orderkey from the orders scan."""
    plan = _plan(pages_cells(spark, SF))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(s == "o_orderkey:bigint" for s in schemas), schemas


def test_checksum_agg_has_mapside_partial(spark):
    plan = _plan(q_tile_checksums(spark, SF))
    # plan prints top-down: final agg, then the exchange, then the
    # partial agg computed before (below) it
    assert "partial_count" in plan and "partial_sum" in plan
    assert plan.index("Exchange hashpartitioning") < plan.index("partial_")


def test_dims_broadcast_in_revenue_join(spark):
    plan = _plan(q_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # fact-side scan pruned to the join/agg columns only
    fact = re.search(r"ReadSchema: struct<(o_[^>]*)>", plan)
    assert fact and set(fact.group(1).split(",")) == {
        "o_custkey:bigint", "o_totalprice:double"
    }


def test_salted_join_partitions_by_cell_and_salt(spark):
    from orthority_spark.operators import tile_join
    from orthority_spark.sources import footprints as fp

    recs = fp.footprint_records()
    plan = _plan(
        tile_join.pip_join_salted(
            pages_cells(spark, SF),
            fp.footprint_cells_df(spark, recs),
            fp.footprint_edges_df(spark, recs),
        )
    )
    # the salted path deliberately shuffles on (cell, salt)
    assert re.search(r"hashpartitioning\(cell#\d+L?, salt#\d+L?", plan), plan


def test_tf_idf_aggs_are_partial_and_join_not_cartesian(spark):
    """tf/df are partial-aggregated (map-side combine before exchange);
    the df join is a key equi-join, never a cartesian."""
    from orthority_spark.queries_text import q_tf_idf

    plan = _plan(q_tf_idf(spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan, plan
    # one broadcast nested loop is expected ONLY for the 1-row n_docs
    # scalar; anything more means the token join degenerated
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_stratified_sample_filter_precedes_exchange(spark):
    """The hash keep-rate filter runs scan-side: the only exchange in the
    plan is the final per-lang aggregation's."""
    from orthority_spark.queries_text import q_stratified_sample

    plan = _plan(q_stratified_sample(spark, SF))
    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exch == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_ray_march_rays_shuffle_is_metadata_only(spark):
    """The ray-march plan shuffles only the 128-row ray-parameter table
    (metadata), never anything data-sized, and runs one mapInPandas."""
    from orthority_spark.queries_extra import q_ray_dem_footprints

    plan = _plan(q_ray_dem_footprints(spark, SF))
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
