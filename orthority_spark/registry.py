"""Central query registry: merges all driver-gate query modules.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame,
oracle_builder() -> SQL str | None). ``None`` oracle => driver records a
rows-only check (genuinely non-SQL-expressible ops).

The driver records at most ``DRIVER_CAP`` queries in registration order,
so the exposed surface is an explicit ``PRIORITY`` list: every operator
family's representative gate sits inside the cap. Redundant twins (an
alternate join strategy, an all-pairs verifier whose bucketed scale path
is already gated, a cogroup comparator kept for documentation) live in
``DEMOTED``: they stay under the same oracle parity in
tests/test_oracle_parity.py but are not driver-recorded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

DRIVER_CAP = 50

#: Driver-recorded gates, in record order. Keep len <= DRIVER_CAP.
PRIORITY = [
    # -- geometry / camera core (SURVEY §2.2, §2.3, §2.4) --
    "geotag_extract",
    "cell_assign",
    "tile_checksums",
    "pip_join",
    "pip_join_salted",
    "rpc_pip_join",
    "knn",
    "knn_kring",
    "rollup_pyramid",
    "world_to_pixel_jvm",
    "footprint_bounds",
    "dem_tile_assign",
    "dem_z_sample",
    "remap_pixels",
    "remap_pixels_cubic",
    "undistort_pixels",
    "ray_dem_footprints",
    "fit_exterior",
    "pan_sharpen_stats",
    "pan_sharpen_rows",
    # -- text / dedup pipeline --
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidates",
    "jaccard_neardups_lsh",
    "corpus_clean",
    "simhash",
    "text_stats",
    "quality_score",
    "token_count_bpe",
    "lang_profile",
    "doc_fingerprint",
    # -- embeddings / ANN --
    "ann_topk",
    "ann_ivf",
    "embedding_neardups_bucketed",
    # -- multimodal (image_features oracle-gated since r4; audio twin
    #    demoted — same mapInPandas decode family) --
    "image_features",
    # -- LLM-training-data pipeline (r3 additions, recorded since r4:
    #    relevance ranking, corpus mixing, decontamination, gap-fill) --
    "tf_idf",
    "stratified_sample",
    "contamination_check",
    "events_gapfill",
    # r5 rotation (VERDICT r4 #6): the r4-new training-data families get
    # driver-recorded gates; the two built-in-dominated relational gates
    # they displace (pricing_summary, value_percentiles) keep full DuckDB
    # parity as DEMOTED twins
    "repetition_ratio",
    "host_stats",
    # -- relational / windows / set ops --
    "revenue_by_nation",
    "window_topk_events",
    "asof_join_window",
    "covar_partials",
    "sessionize",
    "anti_join_unmatched",
    "rollup_pricing",
    "stream_dedup",
    "except_pages",
]

#: Pytest-parity-only twins (same oracle check, not driver-recorded):
#: each has a driver-recorded representative of the same operator family.
DEMOTED = [
    "pip_join_arrow",        # strategy twin of pip_join / pip_join_salted
    "world_to_pixel",        # Arrow twin of world_to_pixel_jvm
    "jaccard_neardups",      # all-pairs verifier; LSH scale path is gated
    "embedding_neardups",    # all-pairs verifier; bucketed path is gated
    "asof_join",             # cogroup comparator; window twin is gated
    "tile_counts",           # subset of tile_checksums
    "ann_lsh_buckets",       # bucket assignment; ann_ivf gates the family
    "label_centroid_norms",  # array-agg family covered by ann_topk/covar
    "semi_join_active",      # semi-join also exercised in jaccard LSH path
    "remap_checksums",       # RNG twin; remap_pixels gates per-pixel
    # INTERSECT twin: the set-ops family keeps except_pages recorded;
    # its slot went to stream_dedup (the only streaming-path gate)
    "overlap_pages",
    # r4 swap-outs (VERDICT r3 #4): slots freed for the four new
    # training-data families above; every one keeps full DuckDB parity
    # in tests/test_oracle_parity.py and a recorded family representative
    "audio_features",        # mapInPandas decode twin of image_features
    "json_extract_props",    # scalar built-in; §2.7 gated by text_stats et al
    "distinct_customers",    # distinct built-in; dedup_exact gates the family
    "events_by_hour",        # date-time built-in; events_gapfill/sessionize gate
    # r5-new: O(N)-output corpus dedup (keep-canonical over the bucketed
    # pair detection) — the shape downstream training stages consume;
    # full DuckDB parity, family gated by embedding_neardups_bucketed
    "embedding_dedup_keep",
    # r5-new: transitive dup-cluster canonicalization (connected
    # components over the bucketed pair graph, operators/cc.py) — the
    # closure the pair-based keep-rule can't express; full DuckDB parity
    # (recursive-CTE closure), family gated by embedding_neardups_bucketed
    "embedding_dup_clusters",
    # r5-new: the TEXT-corpus twin of embedding_dup_clusters (connected
    # components over the jaccard-verified LSH pair graph); full DuckDB
    # parity, family gated by jaccard_neardups_lsh + corpus_clean
    "text_dup_clusters",
    # r5 swap-outs (VERDICT r4 #6): built-in-dominated relational gates —
    # their slots went to the r4-new repetition_ratio / host_stats
    # training-data families; both keep full DuckDB parity here
    "pricing_summary",       # TPC-H Q1 agg; rollup_pricing gates the family
    "value_percentiles",     # percentile built-in; covar/window gates remain
]


def _merged() -> dict:
    from . import queries_geo

    merged: dict = {}
    merged.update(queries_geo.QUERIES)
    for mod_name in (
        "queries_text", "queries_vec", "queries_rel", "queries_extra",
        "queries_extra2",
    ):
        try:
            mod = __import__(f"orthority_spark.{mod_name}", fromlist=["QUERIES"])
            merged.update(mod.QUERIES)
        except ImportError:
            pass
    return merged


def all_queries(include_demoted: bool = False) -> dict:
    merged = _merged()
    unplaced = set(merged) - set(PRIORITY) - set(DEMOTED)
    if unplaced:
        raise ValueError(
            f"queries not placed in registry PRIORITY/DEMOTED: {sorted(unplaced)}"
        )
    missing = [n for n in PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY names with no implementation: {missing}")
    if len(PRIORITY) > DRIVER_CAP:
        raise ValueError(f"PRIORITY exceeds driver cap: {len(PRIORITY)}")
    names = PRIORITY + [n for n in DEMOTED if n in merged] if include_demoted else PRIORITY
    return {n: merged[n] for n in names}


def _wrap(fn: Callable) -> Callable:
    """Ship the package zip to executors before running (the --py-files
    mechanism; UDF closures import orthority_spark on workers)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .pyfiles import ensure_on_executors

        ensure_on_executors(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, (_, oracle) in all_queries().items():
        if oracle is not None:
            out[name] = oracle()
    return out
