"""Physical-plan regression gates: the scale-critical plan shapes PLANS.md
documents are asserted here so they cannot silently regress.

A wrong plan at sf0.001 is the same wrong plan at 100 TB — these checks
pin the logical shape Catalyst must keep: pushdown reaching the scan,
narrow ReadSchema, explicit broadcasts, no cartesian products in the
near-dup pair joins, and a shuffle-free per-turn extraction map."""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_map_is_shuffle_free(spark):
    """scan → project → mapInPandas, nothing else: no Exchange anywhere in
    the per-turn extraction plan (the north-rule hot path)."""
    from mineru_spark.pipeline import synthesize_transcripts, extract

    plan = _plan(extract(synthesize_transcripts(spark, 4)))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_docwrap_scan_prunes_columns(spark):
    """The documents scan under the wrap-extract map reads ONLY
    (doc_id, text) — lang/source/n_chars are pruned."""
    from mineru_spark.sources.docwrap import extract_wrapped_documents

    plan = _plan(extract_wrapped_documents(spark, SF))
    assert "Exchange" not in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "doc_id" in rs[0] and "text" in rs[0]
    assert "lang" not in rs[0] and "n_chars" not in rs[0]


def test_pricing_summary_pushdown(spark):
    """q01's shipdate predicate reaches the parquet scan."""
    from mineru_spark.queries import q01_pricing_summary

    plan = _plan(q01_pricing_summary(spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_nation_revenue_broadcasts_dims(spark):
    """q05 joins customer/nation/region via BroadcastHashJoin."""
    from mineru_spark.queries import q05_nation_revenue

    plan = _plan(q05_nation_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3


@pytest.mark.parametrize("qname", ["q_jaccard_pairs", "q_simhash_near_pairs",
                                   "q_embed_near_pairs"])
def test_near_dup_pair_joins_are_not_cartesian(spark, qname):
    """Every near-dup pair query joins on equi-keys — a cartesian or
    broadcast-nested-loop here is the O(N²) regression the round-1 review
    flagged."""
    import mineru_spark.queries as q

    plan = _plan(getattr(q, qname)(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_finalize_shuffles_narrow_projection_only(spark):
    """finalize_convs' candidate-detection window moves only
    (conv_id, turn_idx, route) — payload columns never enter that
    exchange."""
    from mineru_spark.pipeline import (extract, finalize_convs,
                                      synthesize_transcripts)

    plan = _plan(finalize_convs(extract(synthesize_transcripts(spark, 4))))
    # the plan has (a) the gated applyInPandas exchange that moves full
    # rows for CANDIDATE conversations only, and (b) the candidate-
    # detection window exchange, which must carry only the narrow
    # (conv_id, turn_idx) projection — never the payload columns
    segs = plan.split("Exchange hashpartitioning(conv_id")
    assert len(segs) >= 3  # grouped stage + narrow window stage
    narrow = [s for s in segs[1:]
              if "md#" not in s.split("MapInPandas")[0]]
    assert narrow, "no payload-free conv_id exchange found"
    assert "Project [conv_id#" in narrow[0]
