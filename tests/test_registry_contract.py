"""Driver-contract meta-tests (no Spark session needed): the four plan
modules merge into one registry, so a name collision would SILENTLY
shadow a query; every oracle entry must have a query; and the
ever-red-first ordering decides which queries the (prefix-limited)
driver gate checks."""

import __spark_entry__ as entry
from near_event_streams_spark.plans import (
    analytics,
    analytics_ext,
    curation,
    llm_ops,
    timeseries,
)


def test_no_cross_module_name_collisions():
    # analytics.QUERIES already merges analytics_ext — compare the
    # leaf dicts pairwise instead
    base = {
        k: v
        for k, v in analytics.QUERIES.items()
        if k not in analytics_ext.QUERIES
    }
    mods = {
        "analytics": set(base),
        "analytics_ext": set(analytics_ext.QUERIES),
        "llm_ops": set(llm_ops.QUERIES),
        "curation": set(curation.QUERIES),
        "timeseries": set(timeseries.QUERIES),
    }
    names = sorted(mods)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            clash = mods[a] & mods[b]
            assert not clash, f"{a} and {b} both define {sorted(clash)}"


def test_every_oracle_has_a_query_and_registry_is_wellformed():
    qs, osql = entry.queries(), entry.oracle_sql()
    orphans = sorted(set(osql) - set(qs))
    assert not orphans, f"oracle_sql without queries(): {orphans}"
    assert len(qs) >= 160
    # every registered query is oracle-gated (the last rows-only entry,
    # text_bpe_merges, got its chained-CTE oracle in round 6)
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == [], rows_only


def test_ever_red_queries_order_first():
    """The external driver may gate only a prefix of the registry; a
    query that EVER failed a driver round must re-verify before
    anything else."""
    qs = list(entry.queries())
    _, _, ever_bad = entry._driver_history()
    if not ever_bad:
        return
    k = len(ever_bad)
    assert set(qs[:k]) == ever_bad, (qs[:5], sorted(ever_bad)[:5])


def test_rotation_prefers_stalest_cohort():
    """After the ever-red block, ordering is by last-checked round
    ascending: a 50-row driver prefix must drain the stalest cohort
    before re-checking anything fresher."""
    qs = list(entry.queries())
    _, last_round, ever_bad = entry._driver_history()
    rest = [q for q in qs if q not in ever_bad]
    rounds = [last_round.get(q, 0) for q in rest]
    assert rounds == sorted(rounds), "non-red queries not stalest-first"
