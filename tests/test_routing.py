"""Routing parity tests (SURVEY §2.1 ops 8, 9, 12, 13)."""

import json

from pyspark.sql import functions as F

from near_event_streams_spark.operators.extract import extract_events
from near_event_streams_spark.operators.routing import (
    apply_blacklist,
    apply_whitelist,
    ordered_for_sink,
    routed_records,
    serialize_event,
)
from near_event_streams_spark.sources.streamer import read_messages_json


def _events(spark, fixture_messages_path):
    ok, _ = extract_events(read_messages_json(spark, fixture_messages_path))
    return ok


def test_whitelist_empty_keeps_all(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    assert apply_whitelist(ev, []).count() == ev.count()


def test_whitelist_filters(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    kept = apply_whitelist(ev, ["nft.contract-a.near"])
    assert {
        r["emit_info"]["contract_account_id"] for r in kept.collect()
    } == {"nft.contract-a.near"}


def test_blacklist_filters(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    kept = apply_blacklist(ev, ["nft.contract-a.near"])
    assert "nft.contract-a.near" not in {
        r["emit_info"]["contract_account_id"] for r in kept.collect()
    }


def test_fanout_two_topics_per_event(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    recs = routed_records(ev, "near_events", "near_events_all")
    n = ev.count()
    assert recs.count() == 2 * n
    topics = {r["topic"] for r in recs.collect()}
    assert "near_events_all" in topics
    assert "near_events.nep171.nft_mint" in topics
    assert "near_events.custom.thing_happened" in topics


def test_key_is_contract_account(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    recs = routed_records(ev, "near_events", "near_events_all")
    keys = {r["key"] for r in recs.collect()}
    assert keys == {
        "nft.contract-a.near",
        "nft.contract-b.near",
        "app.other.near",
    }


def test_serialized_value_round_trips(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    row = ev.filter(
        (F.col("event") == "nft_mint")
        & (F.col("emit_info.block_height") == 100)
    ).select(serialize_event().alias("value")).collect()[0]
    payload = json.loads(row["value"])
    assert payload["standard"] == "nep171"
    assert payload["event"] == "nft_mint"
    assert payload["data"][0]["owner_id"] == "sigilnet.testnet"
    assert payload["data"][0]["token_ids"] == ["1:1", "1:2"]
    assert payload["emit_info"]["block_height"] == 100
    assert payload["emit_info"]["contract_account_id"] == "nft.contract-a.near"
    # field order parity with serde struct order
    assert row["value"].startswith('{"standard":')


def test_generic_data_passthrough_in_value(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    row = (
        ev.filter(F.col("standard") == "custom")
        .select(serialize_event().alias("value"))
        .collect()[0]
    )
    payload = json.loads(row["value"])
    assert payload["data"] == {"foo": 1, "bar": [True, None]}


def test_ordered_for_sink_per_key_order(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    recs = ordered_for_sink(
        routed_records(ev, "near_events", "near_events_all"), partitions=4
    )
    # within each partition, rows for the same key are contiguous & height-ordered
    def check(it):
        last = {}
        seen_done = set()
        prev_key = None
        for row in it:
            k, h = row["key"], row["block_height"]
            if k != prev_key:
                assert k not in seen_done, "key split across runs in partition"
                if prev_key is not None:
                    seen_done.add(prev_key)
                prev_key = k
            assert last.get(k, -1) <= h, "heights out of order within key"
            last[k] = h
        return iter(())

    recs.rdd.mapPartitions(lambda it: check(it)).count()
