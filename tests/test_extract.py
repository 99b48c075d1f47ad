"""Extraction-path parity tests (SURVEY §2.1 ops 3-7, §5 strategy)."""

from pyspark.sql import functions as F

from near_event_streams_spark.operators.extract import (
    extract_events,
    parse_events,
    split_valid,
)
from near_event_streams_spark.sources.streamer import read_messages_json


def _extract(spark, fixture_messages_path):
    msgs = read_messages_json(spark, fixture_messages_path)
    return extract_events(msgs)


def test_valid_events_extracted(spark, fixture_messages_path):
    ok, rejected = _extract(spark, fixture_messages_path)
    rows = {
        (r["standard"], r["event"], r["emit_info"]["contract_account_id"])
        for r in ok.collect()
    }
    assert rows == {
        ("nep171", "nft_mint", "nft.contract-a.near"),
        ("nep171", "nft_transfer", "nft.contract-b.near"),
        ("custom", "thing_happened", "app.other.near"),
    }
    # two nft_mint events (array variant + flat variant)
    assert ok.filter(F.col("event") == "nft_mint").count() == 2


def test_canonical_fixture_mint_typed(spark, fixture_messages_path):
    """Port of the reference's only unit test (event_types.rs:121-132)."""
    ok, _ = _extract(spark, fixture_messages_path)
    mint = ok.filter(
        (F.col("event") == "nft_mint")
        & (F.col("emit_info.block_height") == 100)
    ).collect()
    assert len(mint) == 1
    data = mint[0]["data_mint"]
    assert len(data) == 1
    assert data[0]["owner_id"] == "sigilnet.testnet"
    assert list(data[0]["token_ids"]) == ["1:1", "1:2"]
    assert mint[0]["data_transfer"] is None


def test_transfer_typed_and_whitespace_tolerated(spark, fixture_messages_path):
    ok, _ = _extract(spark, fixture_messages_path)
    tx = ok.filter(F.col("event") == "nft_transfer").collect()
    assert len(tx) == 1
    assert tx[0]["data_mint"] is None
    item = tx[0]["data_transfer"][0]
    assert item["old_owner_id"] == "a.near"
    assert item["new_owner_id"] == "b.near"


def test_generic_data_kept_as_raw_json(spark, fixture_messages_path):
    ok, _ = _extract(spark, fixture_messages_path)
    gen = ok.filter(F.col("standard") == "custom").collect()[0]
    assert gen["data_mint"] is None
    assert gen["data_transfer"] is None
    assert '"foo":1' in gen["data_json"]


def test_flat_mint_normalized_to_array(spark, fixture_messages_path):
    ok, _ = _extract(spark, fixture_messages_path)
    flat = ok.filter(F.col("emit_info.block_height") == 101).collect()[0]
    assert [m["owner_id"] for m in flat["data_mint"]] == ["c.near"]


def test_drop_paths(spark, fixture_messages_path):
    """parse_error (events.rs:336-344) + validation_error (events.rs:322-334)."""
    _, rejected = _extract(spark, fixture_messages_path)
    reasons = sorted(r["reject_reason"] for r in rejected.collect())
    assert reasons == ["parse_error", "validation_error"]


def test_envelope_without_data_is_parse_error(spark):
    """NearEvent.data is required serde-side (event_types.rs:75-81): an
    envelope with standard/version/event but no `data` member must land in
    the parse_error reject stream, not pass as a null-payload event."""
    logs = spark.createDataFrame(
        [
            (
                'EVENT_JSON:{"standard":"nep171","version":"1.0.0",'
                '"event":"nft_mint"}',
            ),
            (
                'EVENT_JSON:{"standard":"nep171","version":"1.0.0",'
                '"event":"nft_mint","data":[{"owner_id":"a.near",'
                '"token_ids":["1"]}]}',
            ),
        ],
        "log string",
    )
    ok, rejected = split_valid(parse_events(logs))
    assert ok.count() == 1
    rej = rejected.collect()
    assert len(rej) == 1
    assert rej[0]["reject_reason"] == "parse_error"
    assert rej[0]["data_json"] is None


def test_non_event_logs_never_parsed(spark, fixture_messages_path):
    ok, rejected = _extract(spark, fixture_messages_path)
    # the plain log line appears in neither stream (prefix filter drops it)
    assert ok.count() + rejected.count() == 6


def test_emit_info_provenance(spark, fixture_messages_path):
    ok, _ = _extract(spark, fixture_messages_path)
    e = ok.filter(F.col("event") == "nft_transfer").collect()[0]["emit_info"]
    assert e["receipt_id"] == "r2"
    assert e["block_height"] == 100
    assert e["block_timestamp"] == 1_700_000_000_000_000_000
    assert e["shard_id"] == 0
    assert e["contract_account_id"] == "nft.contract-b.near"
