"""NEP-171 flatten + enrichment tests (SURVEY §2.1 ops 10, 11)."""

from pyspark.sql import functions as F

from near_event_streams_spark.operators.enrich import (
    enrich_from_dim,
    enrich_via_rpc,
    regroup_enriched,
)
from near_event_streams_spark.operators.extract import extract_events
from near_event_streams_spark.operators.flatten import (
    flatten_nep171,
    flatten_token_ids,
)
from near_event_streams_spark.schemas import TOKEN_SCHEMA
from near_event_streams_spark.sources.streamer import read_messages_json


def _events(spark, fixture_messages_path):
    ok, _ = extract_events(read_messages_json(spark, fixture_messages_path))
    return ok


def test_flatten_counts(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    flat = flatten_nep171(ev)
    # canonical mint (1 item) + transfer (1 item) + flat mint (1 item);
    # generic event contributes nothing (event_types.rs:63)
    assert flat.count() == 3
    kinds = sorted(r["kind"] for r in flat.collect())
    assert kinds == ["mint", "mint", "transfer"]


def test_flatten_token_grain_and_id(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    grain = flatten_token_ids(flatten_nep171(ev))
    ids = sorted(r["_id"] for r in grain.collect())
    # "{contract}:{token_id}" (token.rs:24-27)
    assert ids == [
        "nft.contract-a.near:1:1",
        "nft.contract-a.near:1:2",
        "nft.contract-a.near:9",
        "nft.contract-b.near:7",
    ]


def _tokens_dim(spark):
    rows = [
        {
            "_id": "nft.contract-a.near:1:1",
            "token_id": "1:1",
            "owner_id": "sigilnet.testnet",
            "metadata": {"title": "Token 1:1", "copies": 5},
            "metadata_extra": '{"rarity":"epic"}',
            "approved_account_ids": {"mkt.near": 1},
            "contract_account_id": "nft.contract-a.near",
        },
        {
            "_id": "nft.contract-b.near:7",
            "token_id": "7",
            "owner_id": "b.near",
            "metadata": None,  # RPC miss parity (token.rs:98)
            "metadata_extra": None,
            "approved_account_ids": None,
            "contract_account_id": "nft.contract-b.near",
        },
    ]
    return spark.createDataFrame(rows, schema=TOKEN_SCHEMA)


def test_enrich_from_dim(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    grain = flatten_token_ids(flatten_nep171(ev))
    enriched = enrich_from_dim(grain, _tokens_dim(spark))
    by_id = {r["_id"]: r for r in enriched.collect()}
    assert by_id["nft.contract-a.near:1:1"]["token_metadata"]["title"] == "Token 1:1"
    assert (
        by_id["nft.contract-a.near:1:1"]["token_metadata_extra"]
        == '{"rarity":"epic"}'
    )
    # unknown token -> null metadata (lookup miss)
    assert by_id["nft.contract-a.near:1:2"]["token_metadata"] is None
    assert by_id["nft.contract-b.near:7"]["token_metadata"] is None


def test_regroup_aligns_arrays(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    grain = flatten_token_ids(flatten_nep171(ev))
    enriched = regroup_enriched(enrich_from_dim(grain, _tokens_dim(spark)))
    mint = enriched.filter(
        F.col("item.owner_id") == "sigilnet.testnet"
    ).collect()[0]
    # arrays aligned to token_ids order (FuturesOrdered parity, token.rs:130-141)
    assert list(mint["item"]["token_ids"]) == ["1:1", "1:2"]
    assert mint["_ids"] == [
        "nft.contract-a.near:1:1",
        "nft.contract-a.near:1:2",
    ]
    assert mint["metadatas"][0]["title"] == "Token 1:1"
    assert mint["metadatas"][1] is None
    assert mint["metadata_extras"] == ['{"rarity":"epic"}', None]


def test_enrich_via_rpc_stub(spark, fixture_messages_path):
    ev = _events(spark, fixture_messages_path)
    grain = flatten_token_ids(flatten_nep171(ev))

    def fetch(contract, token):
        if token == "9":
            return {
                "metadata": {"title": "Nine", "copies": 1},
                "metadata_extra": '{"n":9}',
            }
        if token == "7":
            raise RuntimeError("rpc down")  # error -> None (token.rs:104-112)
        return None

    out = {r["_id"]: r for r in enrich_via_rpc(grain, fetch).collect()}
    assert out["nft.contract-a.near:9"]["token_metadata"]["title"] == "Nine"
    assert out["nft.contract-b.near:7"]["token_metadata"] is None
    assert out["nft.contract-a.near:1:1"]["token_metadata"] is None
