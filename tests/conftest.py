import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from near_event_streams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nes-tests", shuffle_partitions=8)
    yield s
    s.stop()


def make_block(height, ts, shards):
    """Build a StreamerMessage dict: shards = [(shard_id, [outcome...])],
    outcome = (receipt_id, receiver_id, [logs])."""
    return {
        "block": {"header": {"height": height, "timestamp": ts}},
        "shards": [
            {
                "shard_id": sid,
                "receipt_execution_outcomes": [
                    {
                        "receipt": {
                            "receipt_id": rid,
                            "receiver_id": recv,
                        },
                        "execution_outcome": {"outcome": {"logs": logs}},
                    }
                    for (rid, recv, logs) in outcomes
                ],
            }
            for (sid, outcomes) in shards
        ],
    }


# The reference's canonical unit-test event (src/event_types.rs:127).
CANONICAL_EVENT = (
    'EVENT_JSON:{"standard":"nep171","version":"1.0.0","event":"nft_mint",'
    '"data":[{"owner_id":"sigilnet.testnet","token_ids":["1:1","1:2"]}]}'
)


@pytest.fixture(scope="session")
def fixture_messages_path(tmp_path_factory):
    """JSON-lines StreamerMessage fixture covering every extract path
    (valid / whitespace / non-event / malformed / invalid-regex /
    transfer / generic / flat variants)."""
    blocks = [
        make_block(
            100,
            1_700_000_000_000_000_000,
            [
                (
                    0,
                    [
                        ("r1", "nft.contract-a.near", [CANONICAL_EVENT]),
                        (
                            "r2",
                            "nft.contract-b.near",
                            [
                                "  \tEVENT_JSON:"  # leading whitespace ok
                                '{"standard":"nep171","version":"1.0.0",'
                                '"event":"nft_transfer","data":[{'
                                '"old_owner_id":"a.near","new_owner_id":'
                                '"b.near","token_ids":["7"]}]}',
                                "plain log line, not an event",
                            ],
                        ),
                    ],
                ),
                (
                    1,
                    [
                        (
                            "r3",
                            "app.other.near",
                            [
                                # generic (non-NEP-171) data object
                                'EVENT_JSON:{"standard":"custom","version":'
                                '"2.0.0","event":"thing_happened","data":'
                                '{"foo":1,"bar":[true,null]}}',
                                # malformed JSON -> parse_error
                                'EVENT_JSON:{"standard":"oops", no_json_here',
                                # invalid `event` field -> validation_error
                                'EVENT_JSON:{"standard":"nep171","version":'
                                '"1.0.0","event":"bad event!","data":[]}',
                            ],
                        )
                    ],
                ),
            ],
        ),
        make_block(
            101,
            1_700_000_001_000_000_000,
            [
                (
                    0,
                    [
                        (
                            "r4",
                            "nft.contract-a.near",
                            [
                                # flat (non-array) mint variant
                                'EVENT_JSON:{"standard":"nep171","version":'
                                '"1.0.0","event":"nft_mint","data":'
                                '{"owner_id":"c.near","token_ids":["9"]}}'
                            ],
                        )
                    ],
                )
            ],
        ),
    ]
    path = tmp_path_factory.mktemp("fixtures") / "blocks.jsonl"
    with open(path, "w") as f:
        for b in blocks:
            f.write(json.dumps(b) + "\n")
    return str(path)
