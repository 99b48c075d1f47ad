"""Parity-layer throughput vs the reference's implied requirement.

The reference must sustain NEAR block production (~1 block/s mainnet;
BASELINE.md) and publishes no other number. This test pushes a synthetic
2,000-block / 8,000-event corpus through the FULL extract→validate→
route pipeline (batch form of the streaming plan — identical operators)
and asserts we clear the bar with orders of magnitude to spare on one
node. The measured blocks/sec is printed for BENCH/README reference."""

import json
import time

from near_event_streams_spark.config import NesConfig
from near_event_streams_spark.operators.extract import extract_events
from near_event_streams_spark.operators.routing import routed_records
from near_event_streams_spark.sources.streamer import read_messages_json
from tests.conftest import make_block

N_BLOCKS = 2000


def _write_blocks(tmp_path):
    path = tmp_path / "blocks.jsonl"
    with open(path, "w") as f:
        for h in range(N_BLOCKS):
            log = (
                'EVENT_JSON:{"standard":"nep171","version":"1.0.0",'
                '"event":"nft_mint","data":[{"owner_id":"o%d.near",'
                '"token_ids":["%d"]}]}' % (h, h)
            )
            block = make_block(
                100_000 + h,
                1_700_000_000_000_000_000 + h * 1_000_000_000,
                [
                    (
                        s,
                        [
                            (f"r{h}-{s}-{i}", f"c{i % 50}.near", [log])
                            for i in range(2)
                        ],
                    )
                    for s in range(2)
                ],
            )
            f.write(json.dumps(block) + "\n")
    return str(tmp_path)


def test_parity_pipeline_beats_reference_block_rate(spark, tmp_path):
    src = _write_blocks(tmp_path)
    cfg = NesConfig()
    messages = read_messages_json(spark, src)
    t0 = time.perf_counter()
    events, _rejected = extract_events(messages)
    routed = routed_records(
        events, cfg.topic_prefix, cfg.near_events_all_topic
    )
    n = routed.count()
    dt = time.perf_counter() - t0
    bps = N_BLOCKS / dt
    # 2 shards x 2 outcomes x 1 event x 2 topics per block
    assert n == N_BLOCKS * 8
    print(f"\nparity throughput: {bps:,.0f} blocks/s ({n} records in {dt:.2f}s)")
    # reference bar: ~1 block/s sustained (NEAR mainnet rate, BASELINE.md);
    # require two orders of magnitude headroom on one node
    assert bps > 100, f"only {bps:.0f} blocks/s"
