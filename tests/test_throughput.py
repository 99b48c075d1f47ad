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


def test_streaming_mode_drains_sf01_within_budget(spark, tmp_path):
    """STREAMING-mode parity throughput (the batch test above cannot
    see trigger scheduling, checkpoint writes, or foreachBatch sink
    costs): re-encode the full sf0.1 events table as StreamerMessage
    blocks, drain it through ``start_to_parquet`` under
    ``trigger(availableNow)``, and assert (a) every event arrives —
    exact routed row count, 2 topics per event — and (b) the drain
    clears the reference's ~1 block/s bar by >=2 orders of magnitude
    within a hard wall budget."""
    from near_event_streams_spark.sources.streamer import (
        events_to_streamer_messages,
        stream_messages_json,
    )
    from near_event_streams_spark.streaming.job import start_to_parquet

    sf_dir = "/root/testdata/sf0.1"
    corpus = str(tmp_path / "corpus")
    n_blocks = events_to_streamer_messages(
        spark, sf_dir, corpus, events_per_block=50, n_files=40
    )
    assert n_blocks == 2000
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    msgs = stream_messages_json(spark, corpus)
    t0 = time.perf_counter()
    q = start_to_parquet(msgs, NesConfig(), out, ckpt, available_now=True)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # every event routed to the all-topic AND its per-type topic
    assert spark.read.parquet(out).count() == 2 * n_events
    bps = n_blocks / wall
    print(f"\nstreaming drain: {bps:,.0f} blocks/s ({wall:.2f}s)")
    assert bps > 100, f"only {bps:.0f} blocks/s ({wall:.1f}s for {n_blocks})"
