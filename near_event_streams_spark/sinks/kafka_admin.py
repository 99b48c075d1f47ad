"""Kafka topic DDL — parity with the reference's ``ensure_topic``
(``src/events.rs:23-74``): when ``force_create_new_topic`` is set, fetch
cluster metadata and create missing topics with the configured partition /
replication counts; a metadata-fetch failure warns and continues.

Runs driver-side before a streaming query starts (the reference calls it
per send; doing it once up front is strictly cheaper and race-equivalent
under ``allow.auto.create.topics``). Requires a Kafka client library
(confluent-kafka or kafka-python) — gated import, since the analytics
container ships neither.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

from near_event_streams_spark.config import NesConfig

log = logging.getLogger("nes.kafka")


def ensure_topics(config: NesConfig, topics: Iterable[str]) -> bool:
    """Create any missing topics; returns True if admin ran, False if no
    Kafka client library is available (warn-and-continue, matching
    ``src/events.rs:29-31`` behavior when metadata is unavailable)."""
    if not config.force_create_new_topic:
        return False
    bootstrap = config.kafka.get("bootstrap.servers", "localhost:9092")
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # noqa: PLC0415
    except ImportError:
        try:
            from kafka.admin import (  # noqa: PLC0415
                KafkaAdminClient,
                NewTopic as KNewTopic,
            )
        except ImportError:
            log.warning(
                "no Kafka admin client available; relying on broker "
                "auto.create.topics.enable"
            )
            return False
        admin = KafkaAdminClient(bootstrap_servers=bootstrap)
        existing = set(admin.list_topics())
        missing = [t for t in topics if t not in existing]
        if missing:
            admin.create_topics(
                [
                    KNewTopic(
                        t,
                        num_partitions=config.new_topic_partitions,
                        replication_factor=config.new_topic_replication,
                    )
                    for t in missing
                ]
            )
        return True
    admin = AdminClient({"bootstrap.servers": bootstrap})
    try:
        existing = set(admin.list_topics(timeout=10).topics)
    except Exception as exc:  # noqa: BLE001 — warn & continue (events.rs:29-31)
        log.warning("could not fetch cluster metadata: %s", exc)
        return False
    missing = [t for t in topics if t not in existing]
    if missing:
        futures = admin.create_topics(
            [
                NewTopic(
                    t,
                    num_partitions=config.new_topic_partitions,
                    replication_factor=config.new_topic_replication,
                )
                for t in missing
            ]
        )
        for t, fut in futures.items():
            try:
                fut.result(timeout=30)
            except Exception as exc:  # noqa: BLE001
                log.warning("create_topics(%s) failed: %s", t, exc)
    return True
