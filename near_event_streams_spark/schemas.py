"""Explicit StructType schemas for the parity layer.

The reference declares its data model as compile-time Rust structs
(reference: ``src/event_types.rs:13-23,67-119``, ``src/token.rs:12-20,51-65``);
we mirror that with explicit StructTypes — schema inference is never used on
a production path (SURVEY §1.3).

Untagged unions (``EventData``, ``Nep171Data`` — ``src/event_types.rs:77-91``)
have no Spark equivalent; we model them as a *superset struct*: typed NEP-171
``mint`` / ``transfer`` arrays plus a raw-JSON fallback string. A ``from_json``
parse that matches neither typed shape leaves the typed columns null and the
raw string retained — mirroring the reference's ``Generic(Value)`` variant.

All ``u64`` fields (block heights, nanosecond timestamps, shard ids) map to
``LongType``: NEAR heights and ns-timestamps fit in i64 until ~year 2262;
the signedness caveat is accepted and documented here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# Input: StreamerMessage envelope — only the fields the reference reads
# (reference: src/events.rs:110-118, 272-275, 308-312).
# --------------------------------------------------------------------------

RECEIPT_SCHEMA = StructType(
    [
        StructField("receipt_id", StringType()),
        StructField("receiver_id", StringType()),
    ]
)

EXECUTION_OUTCOME_SCHEMA = StructType(
    [
        StructField(
            "outcome",
            StructType([StructField("logs", ArrayType(StringType()))]),
        )
    ]
)

OUTCOME_WITH_RECEIPT_SCHEMA = StructType(
    [
        StructField("receipt", RECEIPT_SCHEMA),
        StructField("execution_outcome", EXECUTION_OUTCOME_SCHEMA),
    ]
)

SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField(
            "receipt_execution_outcomes", ArrayType(OUTCOME_WITH_RECEIPT_SCHEMA)
        ),
    ]
)

STREAMER_MESSAGE_SCHEMA = StructType(
    [
        StructField(
            "block",
            StructType(
                [
                    StructField(
                        "header",
                        StructType(
                            [
                                StructField("height", LongType()),
                                StructField("timestamp", LongType()),  # ns epoch
                            ]
                        ),
                    )
                ]
            ),
        ),
        StructField("shards", ArrayType(SHARD_SCHEMA)),
    ]
)

# --------------------------------------------------------------------------
# Output: NearEvent (reference: src/event_types.rs:13-23).
# ``data`` is the superset-struct encoding of the untagged union.
# --------------------------------------------------------------------------

NEP171_MINT_SCHEMA = StructType(
    [
        StructField("owner_id", StringType()),
        StructField("token_ids", ArrayType(StringType())),
        StructField("memo", StringType()),
    ]
)

NEP171_TRANSFER_SCHEMA = StructType(
    [
        StructField("authorized_id", StringType()),
        StructField("old_owner_id", StringType()),
        StructField("new_owner_id", StringType()),
        StructField("token_ids", ArrayType(StringType())),
        StructField("memo", StringType()),
    ]
)

# Typed parse target for the event JSON. ``data`` is intentionally parsed
# twice from the raw log line: once as a mint-shaped array, once as a
# transfer-shaped array; whichever matches is kept (see operators/extract.py).
EVENT_ENVELOPE_SCHEMA = StructType(
    [
        StructField("standard", StringType()),
        StructField("version", StringType()),
        StructField("event", StringType()),
    ]
)

EMIT_INFO_SCHEMA = StructType(
    [
        StructField("receipt_id", StringType()),
        StructField("block_timestamp", LongType()),  # nanoseconds
        StructField("block_height", LongType()),
        StructField("shard_id", LongType()),
        StructField("contract_account_id", StringType()),
    ]
)

# --------------------------------------------------------------------------
# Enrichment dimension: Token / TokenMetadata
# (reference: src/token.rs:12-20, 51-65).
# --------------------------------------------------------------------------

TOKEN_METADATA_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("media", StringType()),
        StructField("media_hash", StringType()),
        StructField("copies", LongType()),
        StructField("issued_at", StringType()),
        StructField("expires_at", StringType()),
        StructField("starts_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("extra", StringType()),
        StructField("reference", StringType()),
        StructField("reference_hash", StringType()),
        StructField("collection_id", StringType()),
    ]
)

TOKEN_SCHEMA = StructType(
    [
        StructField("_id", StringType()),  # "{contract_account_id}:{token_id}"
        StructField("token_id", StringType()),
        StructField("owner_id", StringType()),
        StructField("metadata", TOKEN_METADATA_SCHEMA),
        StructField("metadata_extra", StringType()),  # JSON text
        StructField("approved_account_ids", MapType(StringType(), LongType())),
        StructField("contract_account_id", StringType()),
    ]
)

# Validation regex for `standard` and `event`
# (reference: src/event_types.rs:9-10).
EVENT_FIELD_PATTERN = "^[a-zA-Z0-9._-]+$"

# The `EVENT_JSON:` log prefix (reference: src/events.rs:303).
EVENT_JSON_PREFIX = "EVENT_JSON:"
