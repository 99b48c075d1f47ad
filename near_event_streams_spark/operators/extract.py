"""Event extraction: StreamerMessage rows → validated NearEvent rows.

Re-expresses the reference's per-block extraction loop
(reference: ``src/events.rs:102-145, 272-350``) as one declarative plan of
narrow transformations — it runs identically on a static DataFrame or a
streaming DataFrame, and whole-stage codegen fuses the entire chain into a
single pass per partition (no materialization between steps, matching the
reference's iterator fusion).

Pipeline (each step cites the reference behavior it mirrors):

1. explode ``shards`` → explode ``receipt_execution_outcomes`` → explode
   ``logs``  (3-level unnest, ``src/events.rs:115-118, 272-275, 312``)
2. cheap prefix filter on the *raw* string BEFORE any JSON parse
   (``src/events.rs:313-315`` — predicate ordering is load-bearing: Catalyst
   cannot reorder through an opaque ``from_json``, so we write the filter
   first explicitly)
3. strip the ``EVENT_JSON:`` prefix + trim, ``from_json`` into the typed
   envelope (``src/events.rs:318-320``); the ``data`` payload is parsed
   per-variant into the superset struct (mint / transfer / raw_json —
   ``src/event_types.rs:77-91``)
4. split into OK stream and rejected stream:
   - unparseable envelope → rejected, reason ``parse_error``
     (``src/events.rs:336-344`` warn-and-drop)
   - regex-invalid ``standard``/``event`` → rejected, reason
     ``validation_error`` (``src/events.rs:322-334``,
     pattern ``src/event_types.rs:9-10``)
5. stamp ``emit_info`` provenance (``src/events.rs:304-310, 346-349``)

At 100 TB scale every step here is a narrow map — no shuffle is introduced
until routing repartitions by key (see routing.py). The explodes multiply
rows but never exchange them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from near_event_streams_spark.schemas import (
    EVENT_ENVELOPE_SCHEMA,
    EVENT_FIELD_PATTERN,
    EVENT_JSON_PREFIX,
    NEP171_MINT_SCHEMA,
    NEP171_TRANSFER_SCHEMA,
)
from pyspark.sql.types import ArrayType

_PREFIX_LEN = len(EVENT_JSON_PREFIX)  # 11


def explode_to_logs(messages: DataFrame) -> DataFrame:
    """3-level unnest: blocks → shards → outcomes → log lines.

    Keeps block/shard/receipt provenance columns alongside each log line so
    emit_info can be stamped without re-joining (the reference threads the
    same values through its call stack, ``src/events.rs:104-118, 297-310``).
    """
    return (
        messages.select(
            F.col("block.header.height").alias("block_height"),
            F.col("block.header.timestamp").alias("block_timestamp"),
            F.explode("shards").alias("shard"),
        )
        .select(
            "block_height",
            "block_timestamp",
            F.col("shard.shard_id").alias("shard_id"),
            F.explode("shard.receipt_execution_outcomes").alias("outcome"),
        )
        .select(
            "block_height",
            "block_timestamp",
            "shard_id",
            F.col("outcome.receipt.receipt_id").alias("receipt_id"),
            F.col("outcome.receipt.receiver_id").alias("contract_account_id"),
            F.explode("outcome.execution_outcome.outcome.logs").alias("log"),
        )
    )


def ws_trim(c: Column) -> Column:
    """Whitespace trim matching Rust's ``str::trim``: Spark's ``trim`` only
    strips ASCII spaces, but the reference trims tabs/newlines too
    (``src/events.rs:313``), so use a regexp trim."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def event_json_filter(log: Column) -> Column:
    """``log.trim().starts_with("EVENT_JSON:")`` (src/events.rs:313-315)."""
    return F.startswith(ws_trim(log), F.lit(EVENT_JSON_PREFIX))


def raw_event_json(log: Column) -> Column:
    """Strip the prefix from the trimmed log and trim again
    (``src/events.rs:318-319``: ``log[prefix.len()..].trim()``)."""
    return ws_trim(F.substring(ws_trim(log), _PREFIX_LEN + 1, 2_000_000_000))


def parse_events(logs: DataFrame, log_col: str = "log") -> DataFrame:
    """Prefix-filter, parse, and type event log lines (no validation yet).

    Output adds:
      ``standard, version, event`` — envelope fields (null if parse failed)
      ``data_mint, data_transfer`` — typed arrays when the payload matches
        that NEP-171 shape (``src/event_types.rs:84-91`` untagged union)
      ``data_json`` — the raw payload JSON (always retained; the reference's
        ``Generic(Value)`` escape hatch, ``src/event_types.rs:81``)
      ``event_json`` — the full raw event JSON after prefix strip
    """
    raw = F.col("_raw_event_json")

    # Untagged-union matching (src/event_types.rs:84-91). serde tries the
    # variants in declaration order — Mint(Vec) → Transfer(Vec) → MintFlat →
    # TransferFlat — and a variant only matches when its *required* fields
    # are present (owner_id+token_ids for mint; old/new_owner_id+token_ids
    # for transfer). from_json with a struct schema tolerates missing fields
    # (returns nulls), so we re-impose serde's required-field semantics with
    # explicit null checks, and the when-cascade imposes declaration order.
    mint_arr = F.from_json(F.col("data_json"), ArrayType(NEP171_MINT_SCHEMA))
    tx_arr = F.from_json(F.col("data_json"), ArrayType(NEP171_TRANSFER_SCHEMA))
    mint_flat = F.from_json(F.col("data_json"), NEP171_MINT_SCHEMA)
    tx_flat = F.from_json(F.col("data_json"), NEP171_TRANSFER_SCHEMA)

    def _mint_ok(x: Column) -> Column:
        return x["owner_id"].isNotNull() & x["token_ids"].isNotNull()

    def _tx_ok(x: Column) -> Column:
        return (
            x["old_owner_id"].isNotNull()
            & x["new_owner_id"].isNotNull()
            & x["token_ids"].isNotNull()
        )

    is_mint_arr = (
        mint_arr.isNotNull()
        & (F.size(mint_arr) > 0)
        & F.forall(mint_arr, _mint_ok)
    )
    is_tx_arr = (
        tx_arr.isNotNull() & (F.size(tx_arr) > 0) & F.forall(tx_arr, _tx_ok)
    )
    is_mint_flat = mint_flat.isNotNull() & _mint_ok(mint_flat)
    is_tx_flat = tx_flat.isNotNull() & _tx_ok(tx_flat)

    df = (
        logs.filter(event_json_filter(F.col(log_col)))
        .withColumn("_raw_event_json", raw_event_json(F.col(log_col)))
        .withColumn(
            "_envelope", F.from_json(raw, EVENT_ENVELOPE_SCHEMA)
        )
        # `data` payload, extracted as raw JSON text first …
        .withColumn("data_json", F.get_json_object(raw, "$.data"))
        # … then typed per union variant (superset struct, SURVEY §1.2).
        # Flat variants are normalized to 1-element arrays so downstream
        # sees one shape per variant.
        .withColumn(
            "data_mint",
            F.when(is_mint_arr, mint_arr).when(
                ~is_tx_arr & is_mint_flat, F.array(mint_flat)
            ),
        )
        .withColumn(
            "data_transfer",
            F.when(~is_mint_arr & is_tx_arr, tx_arr).when(
                ~is_mint_arr & ~is_mint_flat & is_tx_flat, F.array(tx_flat)
            ),
        )
        .withColumn("standard", F.col("_envelope.standard"))
        .withColumn("version", F.col("_envelope.version"))
        .withColumn("event", F.col("_envelope.event"))
        .withColumn("event_json", raw)
        .drop("_envelope", "_raw_event_json")
    )
    return df


def field_is_valid(c: Column) -> Column:
    """Regex validation for ``standard``/``event`` (src/event_types.rs:9-10)."""
    return c.rlike(EVENT_FIELD_PATTERN)


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split parsed rows into (valid events, rejected rows with reason).

    Mirrors the reference's two drop-and-warn paths: parse failure
    (``src/events.rs:336-344``) and validation failure
    (``src/events.rs:322-334``). The reference logs and drops; we keep the
    rejects as a side stream so operators/sinks can count or persist them.
    """
    # NearEvent.data is a required serde field (src/event_types.rs:75-81):
    # an envelope with standard/version/event but no `data` member is a
    # parse error in the reference, not a valid event with a null payload.
    parse_failed = (
        F.col("standard").isNull()
        | F.col("version").isNull()
        | F.col("event").isNull()
        | F.col("data_json").isNull()
    )
    invalid = ~(
        field_is_valid(F.col("standard")) & field_is_valid(F.col("event"))
    )
    rejected = parsed.filter(parse_failed | invalid).withColumn(
        "reject_reason",
        F.when(parse_failed, F.lit("parse_error")).otherwise(
            F.lit("validation_error")
        ),
    )
    ok = parsed.filter(~parse_failed & ~invalid)
    return ok, rejected


def with_emit_info(events: DataFrame) -> DataFrame:
    """Stamp provenance (reference: src/events.rs:304-310, 346-349)."""
    return events.withColumn(
        "emit_info",
        F.struct(
            F.col("receipt_id"),
            F.col("block_timestamp"),
            F.col("block_height"),
            F.col("shard_id"),
            F.col("contract_account_id"),
        ),
    )


def extract_events(
    messages: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Full extraction: StreamerMessage frame → (events, rejected).

    The composed plan is: explode×3 → prefix filter → parse → validate-split
    → emit_info. All narrow; one stage under whole-stage codegen.
    """
    logs = explode_to_logs(messages)
    parsed = parse_events(logs)
    ok, rejected = split_valid(parsed)
    return with_emit_info(ok), rejected
