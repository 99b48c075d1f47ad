"""NEP-171 flatten: one multi-item event → N single-item flat events.

The reference's ``try_flatten_nep171_event`` (``src/event_types.rs:41-64``,
called from ``src/events.rs:218``) turns one event carrying
``Vec<Nep171MintData>`` / ``Vec<Nep171TransferData>`` into one event per
element, tagged ``MintFlat`` / ``TransferFlat``; non-NEP-171 events flatten
to nothing.

Spark-first: an ``explode`` of whichever typed array matched, rebuilding the
envelope per element. Narrow op, no shuffle; at 100 TB this multiplies rows
in place on each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_nep171(events: DataFrame) -> DataFrame:
    """Explode mint/transfer arrays to flat single-item events.

    Output: the envelope + emit_info columns, plus
      ``kind`` — "mint" | "transfer"
      ``item`` — the single Nep171 data struct for this flat event (with
        ``token_ids`` still an array — the reference keeps the field name
        and shape, just one *event* per element of the outer Vec)

    Non-NEP-171 events (neither typed variant matched) produce no rows
    (``event_types.rs:63`` returns an empty Vec).
    """
    mint = (
        events.filter(F.col("data_mint").isNotNull())
        .select(
            "standard",
            "version",
            "event",
            "emit_info",
            F.lit("mint").alias("kind"),
            F.explode("data_mint").alias("mint_item"),
        )
        .select(
            "standard",
            "version",
            "event",
            "emit_info",
            "kind",
            F.struct(
                F.lit(None).cast("string").alias("authorized_id"),
                F.col("mint_item.owner_id").alias("owner_id"),
                F.lit(None).cast("string").alias("old_owner_id"),
                F.lit(None).cast("string").alias("new_owner_id"),
                F.col("mint_item.token_ids").alias("token_ids"),
                F.col("mint_item.memo").alias("memo"),
            ).alias("item"),
        )
    )
    transfer = (
        events.filter(
            F.col("data_mint").isNull() & F.col("data_transfer").isNotNull()
        )
        .select(
            "standard",
            "version",
            "event",
            "emit_info",
            F.lit("transfer").alias("kind"),
            F.explode("data_transfer").alias("tx_item"),
        )
        .select(
            "standard",
            "version",
            "event",
            "emit_info",
            "kind",
            F.struct(
                F.col("tx_item.authorized_id").alias("authorized_id"),
                F.lit(None).cast("string").alias("owner_id"),
                F.col("tx_item.old_owner_id").alias("old_owner_id"),
                F.col("tx_item.new_owner_id").alias("new_owner_id"),
                F.col("tx_item.token_ids").alias("token_ids"),
                F.col("tx_item.memo").alias("memo"),
            ).alias("item"),
        )
    )
    return mint.unionByName(transfer)


def flatten_token_ids(flat_events: DataFrame) -> DataFrame:
    """One row per (flat event, token_id) — the grain at which the reference
    issues its per-token enrichment lookups (``src/token.rs:125-141``)."""
    return flat_events.select(
        "*", F.explode("item.token_ids").alias("token_id")
    ).withColumn(
        "_id",
        # "{contract_account_id}:{token_id}" (src/token.rs:24-27)
        F.format_string(
            "%s:%s",
            F.col("emit_info.contract_account_id"),
            F.col("token_id"),
        ),
    )
