"""Token-metadata enrichment: the reference's RPC lookup join, Spark-first.

The reference enriches flat mint/transfer events by calling the NFT
contract's ``nft_token(token_id)`` view function once per token, in order,
projecting out ``metadata`` and JSON-parsed ``metadata.extra``; any RPC or
parse failure yields ``None`` for that token
(reference: ``src/token.rs:67-155``, wiring ``src/events.rs:235-264``).

Pure Spark has no RPC in the hot path, so enrichment is expressed two ways:

1. ``enrich_from_dim`` — a **left join against a `tokens` dimension table**
   keyed on ``_id = "{contract}:{token_id}"``. This is the correctness-gated
   path: at 100 TB the token dim is small relative to the event stream →
   broadcast join, zero shuffle on the big side. In streaming it is a
   stream-static join (supported natively by Structured Streaming).
2. ``enrich_via_rpc`` — a ``mapInPandas`` adapter that batches lookups
   through a user-supplied ``fetch(contract_id, token_id) -> dict | None``
   callable with an LRU cache, for deployments that must hit a live RPC.
   Arrow-batched (not per-row), failures → null columns, matching the
   reference's error handling (``src/token.rs:98,104-112``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from functools import lru_cache
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from near_event_streams_spark.schemas import TOKEN_METADATA_SCHEMA


def enrich_from_dim(
    token_grain: DataFrame, tokens: DataFrame, broadcast_dim: bool = True
) -> DataFrame:
    """Left join flat-event token rows against the tokens dimension.

    ``token_grain`` is the output of ``flatten.flatten_token_ids`` (one row
    per event × token_id, with ``_id``). Missing tokens keep null metadata —
    the reference's lookup-miss behavior (``src/token.rs:98``).
    """
    dim = tokens.select(
        F.col("_id"),
        F.col("metadata").alias("token_metadata"),
        F.col("metadata_extra").alias("token_metadata_extra"),
    )
    if broadcast_dim:
        dim = F.broadcast(dim)
    return token_grain.join(dim, on="_id", how="left")


def regroup_enriched(enriched_grain: DataFrame) -> DataFrame:
    """Re-assemble per-token rows back into one flat event per original
    (event, item) with aligned ``token_ids`` / ``metadatas`` /
    ``metadata_extras`` / ``_ids`` arrays — the reference's enriched-event
    shape (``src/event_types.rs:93-104``: parallel arrays, order preserved).

    Ordering: the reference issues lookups with ``FuturesOrdered`` so result
    arrays align with ``token_ids`` order (``src/token.rs:130-141``); we
    restore the same alignment by sorting each group's collected structs by
    the original token position.
    """
    with_pos = enriched_grain.withColumn(
        "_pos", F.array_position(F.col("item.token_ids"), F.col("token_id"))
    )
    return (
        with_pos.groupBy(
            "standard", "version", "event", "emit_info", "kind", "item"
        )
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_pos"),
                        F.col("_id"),
                        F.col("token_metadata"),
                        F.col("token_metadata_extra"),
                    )
                )
            ).alias("_aligned")
        )
        .select(
            "standard",
            "version",
            "event",
            "emit_info",
            "kind",
            "item",
            F.col("_aligned._id").alias("_ids"),
            F.col("_aligned.token_metadata").alias("metadatas"),
            F.col("_aligned.token_metadata_extra").alias("metadata_extras"),
        )
    )


def enrich_via_rpc(
    token_grain: DataFrame,
    fetch: Callable[[str, str], dict[str, Any] | None],
    cache_size: int = 65536,
    batch_log: Callable[[int], None] | None = None,
) -> DataFrame:
    """Arrow-batched RPC enrichment via ``mapInPandas``.

    ``fetch`` runs on executors; exceptions/misses → null metadata (parity
    with ``src/token.rs:104-112`` error-to-None). An ``lru_cache`` per
    executor process amortizes hot contracts. This is the slow path — the
    dim-table join is preferred wherever a token table can be maintained.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    out_schema = StructType(
        list(token_grain.schema.fields)
        + [
            StructField("token_metadata", TOKEN_METADATA_SCHEMA),
            StructField("token_metadata_extra", StringType()),
        ]
    )

    meta_fields = [f.name for f in TOKEN_METADATA_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cached = lru_cache(maxsize=cache_size)(
            lambda contract, token: fetch(contract, token)
        )

        def _lookup(contract: str, token: str):
            try:
                return cached(contract, token)
            except Exception:  # noqa: BLE001 — RPC error ⇒ None (token.rs:104-112)
                return None

        for pdf in batches:
            if batch_log is not None:
                batch_log(len(pdf))
            metas, extras = [], []
            for contract, token in zip(
                pdf["emit_info"].map(
                    lambda e: (e or {}).get("contract_account_id")
                ),
                pdf["token_id"],
            ):
                tok = _lookup(contract, token) if contract else None
                if tok is None:
                    metas.append(None)
                    extras.append(None)
                else:
                    md = tok.get("metadata")
                    metas.append(
                        {k: md.get(k) for k in meta_fields} if md else None
                    )
                    extras.append(tok.get("metadata_extra"))
            pdf = pdf.assign(
                token_metadata=metas, token_metadata_extra=extras
            )
            yield pdf

    return token_grain.mapInPandas(_run, schema=out_schema)
