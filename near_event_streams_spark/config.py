"""Pipeline configuration — parity with the reference's CLI + TOML config.

Field-for-field mirror of ``NesConfig`` / ``RunArgs``
(reference: ``src/configs.rs:148-186``, sample keys ``nes.toml.sample:1-17``),
loaded from ``{home}/nes.toml`` with the ``[kafka]`` table passed through
verbatim to the Kafka client options.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field


@dataclass
class NesConfig:
    # nes.toml.sample:1-9 keys (configs.rs:148-166)
    near_events_all_topic: str = "near_events_all"
    topic_prefix: str = "near_events"
    force_create_new_topic: bool = False
    new_topic_partitions: int = 1
    new_topic_replication: int = 3
    whitelist_contract_ids: list[str] = field(default_factory=list)
    blacklist_contract_ids: list[str] = field(default_factory=list)
    enrich_metadata: bool = False
    stats_enabled: bool = True
    # [kafka] table, verbatim client config (configs.rs:180-186)
    kafka: dict[str, str] = field(default_factory=dict)
    # run-args parity (configs.rs:71-82)
    concurrency: int = 1
    sync_mode: str = "from-interruption"  # | from-latest | from-block:<h>
    checkpoint_location: str | None = None

    @classmethod
    def load(cls, home: str) -> "NesConfig":
        """Read ``{home}/nes.toml`` (configs.rs:167-178)."""
        path = os.path.join(home, "nes.toml")
        with open(path, "rb") as f:
            raw = tomllib.load(f)
        kafka = {k: str(v) for k, v in raw.pop("kafka", {}).items()}
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kwargs = {k: v for k, v in raw.items() if k in known}
        return cls(kafka=kafka, **kwargs)
