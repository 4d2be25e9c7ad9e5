"""River pipeline configuration.

Mirrors the reference's config surface and validation:
- knobs + defaults: HBaseRiver.java:136-166 (ctor reads ``hbase.*`` settings)
- required keys throw: HBaseRiver.java:176-183
- validation floors (interval >= 1 ms, batchSize >= 1): HBaseRiver.java:159-165
- example config: import.sh:4-15
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RiverConfig:
    """Typed river configuration with the reference's defaults.

    Required (HBaseRiver.java:176-183): ``table``, ``index``, ``type_name``.
    ``hosts`` is required by the reference (it names the HBase quorum); here a
    source *path* plays that role and is equally required.
    """

    table: str
    index: str
    type_name: str
    hosts: str = "local"

    # Scan restriction (HBaseRiver.java:76-85,154-156).
    family: str | None = None
    qualifiers: tuple[str, ...] = field(default=())

    # Throughput knobs (HBaseRiver.java:54-62,149-150; import.sh:11,13).
    batch_size: int = 100
    interval_ms: int = 600_000

    # Document shaping (HBaseRiver.java:87-122,151-157).
    id_field: str | None = None
    column_separator: str | None = None
    normalize_fields: bool = True
    charset: str = "UTF-8"

    # Source truncation (HBaseRiver.java:124-127,152).
    delete_old: bool = False

    # Custom sink mapping passthrough (HBaseRiver.java:118-122 reads a
    # user-supplied mapping JSON; :250-261 applies it as the index DDL).
    # Here: a Spark DDL schema string (e.g. "doc_id STRING, doc_json STRING")
    # applied to the assembled documents at sink-write time — parquet is
    # schema-on-write, so the projection IS the DDL.
    custom_mapping: str | None = None

    def __post_init__(self) -> None:
        for key in ("table", "index", "type_name"):
            if not getattr(self, key):
                # HBaseRiver.java:176-183 throws InvalidParameterException
                raise ValueError(f"config key {key!r} is required and must be non-empty")
        if self.interval_ms <= 0:
            # HBaseRiver.java:159-162
            raise ValueError("interval_ms must be > 0")
        if self.batch_size <= 0:
            # HBaseRiver.java:163-165
            raise ValueError("batch_size must be > 0")
        if self.qualifiers and not self.family:
            # setQualifier requires setFamily (HBaseParser.java:94-98 guard)
            raise ValueError("qualifiers filter requires a family filter")
