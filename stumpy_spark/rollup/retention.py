"""Retention: per-tier expiry of old partitions.

Each materialized tier keeps a bounded time horizon (raw shortest, 1d
longest).  Expiry is **partition drop, not row delete**: tiers are written
partitioned by (source, day(bucket)), so expiring a day is an O(1) metadata
operation (directory/partition removal) — the Iceberg
``expire_snapshots``/``drop_partition`` pattern, realized on plain parquet
here since this sandbox has no Iceberg runtime.  Nothing rewrites data
files.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default horizons (seconds) per tier — raw ages out fastest
DEFAULT_HORIZONS = {
    "raw": 2 * 86400,
    "1m": 7 * 86400,
    "1h": 90 * 86400,
    "1d": 3650 * 86400,
}


@dataclass
class TierStore:
    """A materialized tier on disk, partitioned by (day, source)."""
    root: str
    tier: str

    @property
    def path(self) -> str:
        return str(Path(self.root) / self.tier)

    def write(self, df: DataFrame) -> None:
        (df.withColumn("day", F.to_date("bucket"))
         .repartition("day", "source")
         .write.mode("overwrite")
         .partitionBy("day", "source")
         .parquet(self.path))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path).drop("day")

    def partitions(self) -> list[str]:
        return sorted(p.name for p in Path(self.path).glob("day=*"))

    def expire(self, now: datetime, horizon_seconds: int) -> list[str]:
        """Drop day-partitions entirely older than the horizon."""
        cutoff = (now - timedelta(seconds=horizon_seconds)).date()
        dropped = []
        for p in Path(self.path).glob("day=*"):
            day = datetime.strptime(p.name.split("=", 1)[1],
                                    "%Y-%m-%d").date()
            if day < cutoff:
                shutil.rmtree(p)
                dropped.append(p.name)
        return sorted(dropped)


def apply_retention(stores: dict[str, TierStore], now: datetime,
                    horizons: dict[str, int] | None = None
                    ) -> dict[str, list[str]]:
    horizons = horizons or DEFAULT_HORIZONS
    return {tier: store.expire(now, horizons.get(tier, 10 ** 12))
            for tier, store in stores.items()}
