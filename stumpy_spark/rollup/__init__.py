from .tiers import (  # noqa: F401
    per_sequence_stats, rollup_tier, cascade, TIER_SECONDS,
)
from .gapfill import gapfill  # noqa: F401
