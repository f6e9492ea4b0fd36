from .profile import (  # noqa: F401
    stump, aamp, mass, sliding_stats, profile_summary,
)
from .asof import asof_join  # noqa: F401
