from .profile import (  # noqa: F401
    stump, aamp, mass, sliding_stats, profile_summary,
)
