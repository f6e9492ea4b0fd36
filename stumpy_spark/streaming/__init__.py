from .stumpi import (  # noqa: F401
    StumpiState, GrowingStumpiState, stumpi_stream,
)
from .floss import (  # noqa: F401
    AampiState, GrowingAampiState, FlossState,
)
