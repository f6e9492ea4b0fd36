from .stumpi import StumpiState, stumpi_stream  # noqa: F401
