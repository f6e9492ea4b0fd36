from .longseq import (  # noqa: F401
    distributed_matrix_profile, mstumped, mpdisted, stimped,
)
