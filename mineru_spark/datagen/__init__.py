from .transcripts import (  # noqa: F401
    gen_transcripts_pdf,
    gen_turn,
    conv_length,
    n_convs_for_sf,
    TRANSCRIPT_COLUMNS,
)
