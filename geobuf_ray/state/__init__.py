from .checkpoint import (  # noqa: F401
    CODEC_VERSION,
    checkpointed_split_combine,
    completed_keys,
    filter_completed,
    load_manifest,
    write_manifest_row,
)
