from .codec import decode_block, encode_postings  # noqa: F401
from .build import build_index, read_manifest  # noqa: F401
