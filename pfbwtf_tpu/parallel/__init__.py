from .merge import (
    reconstruct_text,
    merge_parse_prefixes,
    load_or_generate_text,
)

__all__ = [
    "reconstruct_text",
    "merge_parse_prefixes",
    "load_or_generate_text",
]
