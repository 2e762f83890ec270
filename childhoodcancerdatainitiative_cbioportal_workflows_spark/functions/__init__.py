from .genomics import (  # noqa: F401
    strip_chr,
    strip_chr_prefix_only,
    add_chr,
    gistic_call,
    copy_number_to_log2,
    end_position,
    format_field,
    gtf_attribute,
    strip_dot_zero,
    basename,
)
from .text import (  # noqa: F401
    ws_tokens,
    token_count,
    bpe_ish_token_count,
    stopword_ratio,
    lang_id,
    quality_score,
    fingerprint,
    normalize_text,
    char_shingles,
    word_shingles,
)
