from .textstats import token_stats, language_guess, content_fingerprint
from .dedup import exact_dedup_groups, word_shingles, jaccard_pairs, minhash_lsh_pairs, simhash64
from .similarity import cosine_topk_bruteforce, hyperplane_lsh_topk
from .multimodal import to_media_column, decode_media_stats

__all__ = [
    "token_stats",
    "language_guess",
    "content_fingerprint",
    "exact_dedup_groups",
    "word_shingles",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash64",
    "cosine_topk_bruteforce",
    "hyperplane_lsh_topk",
    "to_media_column",
    "decode_media_stats",
]
