from hirest_tpu.tokenizers.bpe import ClipBPETokenizer, clip_tokenize  # noqa: F401
from hirest_tpu.tokenizers.wordpiece import WordPieceTokenizer  # noqa: F401
