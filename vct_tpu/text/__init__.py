from vct_tpu.text.tokenizer import WordPieceTokenizer, CaptionPreprocessor  # noqa: F401
