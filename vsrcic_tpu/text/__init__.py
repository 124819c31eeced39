from vsrcic_tpu.text.vocab import TextField, Vocab, PUNCTUATIONS, dedup_join  # noqa: F401
from vsrcic_tpu.text.tokenizer import ptb_tokenize  # noqa: F401
