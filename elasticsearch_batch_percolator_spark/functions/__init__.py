from .tokenizer import tokenize_code, tokenize_ws, explode_positions  # noqa: F401
