from .analyzer import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    SimpleAnalyzer,
    get_analyzer,
)
from .tokenizer import StandardTokenizer, Token

__all__ = [
    "ENGLISH_STOP_WORDS",
    "StandardAnalyzer",
    "SimpleAnalyzer",
    "StandardTokenizer",
    "Token",
    "get_analyzer",
]
