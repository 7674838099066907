from redshells_spark.text.tokenize import tokenize_on_space
from redshells_spark.text.dictionary import train_dictionary
from redshells_spark.text.tfidf import tfidf_scores, tfidf_top_tokens

__all__ = [
    "tokenize_on_space",
    "train_dictionary",
    "tfidf_scores",
    "tfidf_top_tokens",
]
