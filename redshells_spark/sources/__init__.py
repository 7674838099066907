from redshells_spark.sources.readers import (
    load_existing_file,
    read_criteo_tsv,
    read_ml100k,
    read_netflix_ratings,
)

__all__ = [
    "load_existing_file",
    "read_criteo_tsv",
    "read_ml100k",
    "read_netflix_ratings",
]
