from bluegraph_spark.sources.synthetic import synthetic_repo_files
from bluegraph_spark.sources.corpus import ingest_repo_corpus, token_occurrences

__all__ = ["synthetic_repo_files", "ingest_repo_corpus", "token_occurrences"]
