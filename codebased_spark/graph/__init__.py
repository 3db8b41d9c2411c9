from codebased_spark.graph.pipeline import extract_triples, build_graph  # noqa: F401
