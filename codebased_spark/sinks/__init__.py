from codebased_spark.sinks.export import (  # noqa: F401
    edges_to_bulk_csv,
    nodes_to_bulk_csv,
    triples_to_ntriples,
    write_bulk_import,
    write_ntriples,
)
