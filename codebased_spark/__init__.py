"""codebased_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimagination of the capabilities of Soljourner/CodeBased
(reference at /root/reference: per-document entity/relationship extraction →
two-pass symbol resolution → typed node/edge tables → Cypher analytics),
retargeted from source files to Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` and re-expressed Spark-first:

- ``synth``      deterministic synthetic ``pages`` generator (tests/bench input)
- ``extract``    vectorized Arrow-UDF html→text, gazetteer mention detection,
                 pattern-based open triple extraction
- ``link``       alias table build, candidate scoring (TF-IDF char n-grams),
                 connected-components canonicalization
- ``graph``      nodes/edges materialization, manifest/resume, query library
- ``functions``  training-data-pipeline ops: dedup (exact/minhash/simhash),
                 similarity search, text analysis, multimodal plumbing

Design blueprint: SURVEY.md. Nothing here is a port of the reference's Python
implementation; citations in docstrings are behavioral (what to compute), the
how is DataFrame/Catalyst.
"""

__version__ = "0.1.0"
