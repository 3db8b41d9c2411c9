"""Text-analysis operators for training-data pipelines.

- langid:      corpus-trained n-gram/token language identification
- quality:     per-document quality metrics (length/punct/stopword ratios)
- fingerprint: winnowing document fingerprints (rolling k-gram hashes)
- decontaminate: corpus x benchmark fingerprint-overlap contamination report
- repetition:  Gopher-style n-gram repetition metrics
- filters:     composed keep/drop decision table (all rules, one row/doc)
- chunk:       fixed-window token chunking with overlap
"""

from codebased_spark.textops.langid import lang_id  # noqa: F401
from codebased_spark.textops.quality import doc_quality  # noqa: F401
from codebased_spark.textops.fingerprint import winnow_fingerprints  # noqa: F401
from codebased_spark.textops.tfidf import tfidf_top_terms  # noqa: F401
from codebased_spark.textops.decontaminate import decontaminate  # noqa: F401
from codebased_spark.textops.repetition import repetition_metrics  # noqa: F401
from codebased_spark.textops.filters import filter_decisions  # noqa: F401
from codebased_spark.textops.chunk import chunk_documents  # noqa: F401
from codebased_spark.textops.qa import qa_pairs  # noqa: F401
