"""Text-analysis operators for training-data pipelines.

- langid:      corpus-trained n-gram/token language identification
- quality:     per-document quality metrics (length/punct/stopword ratios)
- fingerprint: winnowing document fingerprints (rolling k-gram hashes)
- decontaminate: corpus x benchmark fingerprint-overlap contamination report
"""

from codebased_spark.textops.langid import lang_id  # noqa: F401
from codebased_spark.textops.quality import doc_quality  # noqa: F401
from codebased_spark.textops.fingerprint import winnow_fingerprints  # noqa: F401
from codebased_spark.textops.tfidf import tfidf_top_terms  # noqa: F401
from codebased_spark.textops.decontaminate import decontaminate  # noqa: F401
