from codebased_spark.extract.html_text import extract_text_series, with_text, with_links  # noqa: F401
from codebased_spark.extract.mentions import scan_mentions_series, with_mentions  # noqa: F401
