from codebased_spark.extract.html_text import extract_text_series, with_text, with_links  # noqa: F401
from codebased_spark.extract.mentions import scan_mentions_series, with_mentions  # noqa: F401
from codebased_spark.extract.automaton import AhoCorasick, build_trie_regex  # noqa: F401
from codebased_spark.extract.metadata import nesting_depth_col, page_meta_rows, with_page_meta  # noqa: F401
from codebased_spark.extract.patterns import extract_pattern_mentions  # noqa: F401
from codebased_spark.extract.registry import dispatch, register  # noqa: F401
from codebased_spark.extract.urlops import with_url_parts  # noqa: F401
from codebased_spark.extract.anchors import anchor_text_summary, domain_graph, exploded_anchors, with_anchors  # noqa: F401
from codebased_spark.extract.tables import html_table_cells, tables_col  # noqa: F401
from codebased_spark.extract.jsonld import jsonld_entities  # noqa: F401
from codebased_spark.extract.charset import charset_cascade  # noqa: F401
from codebased_spark.extract.tech import tech_census, tech_signals  # noqa: F401
