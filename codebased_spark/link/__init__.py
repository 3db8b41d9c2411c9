from codebased_spark.link.alias import build_alias_table, link_fuzzy_mentions  # noqa: F401
from codebased_spark.link.cc import connected_components  # noqa: F401
